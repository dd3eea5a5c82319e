"""Plan auditing: machine-readable views of `explain("formatted")` so
plan-shape requirements (pushdown, pruning, join strategy, shuffle
count) are TESTED invariants, not review-time hopes.

The reference has no planner at all (SURVEY.md section 4.1); this
engine's planner is Catalyst, and these helpers are how the repo holds
Catalyst's output to the shapes the 100 TB design assumes.
"""

from docker_based_real_time_etl_project_spark.plans.audit import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    join_strategies,
    scan_infos,
)
