"""Composable operators: row-level transforms (SURVEY.md 2.2), native
aggregations (2.3), dedup / similarity / text analysis (north-star)."""
