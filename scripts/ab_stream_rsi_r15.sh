#!/bin/bash
# Round-15 alternating A/B: r13 tree vs HEAD tree, 4 interleaved pairs,
# fresh process per run so neither tree inherits the other's JIT state.
set -u
OUT=/root/repo/plans/r15/ab_stream_rsi_raw.jsonl
: > "$OUT"
for i in 1 2 3 4; do
  for t in "A /tmp/r13tree" "B /root/repo"; do
    set -- $t
    echo "== pair $i tree $1 =="
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python /root/repo/scripts/ab_stream_rsi_runner.py "$2" "$1$i" 2>/dev/null | grep "^@@RESULT" | sed 's/^@@RESULT //' >> "$OUT"
  done
done
echo DONE
