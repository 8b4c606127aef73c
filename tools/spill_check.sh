#!/bin/sh
# Spill-path proof (VERDICT r4 task 4): run the FULL oracle suite under a
# constrained heap with spill thresholds forced low, then verify every
# query still hash-matches DuckDB and that the external sort/agg/join
# paths actually spilled (the 128 GiB sandbox never exercises them
# otherwise — at 100 TB they are the normal case, so "green while
# spilling" is a correctness claim that needs a measurement).
#
#   -Xmx1g (SPARK_DRIVER_MEM) shrinks the unified memory pool ~30x vs
#   the graded runs; shuffle.partitions=4 concentrates each shuffle into
#   few, large partitions; numElementsForceSpillThreshold bounds every
#   in-memory sorter/aggregator buffer at 20k rows so UnsafeExternalSorter
#   and friends must hit their spill+merge code paths deterministically.
#
# Usage: sh tools/spill_check.sh [sfDir]   (default /root/testdata/sf0.01)
# Output: verify_local PASS lines + "[verify] spill: ..." totals.
set -e
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/graft_spill.XXXXXX)
cd "$(dirname "$0")/.."
SPARK_DRIVER_MEM=1g SPARK_GRAFT_CPUS=8 \
SPARK_GRAFT_EXTRA_CONFS="spark.sql.shuffle.partitions=4;spark.shuffle.spill.numElementsForceSpillThreshold=20000;spark.sql.windowExec.buffer.spill.threshold=20000;spark.sql.sortMergeJoinExec.buffer.spill.threshold=20000" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT" 2>&1 \
  | grep -E '\[verify\]' || true
python3 tools/verify_local.py "$SF_DIR" "$OUT" | tail -3
rm -rf "$OUT"
