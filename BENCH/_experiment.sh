#!/bin/bash
# One-off instrumented scaling probe (not part of the driver contract):
# materialize the 400-replica corpus once, then single pinned builds at
# local[2] and local[8], printing per-stage seconds for comparison.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
CORPUS=$(mktemp -d /tmp/exp_corpus_XXXX)
python - "$CORPUS" <<'EOF'
import sys
from bench import bench_corpus
from text_indexer_spark.session import get_spark
spark = get_spark("exp-corpus", master="local[32]")
bench_corpus(spark, "/root/testdata/sf0.1", 400).write.mode("overwrite").parquet(sys.argv[1])
spark.stop()
EOF
export SPARK_GRAFT_BENCH_CORPUS=$CORPUS
for n in 2 8; do
  taskset -c 0-$((n-1)) python bench.py --build-once "local[$n]" "$SPARK_GRAFT_SF_DIR" 400 | tail -1
done
rm -rf "$CORPUS" /tmp/bench_idx_* 2>/dev/null || true
