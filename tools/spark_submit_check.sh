#!/usr/bin/env bash
# Deployment-surface check: package the library and run the parse→route
# job via spark-submit --py-files, exactly as on a cluster.
set -euo pipefail
cd "$(dirname "$0")/.."

IN="${1:-/tmp/beats_spark_submit_in}"
OUT="${2:-/tmp/beats_spark_submit_out}"
rm -rf "$OUT"

if [ ! -e "$IN/_SUCCESS" ]; then
  python - <<EOF
from beats_spark.session import build_session
from beats_spark.synth import write_synth
spark = build_session("submit-synth", cores=8)
write_synth(spark, "$IN", 50_000)
spark.stop()
EOF
fi

rm -f /tmp/beats_spark.zip
zip -qr /tmp/beats_spark.zip beats_spark

spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.ui.enabled=false \
  --py-files /tmp/beats_spark.zip \
  jobs/parse_route_job.py --input "$IN" --output "$OUT" 2>/dev/null \
  | grep PARSE_ROUTE_RESULT

spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.ui.enabled=false \
  --py-files /tmp/beats_spark.zip \
  jobs/curate_job.py \
  --input /root/testdata/sf0.001/documents.parquet \
  --output "${OUT}_curated" 2>/dev/null \
  | grep CURATE_RESULT

# module-ingest surface (optional: needs the reference checkout's
# apache fixture; skipped silently when absent)
APACHE_DIR=/root/reference/filebeat/module/apache/access
if [ -e "$APACHE_DIR/test/test.log" ]; then
  spark-submit \
    --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.sql.shuffle.partitions=16 \
    --conf spark.ui.enabled=false \
    --py-files /tmp/beats_spark.zip \
    jobs/module_ingest_job.py \
    --pipeline "$APACHE_DIR/ingest/default.json" \
    --input "$APACHE_DIR/test/test.log" \
    --output "${OUT}_module" 2>/dev/null \
    | grep MODULE_INGEST_RESULT
fi

spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.ui.enabled=false \
  --py-files /tmp/beats_spark.zip \
  jobs/layout_job.py \
  --input /root/testdata/sf0.001/documents.parquet \
  --output "${OUT}_layout" --files 8 --compact-target-mb 1 \
  --audit-col n_chars --audit-lo 0 --audit-hi 64 2>/dev/null \
  | grep LAYOUT_RESULT
