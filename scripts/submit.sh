#!/usr/bin/env bash
# Package the engine and launch the KG pipeline via spark-submit
# (north_rule: spark-submit --py-files on a multi-executor cluster).
#
#   scripts/submit.sh --input s3://bucket/documents --warehouse s3://bucket/kg
#
# Pass cluster options through MMORE_SUBMIT_OPTS, e.g.
#   MMORE_SUBMIT_OPTS="--master yarn --num-executors 256" scripts/submit.sh ...
# (not SPARK_SUBMIT_OPTS: spark-submit treats that env var as raw JVM flags)
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/mmore_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in pathlib.Path('mmore_spark').rglob('*.py'):
        z.write(p, p)
print('packaged', '$ZIP')
"

exec spark-submit ${MMORE_SUBMIT_OPTS:-} \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --py-files "$ZIP" \
  scripts/run_pipeline.py "$@"
