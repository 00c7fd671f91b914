#!/bin/bash
# spark-submit --py-files scaling evidence (north rule): same job, same input,
# local[2] vs local[8] (N vs 4N cores). Appends a results table to
# BENCH/BASELINE.md.
set -e
cd "$(dirname "$0")/.."
rm -f /tmp/mgs.zip
zip -qr /tmp/mgs.zip mass_georeferencing_spark
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
AMP=${SPARK_GRAFT_AMPLIFY:-96}
{
  echo ""
  echo "| master | result |"
  echo "|---|---|"
  for M in "local[2]" "local[8]"; do
    OUT=$(spark-submit --master "$M" --driver-memory 8g --py-files /tmp/mgs.zip \
      jobs/georeference_job.py --sf-dir "$SF" --amplify "$AMP" --gaz-amplify "$AMP" 2>/dev/null | tail -1)
    echo "| $M | \`$OUT\` |"
  done
} >> BENCH/BASELINE.md
echo done
