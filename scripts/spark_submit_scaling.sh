#!/bin/bash
# Two-cluster-size scaling via the REAL deployment path: spark-submit
# --py-files (north_rule). Packages supercrawler_spark into a zip, submits
# the micro-cycle core at local[N] and local[4N] on identical cached input,
# and prints the two JSON lines plus the efficiency.
#
# Usage: scripts/spark_submit_scaling.sh [N]   (default 8 → compares 8 vs 32)
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-8}"
BIG=$((N * 4))
ZIP=/tmp/supercrawler_spark.zip
rm -f "$ZIP"
(cd . && zip -qr "$ZIP" supercrawler_spark -x '*__pycache__*')

# bench inputs must exist (bench.py writes them); build if missing
if [ ! -e "${SC_BENCH_DIR:-/tmp/sc_bench}/_ready_v3" ]; then
  python - <<'EOF'
from supercrawler_spark.session import get_spark
import bench
spark = get_spark("prep")
spark.sparkContext.setLogLevel("ERROR")
bench._ensure_bench_inputs(spark)
spark.stop()
EOF
fi

SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
run() {
  local master="$1"
  "$SUBMIT" --master "$master" \
    --conf spark.sql.shuffle.partitions="${2}" \
    --conf spark.driver.memory=24g \
    --py-files "$ZIP" \
    scripts/submit_scaling.py 2>/dev/null | tail -1
}
SMALL_JSON=$(run "local[$N]" "$N")
BIG_JSON=$(run "local[$BIG]" "$BIG")
echo "$SMALL_JSON"
echo "$BIG_JSON"
python - "$SMALL_JSON" "$BIG_JSON" "$N" "$BIG" <<'EOF'
import json, sys
small, big = json.loads(sys.argv[1]), json.loads(sys.argv[2])
n, b = int(sys.argv[3]), int(sys.argv[4])
eff = small["wall_s"] / big["wall_s"] / (b / n)
print(json.dumps({"submit_path": "spark-submit --py-files",
                  f"wall_s_local[{n}]": small["wall_s"],
                  f"wall_s_local[{b}]": big["wall_s"],
                  "efficiency_n_to_4n": round(eff, 3)}))
EOF
