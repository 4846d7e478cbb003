#!/bin/sh
# Build tile_grid_spark.zip for `spark-submit --py-files` deployment.
#
#   sh scripts/package_pyfiles.sh [outdir]
#   spark-submit --py-files dist/tile_grid_spark.zip jobs/run_pipeline.py ...
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/dist}"
mkdir -p "$OUT"
cd "$REPO"
rm -f "$OUT/tile_grid_spark.zip"
# package the library only; jobs stay as driver scripts
python3 - "$OUT/tile_grid_spark.zip" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("tile_grid_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote", out)
EOF
