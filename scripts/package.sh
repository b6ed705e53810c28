#!/usr/bin/env bash
# Build the --py-files archive for spark-submit.
#   scripts/package.sh           -> dist/osm_data_3d_tiles_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/osm_data_3d_tiles_spark.zip
# stdlib zip: deterministic, no extra deps
python - <<'EOF'
import os, zipfile
out = "dist/osm_data_3d_tiles_spark.zip"
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("osm_data_3d_tiles_spark"):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
