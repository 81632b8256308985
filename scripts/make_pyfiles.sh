#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f tmframe_spark.zip
python - <<'EOF'
import zipfile, pathlib
with zipfile.ZipFile("tmframe_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path("tmframe_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote tmframe_spark.zip")
EOF
