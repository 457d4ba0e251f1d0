#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule launch form):
#   spark-submit --py-files dist/nlp_entity_linking_spark.zip main.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
python - <<'EOF'
import shutil
shutil.make_archive("dist/nlp_entity_linking_spark", "zip", ".", "nlp_entity_linking_spark")
print("dist/nlp_entity_linking_spark.zip")
EOF
