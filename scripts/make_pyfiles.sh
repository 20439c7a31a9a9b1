#!/usr/bin/env bash
# Build the --py-files archive for spark-submit deployments:
#   ./scripts/make_pyfiles.sh  ->  dist/geo_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/geo_spark.zip
python -c "
import zipfile, pathlib
z = zipfile.ZipFile('dist/geo_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('geo_spark').rglob('*.py')):
    z.write(p, p.as_posix())
z.close()
print('dist/geo_spark.zip written')
"
