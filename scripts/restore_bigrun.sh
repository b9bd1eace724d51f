#!/bin/bash
# Rebuild _work/bigrun (descriptor-annotated raw corpus + prepared
# token CSVs + vocab/scaler utils) from the committed data_artifacts/
# in ~1 minute, instead of regenerating (~30-70 min gen + ~20 min
# preprocess). See data_artifacts/README.md.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p _work/bigrun
xz -dc data_artifacts/bigrun_data.tar.xz | tar -C _work/bigrun -xf -
echo "restored _work/bigrun: $(ls _work/bigrun)"
# v2 multi-radius SA fragment table (built round 4; preferred by
# tasks/common.py::load_sa_fragments when present)
if [ -f data_artifacts/sa_fragments_v2.json.xz ]; then
  xz -dc data_artifacts/sa_fragments_v2.json.xz \
    > _work/bigrun/utils/sa_fragments_v2.json
  echo "restored sa_fragments_v2.json"
fi
# re-seed cell-resumable protocol runs from committed partial cells
# (scripts/psca_insurance.sh): the task loops skip any cell whose
# row_*.json / gen_*.csv is already present, so a cut run resumes
# where it stopped instead of re-decoding
if [ -d evidence/bigrun_r4/partial ]; then
  for tagdir in evidence/bigrun_r4/partial/*/; do
    tag=$(basename "$tagdir")
    # b15_ prefix marks results that live under the 1.5M workdir
    case "$tag" in
      b15_*) wdir=_work/bigrun15; tag=${tag#b15_} ;;
      *) wdir=_work/bigrun ;;
    esac
    for subdir in "$tagdir"*/; do
      sub=$(basename "$subdir")
      mkdir -p "$wdir/$tag/$sub"
      cp -un "$subdir"* "$wdir/$tag/$sub/" 2>/dev/null
    done
  done
  echo "re-seeded protocol cells from evidence/bigrun_r4/partial"
fi
