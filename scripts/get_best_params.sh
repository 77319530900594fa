#!/usr/bin/env bash
# Tune every algorithm on every dataset (reference get_best_params.sh:3-30).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PWD}:${PYTHONPATH:-}"

ALGOS=(TopPop PureSVD ALS SLIMBPR P3Alpha CFGAN CAAE GANMF DisGANMF)
GAN_ALGOS=(CFGAN GANMF DisGANMF)
DATASETS=(1M hetrec2011 LastFM)
SIMILARITIES=(cosine jaccard tversky dice euclidean asymmetric)

for ds in "${DATASETS[@]}"; do
  for algo in "${ALGOS[@]}"; do
    if [[ " ${GAN_ALGOS[*]} " == *" ${algo} "* ]]; then
      python -m ganmf_tpu.cli.experiment "$ds" "$algo" --user
      python -m ganmf_tpu.cli.experiment "$ds" "$algo" --item
    else
      python -m ganmf_tpu.cli.experiment "$ds" "$algo"
    fi
  done
  for sim in "${SIMILARITIES[@]}"; do
    python -m ganmf_tpu.cli.experiment "$ds" ItemKNN "$sim"
  done
done
