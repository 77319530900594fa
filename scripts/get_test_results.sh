#!/usr/bin/env bash
# Retrain with tuned params and evaluate on the test set for every
# algorithm/dataset (reference get_test_results.sh).
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
      python -m ganmf_tpu.cli.run_best "$ds" "$algo" --user "$@"
      python -m ganmf_tpu.cli.run_best "$ds" "$algo" --item "$@"
    else
      python -m ganmf_tpu.cli.run_best "$ds" "$algo" "$@"
    fi
  done
  for sim in "${SIMILARITIES[@]}"; do
    python -m ganmf_tpu.cli.run_best "$ds" ItemKNN "$sim" "$@"
  done
done
