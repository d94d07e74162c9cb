#!/usr/bin/env bash
# Finite-NN convergence experiment (rebuild of reference exp_random_nn/
# run.bash): loop configs x channel widths {3, 10, 30, 100}, then plot.
set -e

DATASETS=${DATASETS:-/tmp/datasets}
OUT_ROOT=${OUT_ROOT:-/tmp/random_nn}
N_SAMPLES=${N_SAMPLES:-10000}

# reference run.bash:8 loops these three; its shipped artifacts also
# include an mnist_as_tf figure -- override with CONFIGS to reproduce it
CONFIGS=${CONFIGS:-"cifar10 mnist_paper_convnet_gp mnist_paper_residual_cnn_gp"}

for config in $CONFIGS; do
    out="$OUT_ROOT/$config"
    mkdir -p "$out"
    for channels in 3 10 30 100; do
        # Resume-by-skip (same idempotence as save_K, reference
        # cnn_gp/kernel_save_tools.py:32-34): a completed width leaves
        # both CSVs behind; rerunning the battery recomputes only the rest.
        csv=$(printf '%s/%04d_0001_cov.csv' "$out" "$channels")
        if [ -s "$csv" ]; then
            echo "skip $config width $channels ($csv exists)"
            continue
        fi
        python -m exp_random_nn.random_comparison \
            --config="$config" --datasets_path="$DATASETS" \
            --channels="$channels" --n_samples="$N_SAMPLES" \
            --out_path="$out"
    done
    python -m exp_random_nn.random_plot "$out" "$out/convergence.pdf"
done
