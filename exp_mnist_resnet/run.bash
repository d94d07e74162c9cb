#!/usr/bin/env bash
# End-to-end MNIST pipeline (rebuild of reference exp_mnist_resnet/run.bash):
# sharded Gram assembly -> shard merge -> GP classification.
#
# The reference derives its worker count from CUDA_VISIBLE_DEVICES and
# launches one process per GPU; here one process drives the TPU chip (or a
# whole mesh), and N_WORKERS>1 is only needed for multi-host fleets sharing
# a filesystem.
set -e

CONFIG=${CONFIG:-mnist_as_tf}
DATASETS=${DATASETS:-/tmp/datasets}
OUT_DIR=${OUT_DIR:-/tmp/grams_tpu/$CONFIG}
BATCH=${BATCH:-200}
JITTER=${JITTER:-0.0}
SOLVER=${SOLVER:-chol_ir}
N_WORKERS=${N_WORKERS:-1}

if [ -d "$OUT_DIR" ]; then
    echo "Output dir $OUT_DIR exists; tile-level resume will skip finished work."
fi
mkdir -p "$OUT_DIR"

pids=()
for rank in $(seq 0 $((N_WORKERS - 1))); do
    printf -v path "%s/%02d_nw%02d.h5" "$OUT_DIR" "$rank" "$N_WORKERS"
    python -m exp_mnist_resnet.save_kernel \
        --config="$CONFIG" --datasets_path="$DATASETS" \
        --batch_size="$BATCH" --n_workers="$N_WORKERS" \
        --worker_rank="$rank" --out_path="$path" &
    pids+=($!)
done
for pid in "${pids[@]}"; do
    wait "$pid"
done

printf -v dest "%s/00_nw%02d.h5" "$OUT_DIR" "$N_WORKERS"
if [ "$N_WORKERS" -gt 1 ]; then
    srcs=()
    for rank in $(seq 1 $((N_WORKERS - 1))); do
        printf -v p "%s/%02d_nw%02d.h5" "$OUT_DIR" "$rank" "$N_WORKERS"
        srcs+=("$p")
    done
    python -m exp_mnist_resnet.merge_h5_files "$dest" "${srcs[@]}"
fi

python -m exp_mnist_resnet.classify_gp \
    --config="$CONFIG" --datasets_path="$DATASETS" \
    --in_path="$dest" --jitter="$JITTER" --solver="$SOLVER"
