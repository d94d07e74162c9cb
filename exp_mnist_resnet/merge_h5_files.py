"""Merge per-worker Gram shard files (NaN-fill semantics).

CLI-compatible rebuild of the reference tool (reference:
exp_mnist_resnet/merge_h5_files.py:1-31): NaN entries of the destination
take the source's values; completion bitmaps are OR-merged when present.
"""

import sys

from cnn_gp_tpu.data import merge_stores

if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(f"Usage: {sys.argv[0]} dest_file "
              f"[source_file1 source_file2 ...]")
        sys.exit(1)
    _, dest_file, *src_files = sys.argv
    merge_stores(dest_file, src_files)
    print(f"merged {len(src_files)} shard(s) into {dest_file}")
