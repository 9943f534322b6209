"""Build the full-scale dress-rehearsal dataset (VERDICT r4 item 2).

Real Cityscapes is 2975 train / 500 val at raw 1024x2048
(reference run_multi.sh:12-22 trains on exactly that split). No real
download exists in this environment, so this synthesizes the same *scale*
in the synthetic-Cityscapes contract (dspnet_tpu/data/synthetic.py):
raw-res JPEGs, trainId seg PNGs, disparity PNGs, instanceIds PNGs for the
val split — then packs each split into a .drec store so training exercises
the packed-record path end to end (load_index prefers {split}.drec).

Usage:
    python scripts/make_scale_dataset.py [root] [n_train] [n_val]
    # defaults: /tmp/dspnet_scale 2975 500
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dspnet_tpu.data import record, synthetic


def build_split(root, split, n, seed, with_instances):
    t0 = time.time()
    split_root = os.path.join(root, split)
    index = synthetic.build_dataset(
        split_root,
        num_samples=n,
        hw=(1024, 2048),
        max_objects=12,
        seed=seed,
        with_disparity=True,
        with_instances=with_instances,
    )
    t1 = time.time()
    prefix = os.path.join(root, split)
    record.pack_records(index, prefix, quiet=True)
    print(f"{split}: {n} images in {t1 - t0:.0f}s, packed "
          f"{os.path.getsize(prefix + '.drec') / 1e9:.2f} GB .drec "
          f"in {time.time() - t1:.0f}s", flush=True)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dspnet_scale"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 2975
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    os.makedirs(root, exist_ok=True)
    build_split(root, "train", n_train, seed=233, with_instances=False)
    build_split(root, "val", n_val, seed=91, with_instances=True)
    print(f"done under {root}")


if __name__ == "__main__":
    main()
