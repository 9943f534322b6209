"""prepare_dataset — build .lst files (and optionally .drec packs) from imdbs.

The reference's `tools/prepare_dataset.py` wraps the imdb family into a
`.lst` + `.rec` build pipeline (reference tools/prepare_dataset.py:118-140):
PASCAL VOC (multi set/year via ConcatDB), COCO, Cityscapes. This is the
same tool for this framework: imdb -> save_imglist (.lst) -> optional
`.drec` pack (our `.rec` equivalent, dspnet_tpu/data/record.py).

Usage::

    python -m dspnet_tpu.tools.prepare_dataset --dataset pascal \
        --set trainval --year 2007,2012 --root /data/VOCdevkit \
        --target /data/train.lst --pack
    python -m dspnet_tpu.tools.prepare_dataset --dataset cityscapes \
        --set train --root /data/cityscapes --target /data/cs_train.lst
"""

from __future__ import annotations

import argparse
import os


def build_imdb(args):
    from dspnet_tpu.data.imdb import CityscapesDetSeg, CocoDet, ConcatDB, PascalVoc, YoloFormat

    if args.dataset in ("pascal", "voc"):
        sets = [s.strip() for s in args.set.split(",")]
        years = [y.strip() for y in args.year.split(",")]
        # mirror the reference's set x year zipping (prepare_dataset.py:36-46)
        if len(sets) > 1 and len(years) == 1:
            years = years * len(sets)
        if len(sets) == 1 and len(years) > 1:
            sets = sets * len(years)
        dbs = [PascalVoc(s, y, args.root, use_difficult=args.difficult)
               for s, y in zip(sets, years)]
        return dbs[0] if len(dbs) == 1 else ConcatDB(*dbs)
    if args.dataset == "coco":
        return CocoDet(args.annotation, args.root)
    if args.dataset == "cityscapes":
        return CityscapesDetSeg(args.set, args.root)
    if args.dataset == "yolo":
        classes = [c.strip() for c in args.classes.split(",") if c.strip()]
        return YoloFormat(args.list_file, args.root,
                          args.label_dir or os.path.join(args.root, "labels"), classes)
    raise ValueError(f"unknown dataset {args.dataset}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Build .lst (+ optional .drec) from a dataset.")
    p.add_argument("--dataset", required=True,
                   choices=["pascal", "voc", "coco", "cityscapes", "yolo"])
    p.add_argument("--set", default="trainval", help="image set(s), comma separated")
    p.add_argument("--year", default="2007,2012", help="VOC year(s), comma separated")
    p.add_argument("--root", required=True, help="dataset root directory")
    p.add_argument("--annotation", default="", help="COCO instances JSON")
    p.add_argument("--list-file", default="", help="YOLO image list file")
    p.add_argument("--label-dir", default="", help="YOLO label directory")
    p.add_argument("--classes", default="", help="YOLO class names, comma separated")
    p.add_argument("--difficult", action="store_true", help="keep VOC difficult objects")
    p.add_argument("--target", required=True, help="output .lst path")
    p.add_argument("--pack", action="store_true",
                   help="also pack a .drec/.idx record store next to the .lst")
    args = p.parse_args(argv)

    db = build_imdb(args)
    os.makedirs(os.path.dirname(os.path.abspath(args.target)), exist_ok=True)
    db.save_imglist(args.target)
    print(f"wrote {args.target} ({len(db.samples())} samples)")
    if args.pack:
        from dspnet_tpu.data.record import pack_records

        prefix = os.path.splitext(args.target)[0]
        pack_records(db.index(), prefix)


if __name__ == "__main__":
    main()
