"""Cityscapes preparation pipeline (offline, CPU).

Capability parity with the reference prep chain (SURVEY.md section 3.4):
  gtFine polygons.json --cs_json_to_xml--> half-resolution PASCAL-style XML
  (reference dataset/cs_json2xml.py:18-91, tools/convert_cityscapes.sh)
  --inject_distances--> <distance> tag per object from the median stereo
  disparity inside the box: dist = 2200*75/median, >1000 -> 200 m
  (reference data/cityscapes/disparity2distance.py:42-82)
  --save_imglist--> .lst (reference tools/prepare_dataset.py:118-140);
  optional .drec packing lives in dspnet_tpu/tools/im2rec.py (the
  tools/im2rec.py .rec/.idx equivalent).

Also includes trainId label-image generation (capability of the vendored
createTrainIdLabelImgs.py/json2labelImg.py), instanceIds generation
(createTrainIdInstanceImgs.py/json2instanceImg.py), and half-res disparity
resizing (resize_disparity.sh) so the depth metric can read
``Disparity/*_disparity.png`` from the prepared layout.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import xml.etree.ElementTree as ET
from xml.dom import minidom

import cv2
import numpy as np

from dspnet_tpu.data.cs_labels import name2label

DISPARITY_SCALE = 2200.0 * 75.0


def _load_polygons(json_path: str, parsed: dict | None = None) -> dict:
    if parsed is not None:
        return parsed
    with open(json_path) as f:
        return json.load(f)


def json_to_xml(json_path: str, xml_path: str | None = None, scale: float = 0.5,
                parsed: dict | None = None) -> str:
    """Polygon JSON -> PASCAL-style XML with polygon-extent boxes, at
    ``scale`` resolution (the reference halves, cs_json2xml.py:38,67)."""
    parsed = _load_polygons(json_path, parsed)
    if xml_path is None:
        xml_path = json_path.replace(".json", ".xml")

    top = ET.Element("annotation")
    ET.SubElement(top, "filename").text = os.path.basename(
        json_path.replace("json", "jpg")
    ).replace("gtFine_polygons", "leftImg8bit")
    ET.SubElement(top, "folder").text = "cityscapes"
    size = ET.SubElement(top, "size")
    h = int(round(parsed["imgHeight"] * scale))
    w = int(round(parsed["imgWidth"] * scale))
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "width").text = str(w)
    ET.SubElement(size, "depth").text = "3"

    for idval, label in enumerate(parsed["objects"]):
        obj = ET.SubElement(top, "object")
        ET.SubElement(obj, "name").text = label["label"]
        ET.SubElement(obj, "difficult").text = "0"
        ET.SubElement(obj, "id").text = str(idval)
        # the reference's Python-2 int(round(p/2)) floors (integer division
        # happens before round sees it, cs_json2xml.py:67) — including for
        # negative coords, where int() would truncate toward zero instead
        # (Cityscapes polygons do extend past image borders)
        xs = [math.floor(p[0] * scale) for p in label["polygon"]]
        ys = [math.floor(p[1] * scale) for p in label["polygon"]]
        bnd = ET.SubElement(obj, "bndbox")
        ET.SubElement(bnd, "xmin").text = str(min(xs))
        ET.SubElement(bnd, "xmax").text = str(max(xs))
        ET.SubElement(bnd, "ymin").text = str(min(ys))
        ET.SubElement(bnd, "ymax").text = str(max(ys))

    with open(xml_path, "w") as f:
        f.write(minidom.parseString(ET.tostring(top, "utf-8")).toprettyxml())
    return xml_path


def disparity_to_distance(disparity_roi: np.ndarray) -> float:
    """Median-disparity -> meters (disparity2distance.py:62-68)."""
    roi = np.sort(disparity_roi.astype(np.float32).reshape(-1))
    if roi.shape[0] == 0:
        return 200.0
    # the reference's `ceil(n/2)` runs under Python-2 integer division, so
    # the index is really n//2 (disparity2distance.py:67) — and in-bounds
    # for 1-pixel ROIs
    dist = DISPARITY_SCALE / (roi[roi.shape[0] // 2] + 1e-3)
    return 200.0 if dist > 1000 else float(dist)


def inject_distances(xml_path: str, disparity_path: str, class_names) -> None:
    """Add/replace <distance> on each named object (disparity2distance.py:55-82)."""
    tree = ET.parse(xml_path)
    root = tree.getroot()
    disparity = cv2.imread(disparity_path, cv2.IMREAD_UNCHANGED)
    assert disparity is not None, disparity_path
    for obj in root.findall("object"):
        if obj.find("name").text not in class_names:
            continue
        bnd = obj.find("bndbox")
        xmin = max(0, int(bnd.find("xmin").text))
        xmax = int(bnd.find("xmax").text)
        ymin = max(0, int(bnd.find("ymin").text))
        ymax = int(bnd.find("ymax").text)
        if xmin == xmax:
            xmax = xmin + 1
        dist = disparity_to_distance(disparity[ymin:ymax, xmin:xmax])
        for tag in obj.findall("distance"):
            obj.remove(tag)
        ET.SubElement(obj, "distance").text = str(int(round(dist)))
    tree.write(xml_path)


def resize_disparity(src_path: str, dst_path: str, scale: float = 0.5) -> str:
    """Nearest-resize a raw disparity PNG to the annotation scale (the
    reference's resize_disparity.sh: `convert -interpolate nearest -filter
    point -resize 1024x512` into Disparity/). The half-res annotations index
    into this resized image (disparity2distance.py:52-64), and evaluation
    reads it back for the depth metric (train/metric.py:201-237)."""
    disparity = cv2.imread(src_path, cv2.IMREAD_UNCHANGED)
    assert disparity is not None, src_path
    h = int(round(disparity.shape[0] * scale))
    w = int(round(disparity.shape[1] * scale))
    out = cv2.resize(disparity, (w, h), interpolation=cv2.INTER_NEAREST)
    cv2.imwrite(dst_path, out)
    return dst_path


def _iter_polygons(json_path: str, scale: float = 1.0,
                   parsed: dict | None = None):
    """Yield ((h, w), [(label, pts (n,1,2) int32, is_group)]) for each
    drawable polygon at ``scale`` resolution, resolving '...group' names and
    skipping deleted/unknown labels — the shared object loop of the vendored
    json2labelImg/json2instanceImg."""
    parsed = _load_polygons(json_path, parsed)
    polys = []
    for obj in parsed["objects"]:
        if obj.get("deleted", 0):
            continue
        name = obj["label"]
        is_group = False
        if name not in name2label and name.endswith("group"):
            name = name[: -len("group")]
            is_group = True
        if name not in name2label:
            continue
        # floor (not truncate) so negative border coords match the
        # reference's Python-2 integer-division semantics
        pts = np.floor(np.asarray(obj["polygon"], np.float64) * scale).astype(
            np.int32).reshape(-1, 1, 2)
        polys.append((name2label[name], pts, is_group))
    h = int(round(parsed["imgHeight"] * scale))
    w = int(round(parsed["imgWidth"] * scale))
    return (h, w), polys


def polygons_to_trainid_png(json_path: str, out_path: str, scale: float = 1.0,
                            parsed: dict | None = None) -> str:
    """Rasterize polygon JSON to a trainId label image (capability of the
    vendored createTrainIdLabelImgs/json2labelImg scripts). ``scale`` must
    match the resolution of the images the mask will train against — the
    iterator warps image and mask with one matrix and requires equal
    shapes."""
    (h, w), polys = _iter_polygons(json_path, scale, parsed)
    out = np.full((h, w), 255, np.uint8)  # unlabeled -> ignore
    for label, pts, _ in polys:
        tid = label.trainId
        val = 255 if tid < 0 or tid == 255 else tid
        cv2.fillPoly(out, [pts], int(val))
    cv2.imwrite(out_path, out)
    return out_path


def polygons_to_instanceid_png(json_path: str, out_path: str,
                               encoding: str = "ids", scale: float = 1.0,
                               parsed: dict | None = None) -> str:
    """Rasterize polygon JSON to an instanceIds image (capability of the
    vendored createTrainIdInstanceImgs.py/json2instanceImg.py scripts).

    Pixel encoding (json2instanceImg.py:142-165): classes with
    ``hasInstances`` get ``class_id * 1000 + running_instance_number`` per
    polygon; '...group' polygons and no-instance classes get the bare class
    id; negative ids are not drawn (but still consume an instance number,
    matching the official count order). Background is the 'unlabeled' id.
    Written as a 16-bit PNG (the official gtFine *_instanceIds.png format).
    Deviation from json2instanceImg -t: with ``encoding='trainIds'``,
    ignore-classes (trainId 255, all ``ignoreInEval``) keep the bare 255
    instead of 255*1000+n — PNG is capped at 16 bits, and the official
    script's mode-"I" PIL save silently clamps those values to 65535 anyway.
    """
    (h, w), polys = _iter_polygons(json_path, scale, parsed)
    tid = encoding == "trainIds"
    background = name2label["unlabeled"].trainId if tid else name2label["unlabeled"].id
    out = np.full((h, w), max(background, 0), np.int32)
    counts: dict[str, int] = {}
    for label, pts, is_group in polys:
        val = label.trainId if tid else label.id
        if label.hasInstances and not is_group:
            if not (tid and val >= 255):
                val = val * 1000 + counts.get(label.name, 0)
            counts[label.name] = counts.get(label.name, 0) + 1
        if val < 0:
            continue
        cv2.fillPoly(out, [pts], int(val))
    cv2.imwrite(out_path, out.astype(np.uint16))
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description="Prepare Cityscapes for dspnet_tpu.")
    p.add_argument("--gtfine", required=True, help="gtFine root (with */*.json)")
    p.add_argument("--disparity", default="", help="disparity root (optional)")
    p.add_argument("--out", required=True, help="output dataset root")
    p.add_argument("--split", default="train")
    p.add_argument("--scale", type=float, default=0.5,
                   help="resolution scale of the prepared layout relative to "
                        "the raw 2048x1024 (reference halves everything; "
                        "images, XML boxes, seg masks, and disparity must "
                        "share one resolution)")
    p.add_argument("--classes", default="person,rider,car,truck,bus,train,motorcycle,bicycle")
    p.add_argument("--instance-ids", action="store_true",
                   help="also rasterize *_gtFine_instanceIds.png (for the "
                        "instance-level evaluator)")
    args = p.parse_args(argv)
    classes = args.classes.split(",")
    os.makedirs(os.path.join(args.out, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "SegmentationClass"), exist_ok=True)
    if args.instance_ids:
        os.makedirs(os.path.join(args.out, "SegmentationInstance"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "ImageSets", "Main"), exist_ok=True)
    ids = []
    for jp in sorted(glob.glob(os.path.join(args.gtfine, args.split, "*", "*_gtFine_polygons.json"))):
        stem = os.path.basename(jp).replace("_gtFine_polygons.json", "")
        with open(jp) as f:  # parse once; three rasterizers share it
            parsed = json.load(f)
        xml_path = os.path.join(args.out, "Annotations", stem + "_leftImg8bit.xml")
        json_to_xml(jp, xml_path, scale=args.scale, parsed=parsed)
        polygons_to_trainid_png(
            jp, os.path.join(args.out, "SegmentationClass", stem + "_gtFine_labelTrainIds.png"),
            scale=args.scale, parsed=parsed,
        )
        if args.instance_ids:
            polygons_to_instanceid_png(
                jp, os.path.join(args.out, "SegmentationInstance",
                                 stem + "_gtFine_instanceIds.png"),
                scale=args.scale, parsed=parsed,
            )
        if args.disparity:
            dp = os.path.join(
                args.disparity, args.split, stem.split("_")[0], stem + "_disparity.png"
            )
            if os.path.exists(dp):
                # resize to the XML's half-res coordinate frame first
                # (resize_disparity.sh), keep the result for the depth metric
                os.makedirs(os.path.join(args.out, "Disparity"), exist_ok=True)
                half = resize_disparity(
                    dp, os.path.join(args.out, "Disparity", stem + "_disparity.png"),
                    scale=args.scale)
                inject_distances(xml_path, half, classes)
        ids.append(stem + "_leftImg8bit")
    with open(os.path.join(args.out, "ImageSets", "Main", args.split + ".txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    print(f"prepared {len(ids)} annotations under {args.out}")


if __name__ == "__main__":
    main()
