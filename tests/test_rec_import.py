"""MXNet RecordIO (.rec) ingestion + one-way .drec migration.

Locks the wire format against the reference's packing path
(tools/im2rec.py:137-140 / mx.recordio): framing, multipart split/rejoin at
embedded kMagic, IRHeader + packed label vectors, and the end-to-end
migrate-then-train-serve path.
"""

import os
import struct

import cv2
import numpy as np

from dspnet_tpu.data.rec_import import (
    KMAGIC,
    _MAGIC_BYTES,
    convert_rec,
    load_rec_index,
    pack_payload,
    read_records,
    unpack_payload,
    write_records,
)


def _jpeg(rng, hw=(32, 48)):
    img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def _lst_label(rows):
    """Reference .lst packed label vector: [2, W, objects...] (imdb.py:81)."""
    rows = np.asarray(rows, np.float32)
    return np.concatenate([[2.0, rows.shape[1]], rows.reshape(-1)]).astype(np.float32)


def test_recordio_framing_and_multipart(tmp_path, rng):
    rec = str(tmp_path / "a.rec")
    img0, img1 = _jpeg(rng), _jpeg(rng)
    # payload 1 deliberately CONTAINS the magic bytes (a label float whose
    # LE bytes are 0a 23 d7 ce) -> the writer must split, the reader rejoin
    magic_float = struct.unpack("<f", _MAGIC_BYTES)[0]
    lab0 = _lst_label([[1, 0.1, 0.2, 0.5, 0.6, 0.3]])
    lab1 = np.concatenate([_lst_label([[2, 0.3, 0.3, 0.9, 0.8, 0.0]]),
                           [magic_float]]).astype(np.float32)
    p0 = pack_payload(0, lab0, img0)
    p1 = pack_payload(1, lab1, img1)
    assert _MAGIC_BYTES in p1
    offsets = write_records(rec, [p0, p1])
    assert offsets[0] == 0

    got = list(read_records(rec))
    assert len(got) == 2
    start0, len0, pay0 = got[0]
    assert start0 == 8 and len0 == len(p0) and pay0 == p0
    start1, _, pay1 = got[1]
    assert start1 == -1 and pay1 == p1  # multipart, rejoined bit-exact

    rid, vec, img_off, img = unpack_payload(pay1)
    assert rid == 1
    np.testing.assert_array_equal(vec, lab1)
    assert img == img1

    # raw framing spot-check: first word is kMagic
    with open(rec, "rb") as f:
        assert struct.unpack("<I", f.read(4))[0] == KMAGIC


def test_load_rec_index_spans_serve_original_bytes(tmp_path, rng):
    from dspnet_tpu.data.iterator import read_span

    rec = str(tmp_path / "b.rec")
    imgs = [_jpeg(rng) for _ in range(3)]
    labels = [
        [[0, 0.1, 0.1, 0.4, 0.5, 0.2]],
        [[3, 0.2, 0.3, 0.8, 0.9, 0.0], [1, 0.0, 0.0, 0.3, 0.3, 0.5]],
        [[5, 0.5, 0.5, 0.9, 0.9, 0.1]],
    ]
    write_records(rec, [pack_payload(i, _lst_label(l), im)
                        for i, (l, im) in enumerate(zip(labels, imgs))])
    index = load_rec_index(rec)
    assert len(index) == 3
    for i in range(3):
        s = index[i]
        assert bytes(read_span(s.image_span)) == imgs[i]
        rows = s.label[s.label[:, 0] >= 0]
        np.testing.assert_allclose(rows, np.asarray(labels[i], np.float32))


def test_convert_rec_to_drec_and_train_serve(tmp_path, rng):
    """Full migration: .rec (+.lst with real paths and a seg mask) ->
    load_rec_index -> .drec -> MultiTaskIterator batch."""
    from dspnet_tpu.data.iterator import MultiTaskIterator, read_span
    from dspnet_tpu.data.record import load_record_index
    from dspnet_tpu.tools import im2rec

    root = tmp_path / "ds"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    imgs, lst_lines = [], []
    labels = [[[0, 0.1, 0.1, 0.4, 0.5, 0.2]],
              [[3, 0.2, 0.3, 0.8, 0.9, 0.0]]]
    for i in range(2):
        img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        name = f"JPEGImages/s{i}_leftImg8bit.jpg"
        cv2.imwrite(str(root / name), img)
        imgs.append(open(root / name, "rb").read())
        seg = (rng.rand(32, 48) * 19).astype(np.uint8)
        cv2.imwrite(str(root / f"SegmentationClass/s{i}_gtFine_labelTrainIds.png"), seg)
        flat = " ".join("%.4f" % v for v in np.asarray(labels[i]).reshape(-1))
        lst_lines.append(f"{i}\t2\t6\t{flat}\t{root / name}\n")
    lst = str(tmp_path / "c.lst")
    open(lst, "w").writelines(lst_lines)
    rec = str(tmp_path / "c.rec")
    write_records(rec, [pack_payload(i, _lst_label(labels[i]), imgs[i])
                        for i in range(2)])

    im2rec.main(["--from-rec", rec, "--lst", lst,
                 "--out", str(tmp_path / "out" / "train")])
    index = load_record_index(str(tmp_path / "out" / "train"))
    assert len(index) == 2
    for i in range(2):
        s = index[i]
        assert bytes(read_span(s.image_span)) == imgs[i]
        assert s.seg_span is not None  # the lst lookup found the mask
        rows = s.label[s.label[:, 0] >= 0]
        np.testing.assert_allclose(rows, np.asarray(labels[i], np.float32),
                                   rtol=1e-6)

    it = MultiTaskIterator(index, batch_size=2, data_shape=(32, 64),
                           enable_aug=False, shuffle=False)
    batch, fnames = next(it.epoch())
    assert batch["images"].shape == (2, 32, 64, 3)
    assert "seg_label" in batch
    assert fnames[0].endswith("s0_leftImg8bit.jpg")

    # --no-seg must skip the seg-mask lookup on the migration path too
    im2rec.main(["--from-rec", rec, "--lst", lst, "--no-seg",
                 "--out", str(tmp_path / "out" / "noseg")])
    noseg = load_record_index(str(tmp_path / "out" / "noseg"))
    assert all(s.seg_span is None for s in noseg)
