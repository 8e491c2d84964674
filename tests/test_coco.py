"""COCO data layer + mAP evaluator + detector trainer smoke tests."""

import json
import os

import numpy as np
import pytest

from crct_tpu.detector.coco import (CocoDataset, average_precision,
                                    evaluate_detections, rasterize_mask28)


def make_coco_fixture(tmp_path, n_images=3, size=64):
    from PIL import Image, ImageDraw
    img_dir = tmp_path / "png"
    img_dir.mkdir(exist_ok=True)
    images, annotations = [], []
    aid = 0
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img = Image.new("RGB", (size, size), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        n_boxes = int(rng.integers(1, 4))
        for _ in range(n_boxes):
            x, y = rng.integers(0, size - 20, 2)
            w, h = rng.integers(8, 20, 2)
            cat = int(rng.integers(1, 4))
            draw.rectangle([int(x), int(y), int(x + w), int(y + h)],
                           fill=(50 * cat, 20, 20))
            annotations.append({
                "id": aid, "image_id": i, "category_id": cat,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
                "segmentation": [[float(x), float(y), float(x + w), float(y),
                                  float(x + w), float(y + h),
                                  float(x), float(y + h)]],
            })
            aid += 1
        img.save(img_dir / f"{i}.png")
        images.append({"id": i, "file_name": f"{i}.png",
                       "width": size, "height": size})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": f"cls{c}"} for c in (1, 2, 3)]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(coco))
    return str(ann_path), str(img_dir)


def test_coco_dataset_fixed_shapes(tmp_path):
    ann, img_dir = make_coco_fixture(tmp_path)
    ds = CocoDataset(ann, img_dir, max_boxes=8, short_edge=64, max_size=96,
                     with_masks=True)
    assert len(ds) == 3
    ex = ds[0]
    assert ex["image"].shape == (96, 96, 3)
    assert ex["gt_boxes"].shape == (8, 4)
    assert ex["gt_masks28"].shape == (8, 28, 28)
    assert ex["gt_valid"].any()
    # boxes scaled by the resize factor and inside the padded image
    v = ex["gt_valid"]
    assert (ex["gt_boxes"][v] <= 96.0).all()


def test_rasterize_mask28_full_box():
    seg = [[0.0, 0.0, 28.0, 0.0, 28.0, 28.0, 0.0, 28.0]]
    m = rasterize_mask28(seg, np.array([0, 0, 28, 28], np.float32), 1.0)
    assert m.shape == (28, 28)
    assert m.mean() > 0.9


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert average_precision(rec, prec) == pytest.approx(1.0, abs=0.01)


def test_evaluate_detections_perfect_and_empty():
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
            "classes": np.array([0, 1])}]
    dets_perfect = [{"boxes": gts[0]["boxes"].copy(),
                     "scores": np.array([0.9, 0.8], np.float32),
                     "classes": np.array([0, 1])}]
    m = evaluate_detections(dets_perfect, gts, num_classes=3)
    assert m["bbox_mAP"] == pytest.approx(1.0, abs=0.02)
    dets_none = [{"boxes": np.zeros((0, 4), np.float32),
                  "scores": np.zeros(0, np.float32),
                  "classes": np.zeros(0, np.int64)}]
    m = evaluate_detections(dets_none, gts, num_classes=3)
    assert m["bbox_mAP"] == 0.0


def test_evaluate_detections_shifted_boxes():
    gts = [{"boxes": np.array([[0, 0, 20, 20]], np.float32),
            "classes": np.array([0])}]
    # IoU ~ 0.51 detection: counts at low thresholds only
    dets = [{"boxes": np.array([[0, 0, 20, 13.4]], np.float32),
             "scores": np.array([0.9], np.float32),
             "classes": np.array([0])}]
    m = evaluate_detections(dets, gts, num_classes=1)
    assert m["bbox_AP50"] == pytest.approx(1.0, abs=0.02)
    assert 0.05 < m["bbox_mAP"] < 0.5


def test_detector_trainer_smoke(tmp_path):
    from crct_tpu.detector.trainer import DetectorTrainer, coco_evaluate
    ann, img_dir = make_coco_fixture(tmp_path, n_images=2, size=64)
    ds = CocoDataset(ann, img_dir, max_boxes=8, short_edge=64, max_size=64,
                     with_masks=True)
    trainer = DetectorTrainer(ds, num_classes=3, with_mask=True, depth=14,
                              batch_size=2, roi_batch=16, post_nms_topk=16)
    batch = {k: np.stack([ds[i][k] for i in range(2)])
             for k in ("image", "gt_boxes", "gt_classes", "gt_valid",
                       "gt_masks28")}
    losses = trainer.run_step(batch)
    assert np.isfinite(losses["total"])
    metrics = coco_evaluate(trainer.model, trainer.params, ds, max_images=1)
    assert "bbox_mAP" in metrics


def test_augmentation_flip_consistency(tmp_path):
    """Train-time augmentation (hflip + multi-scale short edge, the
    Detectron2 INPUT defaults the reference inherits via DefaultTrainer,
    frcnn.py:182-205): flipped boxes must mirror the unflipped ones at the
    same scale, mask targets must flip left-right, and every sampled scale
    must land in the SAME padded canvas (one compiled shape)."""
    ann, img_dir = make_coco_fixture(tmp_path, n_images=1, size=64)
    base = CocoDataset(ann, img_dir, max_boxes=8, short_edge=48, max_size=96,
                       with_masks=True)
    aug = CocoDataset(ann, img_dir, max_boxes=8, short_edge=48, max_size=96,
                      with_masks=True, augment=True,
                      train_scales=(32, 48, 64), aug_seed=3)

    # collect one flipped and one unflipped draw of the same image
    seen = {}
    scales = set()
    for _ in range(64):
        ex = aug[0]
        assert ex["image"].shape == (96, 96, 3)   # fixed canvas always
        scales.add(round(float(ex["scale"]), 6))
        seen.setdefault((ex["flipped"], round(float(ex["scale"]), 6)), ex)
    assert len(scales) > 1, "multi-scale sampling never varied the scale"
    flips = {k[0] for k in seen}
    assert flips == {True, False}, "hflip never sampled both branches"

    # pick a (flipped, unflipped) pair at the SAME scale
    pair = None
    for (fl, sc), ex in seen.items():
        if fl and (False, sc) in seen:
            pair = (seen[(False, sc)], ex)
            break
    assert pair is not None
    plain, flipped = pair
    nw = plain["hw"][1]
    v = plain["gt_valid"]
    assert (v == flipped["gt_valid"]).all()
    # boxes mirror about the resized image's vertical centerline
    want = plain["gt_boxes"][v].copy()
    want[:, [0, 2]] = nw - want[:, [2, 0]]
    np.testing.assert_allclose(flipped["gt_boxes"][v], want, atol=1e-4)
    # mask targets flip left-right (box-local frame)
    np.testing.assert_allclose(flipped["gt_masks28"][v],
                               plain["gt_masks28"][v][:, :, ::-1], atol=1e-6)
    # the flipped image content equals the flipped plain image content
    # within the resized region
    nh = plain["hw"][0]
    np.testing.assert_allclose(flipped["image"][:nh, :nw],
                               plain["image"][:nh, :nw][:, ::-1], atol=1e-4)

    # augment=False (the eval path) stays deterministic
    e1, e2 = base[0], base[0]
    np.testing.assert_array_equal(e1["image"], e2["image"])
    assert e1["flipped"] is False


def test_detector_batch_iterator_prefetch(tmp_path):
    """The threaded batch producer yields exactly max_iter fixed-shape
    batches, shuffles with wrap-around, and surfaces producer errors."""
    from crct_tpu.detector.trainer import detector_batch_iterator
    ann, img_dir = make_coco_fixture(tmp_path, n_images=3, size=64)
    ds = CocoDataset(ann, img_dir, max_boxes=8, short_edge=64, max_size=64,
                     with_masks=True)
    keys = ("image", "gt_boxes", "gt_classes", "gt_valid", "gt_masks28")
    batches = list(detector_batch_iterator(ds, 2, keys, max_iter=4, seed=1))
    assert len(batches) == 4
    for b in batches:
        assert set(b) == set(keys)
        assert b["image"].shape == (2, 64, 64, 3)
        assert b["gt_masks28"].shape == (2, 8, 28, 28)

    class Boom:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise ValueError("boom")

    import pytest as _pytest
    with _pytest.raises(ValueError, match="boom"):
        next(detector_batch_iterator(Boom(), 2, keys, max_iter=1))
