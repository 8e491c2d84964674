"""Feature-extraction pipeline tests: oracle matching, axes, records."""

import numpy as np
import pytest

from crct_tpu.data.example_builder import ExampleBuilder
from crct_tpu.data.tokenizer import WordPieceTokenizer
from crct_tpu.config import default_params
from crct_tpu.detector.extract import (build_feature_record, chunk_gen,
                                       dvqa_axes, get_axes_info,
                                       get_nonvis_ids, inject_img_token,
                                       normalize_bbox, resize_shortest_edge,
                                       validate_both_axes)
from crct_tpu.detector.ocr import match_bboxes, ocr_oracle
from crct_tpu.detector.pie import get_pie_areas


def test_match_bboxes_hungarian():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    pred = np.array([[21, 19, 31, 29], [1, 0, 10, 11], [50, 50, 60, 60]],
                    np.float32)
    idx_gt, idx_pred, ious = match_bboxes(gt, pred, iou_thresh=0.2)
    pairs = set(zip(idx_gt.tolist(), idx_pred.tolist()))
    assert pairs == {(0, 1), (1, 0)}
    assert np.all(ious > 0.2)


def test_ocr_oracle_attaches_text():
    gt = {'bboxes': np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32),
          'text': np.array(["alpha", "beta"])}
    pred = {'bboxes': np.array([[19, 19, 31, 31], [0, 1, 10, 9]], np.float32),
            'class': np.array([3, 5])}
    out = ocr_oracle(pred, gt)
    m = dict(zip(out['text'].tolist(), out['class'].tolist()))
    assert m == {"beta": 3, "alpha": 5}


def test_validate_axes_synthesis():
    boxes = np.array([[5, 5, 50, 40], [10, 10, 20, 20]], np.float32)
    # both missing -> synthesized, returns None
    ab = {'x_axis': np.zeros((0, 4)), 'y_axis': np.zeros((0, 4))}
    assert validate_both_axes(ab, boxes, verbose=False) is None
    assert ab['x_axis'].shape == (4,) and ab['y_axis'].shape == (4,)
    # x missing -> synthesized from y, returns False
    ab = {'x_axis': np.zeros((0, 4)),
          'y_axis': np.array([[4.0, 5.0, 6.0, 45.0]])}
    assert validate_both_axes(ab, boxes, verbose=False) is False
    assert ab['x_axis'][1] == ab['x_axis'][3] == 45.0  # sits at y-axis bottom
    # both present -> True
    ab = {'x_axis': np.array([[5.0, 40, 50, 42]]),
          'y_axis': np.array([[4.0, 5, 6, 45]])}
    assert validate_both_axes(ab, boxes, verbose=False) is True


def _synthetic_detections():
    """A fake chart: axes rules, title, tick labels, legend, 3 bars."""
    _, cls_dict = get_nonvis_ids("plotqa")
    H, W = 480, 640
    entries = []  # (box, class, text or None)
    entries.append(([60, 400, 600, 404], cls_dict['x_axis'], None))
    entries.append(([58, 40, 62, 400], cls_dict['y_axis'], None))
    entries.append(([250, 10, 420, 28], cls_dict['title'], "annual revenue"))
    entries.append(([280, 440, 380, 455], cls_dict['xlabel'], "years"))
    entries.append(([10, 180, 24, 260], cls_dict['ylabel'], "value"))
    for i, (txt, xc) in enumerate([("north", 150), ("south", 330),
                                   ("east", 510)]):
        entries.append(([xc - 20, 410, xc + 20, 425],
                        cls_dict['xticklabel'], txt))
    for i, (txt, yc) in enumerate([("0", 400), ("50", 220), ("100", 40)]):
        entries.append(([30, yc - 8, 54, yc + 8],
                        cls_dict['yticklabel'], txt))
    entries.append(([560, 50, 620, 64], cls_dict['legend_label'], "alpha"))
    # visual bars (classes 8+ are bars in plotqa)
    entries.append(([120, 200, 180, 400], 10, None))
    entries.append(([300, 120, 360, 400], 11, None))
    entries.append(([480, 300, 540, 400], 12, None))

    boxes = np.asarray([e[0] for e in entries], np.float32)
    classes = np.asarray([e[1] for e in entries], np.int64)
    gt_texts = {
        'bboxes': np.asarray([e[0] for e in entries if e[2] is not None],
                             np.float32),
        'text': np.asarray([e[2] for e in entries if e[2] is not None]),
        'class': np.asarray([e[1] for e in entries if e[2] is not None]),
    }
    feats = np.random.default_rng(0).random((len(entries), 1024)).astype(
        np.float32)
    return feats, classes, boxes, gt_texts, (H, W)


def test_build_feature_record_schema_and_geometry():
    feats, classes, boxes, gt_texts, hw = _synthetic_detections()
    img_feat = np.zeros(1024, np.float32)
    feats, classes, boxes = inject_img_token(feats, classes, boxes, img_feat,
                                             hw)
    rec = build_feature_record(7, feats, classes, boxes, hw,
                               dataset="plotqa", gt_texts=gt_texts,
                               ocr_mode="oracle")
    assert rec["image_id"] == 7
    assert rec["class"][0] == 1000                  # <IMG> token first
    assert rec["vis_feat"].shape[1] == 1024
    tf = rec["text_feat"]
    assert tf["title"]["text"] == "annual revenue"
    assert list(tf["legend"]["label"]) == ["alpha"]
    # y ticks sorted by position with 0 at the x-axis rule (pos ~0)
    yticks = tf["y_axis"]["ticks"]
    assert [t for t, _ in yticks] == ["0", "50", "100"]
    pos = [p for _, p in yticks]
    assert pos[0] == pytest.approx(0.0, abs=0.05)
    assert pos[2] == pytest.approx(1.0, abs=0.1)
    # visual bars normalized: bottoms at the x-axis rule (y=0)
    vis_bottoms = rec["vis_bbox"][1:, 3]
    assert np.allclose(vis_bottoms, 0.0, atol=0.05)


def test_record_feeds_qa_example_builder():
    """The produced record must round-trip into the QA-stage example builder
    (the stage-1 -> stage-2 contract, SURVEY §1 data flow)."""
    feats, classes, boxes, gt_texts, hw = _synthetic_detections()
    img_feat = np.zeros(1024, np.float32)
    feats, classes, boxes = inject_img_token(feats, classes, boxes, img_feat,
                                             hw)
    rec = build_feature_record(7, feats, classes, boxes, hw,
                               dataset="plotqa", gt_texts=gt_texts,
                               ocr_mode="oracle")
    params = default_params(max_seq_len=124, max_vis_features=44,
                            categories=228)
    builder = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    qa = {"question_string": "what is the value of north ?", "answer": 42.5,
          "qid": "D7", "type": "vbar", "image_index": 7}
    item = builder.build(rec, qa, split="train",
                         rng=np.random.default_rng(0))
    assert item["tokens"].shape == (124,)
    assert item["needs_reg"][0]           # 42.5 is out-of-vocab -> regression
    assert item["R"][3] > 0               # y-scale derived from ticks


def test_dvqa_axes_from_ticks():
    _, cls_dict = get_nonvis_ids("dvqa")
    oracle = {
        'class': np.array([3, 3, 3, 0, 0]),
        'text': np.array(["0", "50", "100", "cat_a", "cat_b"]),
        'bboxes': np.array([[30, 392, 54, 408], [30, 212, 54, 228],
                            [30, 32, 54, 48], [100, 420, 150, 440],
                            [300, 420, 350, 440]], np.float32),
    }
    vis = np.array([[0, 0, 640, 480], [100, 200, 160, 400],
                    [300, 100, 360, 400]], np.float32)
    res = dvqa_axes(cls_dict, oracle, vis)
    assert res is not None
    _, axes = res
    assert not axes['values_are_x']       # numeric ticks run vertically
    assert axes['x_axis'].shape == (1, 4)


def test_pie_areas_sum_to_2pi():
    # four quadrant boxes of a circle radius 100 at (200, 200)
    boxes = np.array([
        [100, 100, 200, 200], [200, 100, 300, 200],
        [100, 200, 200, 300], [200, 200, 300, 300],
        [0, 0, 10, 10],                      # small preview -> None
    ], np.float32)
    areas, center, r = get_pie_areas(boxes)
    assert areas[-1] is None
    vals = [a for a in areas if a is not None]
    assert len(vals) == 4
    assert sum(vals) == pytest.approx(2 * np.pi, rel=1e-3)


def test_resize_shortest_edge_semantics():
    """Detectron2 ResizeShortestEdge parity: short edge -> target unless the
    long edge would exceed max_size, then cap to fit; 0 disables upscaling
    but still fits oversized images into the canvas (no cropping)."""
    # plain short-edge hit: 480x640 -> 800x1067
    assert resize_shortest_edge(480, 640, 800, 1344) == (800, 1067)
    # long-edge cap: 480x1280 @ short 800 wants 800x2133 -> capped to 1344
    h, w = resize_shortest_edge(480, 1280, 800, 1344)
    assert w == 1344 and h == int(480 * (1344 / 1280) + 0.5)
    # disabled (short_edge=0): identity when it fits...
    assert resize_shortest_edge(240, 320, 0, 1344) == (240, 320)
    # ...but oversized images downscale to fit instead of being cropped
    assert resize_shortest_edge(2000, 1500, 0, 1344) == (1344, 1008)
    # aspect preserved within rounding
    h, w = resize_shortest_edge(240, 320, 800, 1344)
    assert abs(w / h - 320 / 240) < 0.01
    # rectangular canvas: both axes cap independently
    assert resize_shortest_edge(480, 640, 800, (832, 1344)) == (800, 1067)
    h, w = resize_shortest_edge(640, 640, 800, (832, 1344))
    assert (h, w) == (800, 800)
    h, w = resize_shortest_edge(1000, 600, 800, (832, 1344))
    assert h == 832 and w == int(600 * (832 / 1000) + 0.5)


def test_dvqa_gt_mode_rejected():
    """DVQA GT annotations carry no class labels; the pure-GT path must
    fail with a clear message (the reference crashes via assert False,
    extract_features.py:503-510)."""
    with pytest.raises(ValueError, match="ocr-gt"):
        build_feature_record(1, np.zeros((2, 4), np.float32),
                             np.array([1000, 3]),
                             np.array([[0, 0, 4, 4], [1, 1, 2, 2]],
                                      np.float32),
                             (100, 200), dataset="dvqa", ocr_mode="gt",
                             gt_texts={'bboxes': np.zeros((1, 4)),
                                       'text': np.array(["5"])})


def test_chunk_gen_range_resume():
    lst = list(range(100))
    chunks = list(chunk_gen(lst, 10))
    assert len(chunks) == 10 and chunks[0][0] == 0
    resumed = list(chunk_gen(lst, 10, chunk_range="3:5"))
    assert [c for c, _ in resumed] == [3, 4]
    assert resumed[0][1][0] == 30


@pytest.mark.parametrize("canvas", ["64", "32,64"])
def test_extract_cli_batched_inference(tmp_path, canvas):
    """cli.extract_features end-to-end on synthetic PNGs: vmapped
    --infer-batch detection, --load-weights none, shard writing, square
    AND rectangular compiled canvases. The CLI's MaskRCNN constructor is
    patched to the depth-14 test trunk."""
    import json
    from unittest import mock

    from crct_tpu.cli import extract_features as xf
    from crct_tpu.detector.mask_rcnn import MaskRCNN
    from crct_tpu.detector.synthetic_charts import generate_png_dataset

    generate_png_dataset(str(tmp_path / "data"), n_images=3, seed=0,
                         split="test")
    out_dir = tmp_path / "out"

    def tiny_rcnn(**kw):
        kw.update(depth=14, post_nms_topk_test=32)
        return MaskRCNN(**kw)

    # the CLI imports MaskRCNN inside main(), so patching the module
    # attribute swaps in the tiny trunk
    with mock.patch("crct_tpu.detector.mask_rcnn.MaskRCNN", tiny_rcnn):
        xf.main(["--load-weights", "none",
                 "--dir-path", str(tmp_path / "data"), "--split", "test",
                 "--output", str(out_dir), "--batch-size", "3",
                 "--infer-batch", "2", "--ocr-gt", "--dataset", "plotqa",
                 "--image-size", canvas])
    recs = np.load(out_dir / "0.npy", allow_pickle=True)
    assert len(recs) == 3
    for r in recs:
        assert r["class"][0] == 1000          # <IMG> token at row 0
        assert r["vis_feat"].shape[1] == 1024
        assert set(r) >= {"image_id", "vis_bbox", "height", "width"}
        # original-image extent, width=W convention (synthetic charts are
        # 320x240 WxH; detection ran resized into the 64px canvas)
        assert (r["width"], r["height"]) == (320, 240)


def test_score_thresh_plumbing():
    """--score-thresh reaches MaskRCNN.score_thresh_test; the default stays
    out of the constructor kwargs (backward compat with already-imported
    module versions in long in-process pipelines), and a lower cut keeps
    at least as many detections in box_head_inference."""
    import jax.numpy as jnp

    from crct_tpu.detector.extract import detector_from_weights
    from crct_tpu.detector.heads import box_head_inference

    model, _, _, _ = detector_from_weights(
        "none", dataset="plotqa", num_classes=4, canvas=(32, 32), depth=14,
        score_thresh=0.05)
    assert model.score_thresh_test == 0.05
    model_def, _, _, _ = detector_from_weights(
        "none", dataset="plotqa", num_classes=4, canvas=(32, 32), depth=14)
    assert model_def.score_thresh_test == 0.5

    rng = np.random.RandomState(0)
    n, c = 24, 4
    scores = jnp.asarray(rng.randn(n, c + 1).astype(np.float32))
    deltas = jnp.zeros((n, c, 4), jnp.float32)
    props = jnp.asarray(
        np.stack([rng.uniform(0, 10, n), rng.uniform(0, 10, n),
                  rng.uniform(20, 30, n), rng.uniform(20, 30, n)], 1)
        .astype(np.float32))
    valid = jnp.ones((n,), jnp.float32)
    n_low = int(box_head_inference(scores, deltas, props, valid, (32, 32),
                                   score_thresh=0.05)[3].sum())
    n_high = int(box_head_inference(scores, deltas, props, valid, (32, 32),
                                    score_thresh=0.5)[3].sum())
    assert n_low >= n_high and n_low > 0


def test_apply_ocr_with_stubbed_pytesseract(monkeypatch):
    """Real-OCR cleanup logic (reference extract_features.py:579-627) tested
    with a stubbed pytesseract: 5px crop dilation (clamped), >=3-aspect
    vertical-tick rotation, empty-page '0' fallback, FigureQA color fuzzy
    matching, and numeric cleanup of stray leading/trailing chars."""
    import sys
    import types

    from crct_tpu.detector import ocr as ocr_mod

    calls = []

    def fake_image_to_string(crop):
        calls.append(np.asarray(crop).shape)
        idx = len(calls) - 1
        return ["12.5\nnoise", "\x0c", "Dark Turqoise", "(37.5)",
                "qqqq zzzz"][idx]

    fake = types.ModuleType("pytesseract")
    fake.image_to_string = fake_image_to_string
    monkeypatch.setitem(sys.modules, "pytesseract", fake)

    image = np.zeros((100, 200, 3), np.uint8)
    cls_dict = {"xticklabel": 3}
    boxes = np.asarray([
        [10, 10, 20, 55],     # xticklabel, aspect (55-10)/(20-10)=4.5 -> rotate
        [30, 30, 60, 40],     # empty OCR -> "0"
        [50, 10, 90, 25],     # fuzzy color match
        [0, 0, 30, 12],       # "(37.5)" -> strip to "37.5"
        [100, 50, 150, 70],   # free text passes through
    ], np.float32)
    classes = np.asarray([3, 9, 9, 9, 9])
    texts = ocr_mod.apply_ocr(image, boxes, classes, cls_dict)
    assert texts == ["12.5", "0", "Dark Turquoise", "37.5", "qqqq zzzz"]
    # the vertical tick crop was rotated: dilated crop is (50+10)x(15+10+1-ish)
    # tall->wide after rot90
    h0, w0 = calls[0][:2]
    assert w0 > h0
