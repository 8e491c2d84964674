"""End-to-end PNG -> detection -> features -> QA pipeline test
(BASELINE config 5: the full two-stage flow on raw chart PNGs)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.config import default_params
from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.detector.coco import PIXEL_MEAN, PIXEL_STD
from crct_tpu.detector.extract import (build_feature_record, get_gt_texts,
                                       get_nonvis_ids, inject_img_token,
                                       path_to_img_id, sorted_image_files)
from crct_tpu.detector.mask_rcnn import MaskRCNN
from crct_tpu.detector.synthetic_charts import generate_png_dataset
from crct_tpu.models.crct import CRCTModel
from crct_tpu.train.eval_loop import evaluate
from tests.helpers import tiny_model_config


@pytest.fixture(scope="module")
def png_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pngs"))
    return generate_png_dataset(root, n_images=2, seed=0, split="test")


def test_png_dataset_renders(png_env):
    files = sorted_image_files(png_env["png_dir"])
    assert len(files) == 2
    with open(png_env["annotations"]) as f:
        anns = json.load(f)
    assert anns[0]["general_figure_info"]["title"]["text"]
    qa = np.load(png_env["qa_file"], allow_pickle=True)
    assert len(qa) == 4


def test_full_pipeline_png_to_answer(png_env, tmp_path):
    """Raw PNGs -> (tiny untrained) detector -> feature records -> QA eval.

    Uses the GT-text oracle (the reference's --ocr-gt path) so the records
    carry real chart text; the untrained detector supplies visual boxes.
    """
    feat_dim = 64
    detector = MaskRCNN(num_classes=16, with_mask=False, fc_dim=feat_dim,
                        post_nms_topk_test=32, depth=14)
    IMG_SIZE = 256

    @jax.jit
    def detect(params, image):
        out = detector.apply({"params": params}, image, train=False)
        full = jnp.asarray([[0.0, 0.0, IMG_SIZE, IMG_SIZE]])
        img_feat = detector.apply({"params": params}, image, full,
                                  method=MaskRCNN.extract_roi_features)
        return out, img_feat[0]

    dummy = jnp.zeros((IMG_SIZE, IMG_SIZE, 3), jnp.float32)
    variables = jax.jit(lambda r: detector.init(r, dummy, train=False))(
        jax.random.key(0))
    det_params = variables["params"]

    with open(png_env["annotations"]) as f:
        gt_ann = json.load(f)
    _, cls_dict = get_nonvis_ids("plotqa")

    from PIL import Image
    records = []
    for img_path in sorted_image_files(png_env["png_dir"]):
        raw = np.asarray(Image.open(img_path).convert("RGB"), np.float32)
        h, w = raw.shape[:2]
        norm = (raw - PIXEL_MEAN) / PIXEL_STD
        padded = np.zeros((IMG_SIZE, IMG_SIZE, 3), np.float32)
        padded[:h, :w] = norm[:IMG_SIZE, :IMG_SIZE]
        out, img_feat = detect(det_params, jnp.asarray(padded))
        valid = np.asarray(out["valid"])
        feats, classes, boxes = inject_img_token(
            np.asarray(out["features"])[valid],
            np.asarray(out["classes"])[valid],
            np.asarray(out["boxes"])[valid],
            np.asarray(img_feat), (h, w))
        image_id = path_to_img_id(img_path)
        ann = gt_ann[image_id]
        assert ann["image_index"] == image_id
        gt_texts = get_gt_texts(ann, cls_dict, "plotqa")
        rec = build_feature_record(image_id, feats, classes, boxes, (h, w),
                                   dataset="plotqa", gt_texts=gt_texts,
                                   ocr_mode="gt")
        assert rec["vis_feat"] is not None
        records.append(rec)

    # ---- write the QA-stage dataset layout and evaluate -----------------
    feat_root = tmp_path / "fig_features" / "test"
    qa_root = tmp_path / "QA" / "test"
    feat_root.mkdir(parents=True)
    qa_root.mkdir(parents=True)
    np.save(feat_root / "0.npy", np.asarray(records, dtype=object),
            allow_pickle=True)
    qa = np.load(png_env["qa_file"], allow_pickle=True)
    np.save(qa_root / "qa_pairs.npy", qa, allow_pickle=True)

    params = default_params(
        figure_feat_path=str(tmp_path / "fig_features") + "/",
        qa_parent_dir=str(tmp_path / "QA") + "/",
        dataset_config={"dataset_files_divisions": {"test": 4}},
        splits=["train", "val", "test"], eval_set="test",
        save_path=str(tmp_path / "results"), eval_batch_size=64,
    )
    ds = ChartQADataset(params, ["test"], init_split="test")
    ds.get_all_answers = True

    cfg = tiny_model_config(v_feature_size=feat_dim)
    qa_model = CRCTModel(config=cfg, categories=params["categories"])
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                        num_workers=1)
    from crct_tpu.train.eval_loop import _chunk_rows, _flatten_valid_rows
    sample = next(iter(loader))
    rows, _ = _flatten_valid_rows(sample)
    chunked, _ = next(_chunk_rows(rows, 64))
    qa_variables = qa_model.init({"params": jax.random.key(1)}, chunked,
                                 train=False)
    total, breakdown, hist = evaluate(loader, ds, params, qa_model,
                                      qa_variables["params"], csv=False)
    # every question was scored end-to-end from a raw PNG
    assert total[0, 1] == len(qa)
    assert np.isfinite(total).all()
    # regression questions flowed through the y-scale derivation
    assert total[2, 1] > 0


def test_ocr_mode_record_reads_rendered_text(png_env):
    """build_feature_record(ocr_mode='ocr') on a REAL rendered chart: text
    comes only from pixels through the built-in template OCR (reference
    --OCR path, extract_features.py:579-627; no pytesseract in this env),
    boxes/classes from the GT annotation so the check isolates OCR from
    detector quality. The title, tick labels and legend strings must all
    round-trip pixel-exactly (chart text uses the PIL default font the
    template engine renders its glyphs with)."""
    from PIL import Image

    with open(png_env["annotations"]) as f:
        ann = json.load(f)[0]
    _, cls_dict = get_nonvis_ids("plotqa")
    gt = get_gt_texts(ann, cls_dict, "plotqa")
    img_path = sorted_image_files(png_env["png_dir"])[0]
    raw = np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
    h, w = raw.shape[:2]

    gfi = ann["general_figure_info"]

    def rule_box(ax):
        b = gfi[ax]["rule"]["bbox"]
        return [b["x"], b["y"], b["x"] + b["w"], b["y"] + b["h"]]

    with open(png_env["coco"]) as f:
        coco = json.load(f)
    bar_boxes = np.asarray(
        [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2],
          a["bbox"][1] + a["bbox"][3]]
         for a in coco["annotations"]
         if a["image_id"] == 0 and a["category_id"] >= 9], np.float32)
    boxes = np.concatenate([
        np.asarray(gt["bboxes"], np.float32),
        np.asarray([rule_box("x_axis"), rule_box("y_axis")], np.float32),
        bar_boxes])
    classes = np.concatenate([
        np.asarray(gt["class"]),
        [cls_dict["x_axis"], cls_dict["y_axis"]],
        np.full(len(bar_boxes), 9)])  # visual bar class
    rng = np.random.default_rng(0)
    feats = rng.random((len(boxes), 64)).astype(np.float32)
    feats, classes, boxes = inject_img_token(
        feats, classes, boxes, rng.random(64).astype(np.float32), (h, w))

    rec = build_feature_record(0, feats, classes, boxes, (h, w),
                               dataset="plotqa", ocr_mode="ocr", image=raw)
    assert rec["vis_feat"] is not None
    tf = rec["text_feat"]
    # title read from pixels matches the GT string exactly
    assert tf["title"]["text"] == gfi["title"]["text"]
    # every y tick value was read back exactly (numeric strings)
    gt_yticks = gfi["y_axis"]["major_labels"]["values"]
    gt_yticks = set(gt_yticks[: len(gt_yticks) // 2])
    assert {t for t, _ in tf["y_axis"]["ticks"]} == gt_yticks
    # x ticks are category words, read exactly
    gt_xticks = gfi["x_axis"]["major_labels"]["values"]
    gt_xticks = set(gt_xticks[: len(gt_xticks) // 2])
    assert {t for t, _ in tf["x_axis"]["ticks"]} == gt_xticks
    # legend labels (when present) also round-trip
    if "legend" in gfi:
        gt_leg = {i["label"]["text"] for i in gfi["legend"]["items"]}
        assert set(np.asarray(tf["legend"]["label"]).tolist()) == gt_leg


def test_demo_model_forward_on_records(png_env, tmp_path):
    """PlotQAModel (the interactive bot's engine) answers a single question
    over extractor records."""
    # reuse the tiny pipeline from the previous test via its saved artifacts
    pytest.importorskip("PIL")
    # build one record quickly with GT-only text and fake visual features
    with open(png_env["annotations"]) as f:
        gt_ann = json.load(f)
    _, cls_dict = get_nonvis_ids("plotqa")
    gt_texts = get_gt_texts(gt_ann[0], cls_dict, "plotqa")
    rng = np.random.default_rng(0)
    n = 6
    feats = rng.random((n, 64)).astype(np.float32)
    classes = np.concatenate([[1000], rng.integers(8, 30, n - 1)])
    boxes = np.concatenate([[[0, 0, 320, 240]],
                            rng.random((n - 1, 4)) * 200]).astype(np.float32)
    boxes[1:, 2:] = boxes[1:, :2] + 30
    rec = build_feature_record(0, feats, classes, boxes, (240, 320),
                               dataset="plotqa", gt_texts=gt_texts,
                               ocr_mode="gt")
    feat_root = tmp_path / "ff" / "test"
    qa_root = tmp_path / "qa" / "test"
    feat_root.mkdir(parents=True)
    qa_root.mkdir(parents=True)
    np.save(feat_root / "0.npy", np.asarray([rec], dtype=object),
            allow_pickle=True)
    qa_pairs = [{"image_index": 0, "qid": "S1", "type": "vbar",
                 "question_string": "how many bars ?", "answer": 3}]
    np.save(qa_root / "qa_pairs.npy", np.asarray(qa_pairs, dtype=object),
            allow_pickle=True)
    params = default_params(
        figure_feat_path=str(tmp_path / "ff") + "/",
        qa_parent_dir=str(tmp_path / "qa") + "/",
        dataset_config={"dataset_files_divisions": {"test": 4}},
        eval_set="test", eval_batch_size=64, BOT_MODE=True,
        save_path=str(tmp_path / "results"),
    )
    from crct_tpu.cli.demo import PlotQAModel

    class TinyPlotQAModel(PlotQAModel):
        def __init__(self, params, dataset):
            super().__init__(params, dataset)
            from crct_tpu.models.crct import CRCTModel
            from crct_tpu.train.eval_loop import make_eval_step
            self.model = CRCTModel(config=tiny_model_config(v_feature_size=64),
                                   categories=params["categories"])
            self.eval_step = make_eval_step(self.model)

    ds = ChartQADataset(params, "test", init_split="test")
    ds.get_all_answers = True
    bot_model = TinyPlotQAModel(params, ds)
    pred = bot_model.forward(qa_pairs[0])
    assert set(pred) >= {"is_correct", "is_reg", "cls_output", "all_answers"}
    assert len(pred["all_answers"]) > 10   # chart texts + fixed vocab
    # free-form question (BOT mode synthetic qa_pair)
    free = {"question_string": "is this rising ?", "image_index": 0,
            "answer": None, "qid": None, "type": "dot"}
    pred2 = bot_model.forward(free)
    assert "cls_output" in pred2


def test_demo_bot_repl_loop_scripted(png_env, tmp_path, monkeypatch, capsys):
    """Drive PlotQABot.loop with scripted stdin: pick an image, answer a
    listed question, ask a free-form one, probe a bad image id — the REPL
    glue the reference exposes interactively (Interactive_demo.py:63-111)."""
    with open(png_env["annotations"]) as f:
        gt_ann = json.load(f)
    _, cls_dict = get_nonvis_ids("plotqa")
    gt_texts = get_gt_texts(gt_ann[0], cls_dict, "plotqa")
    rng = np.random.default_rng(5)
    n = 6
    feats = rng.random((n, 64)).astype(np.float32)
    classes = np.concatenate([[1000], rng.integers(8, 30, n - 1)])
    boxes = np.concatenate([[[0, 0, 320, 240]],
                            rng.random((n - 1, 4)) * 200]).astype(np.float32)
    boxes[1:, 2:] = boxes[1:, :2] + 30
    rec = build_feature_record(0, feats, classes, boxes, (240, 320),
                               dataset="plotqa", gt_texts=gt_texts,
                               ocr_mode="gt")
    feat_root = tmp_path / "ff" / "test"
    qa_root = tmp_path / "qa" / "test"
    feat_root.mkdir(parents=True)
    qa_root.mkdir(parents=True)
    np.save(feat_root / "0.npy", np.asarray([rec], dtype=object),
            allow_pickle=True)
    qa_pairs = [{"image_index": 0, "qid": "S1", "type": "vbar",
                 "question_string": "how many bars ?", "answer": 3}]
    np.save(qa_root / "qa_pairs.npy", np.asarray(qa_pairs, dtype=object),
            allow_pickle=True)
    params = default_params(
        figure_feat_path=str(tmp_path / "ff") + "/",
        qa_parent_dir=str(tmp_path / "qa") + "/",
        dataset_config={"dataset_files_divisions": {"test": 4}},
        eval_set="test", eval_batch_size=64, BOT_MODE=True,
        save_path=str(tmp_path / "results"),
    )
    from crct_tpu.cli.demo import PlotQABot, PlotQAModel
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.train.eval_loop import make_eval_step

    bot = PlotQABot.__new__(PlotQABot)
    bot.params = params
    bot.dataset = ChartQADataset(params, "test", init_split="test")
    bot.dataset.get_all_answers = True
    bot.model = PlotQAModel(params, bot.dataset)
    bot.model.model = CRCTModel(config=tiny_model_config(v_feature_size=64),
                                categories=params["categories"])
    bot.model.eval_step = make_eval_step(bot.model.model)
    bot.img_to_qas = {}
    for qa in bot.dataset.qa[bot.dataset.split]:
        bot.img_to_qas.setdefault(qa["image_index"], []).append(qa)

    # script: bad image id -> image 0 -> question 1 (GT path) ->
    # free-form question -> run out of input (ends the REPL)
    feed = iter(["99", "0", "1", "is this rising ?"])
    monkeypatch.setattr("builtins.input", lambda *a: next(feed))
    with pytest.raises(StopIteration):
        bot.loop()
    out = capsys.readouterr().out
    assert "Nothing to ask about this image" in out
    assert "<1>: how many bars ?" in out
    assert "<GT>:  3" in out
    assert "<CRCT>" in out
    assert "[Answers probabilities]" in out
