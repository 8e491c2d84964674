"""Golden DATA-SEMANTICS parity for the FigureQA and DVQA families.

Extends tests/test_data_parity.py (PlotQA) to the other two dataset
variants: synthetic records in each family's on-disk schema are fed to
BOTH the reference's ``fig_dataloader.PlotQA_Dataset`` and crct_tpu's
``ChartQADataset``, and every padded tensor of ``__getitem__`` must match
— the binary-answer FigureQA path (single utterance, gt_id = 1-answer,
area vector) and the DVQA path (1-based image ids, values_are_x tick
orientation, the 13-word fixed vocab, numeric-answer regression targets).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_CRCT = "/root/reference/CRCT"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_CRCT),
                                reason="reference checkout not available")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from crct_tpu.config import default_params  # noqa: E402
from crct_tpu.data.dataset import ChartQADataset  # noqa: E402
from crct_tpu.data.tokenizer import WordPieceTokenizer  # noqa: E402
from tests.test_data_parity import (_compare_item, _np,  # noqa: E402
                                    _write_vocab, COMPARE_KEYS)


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Install the pytorch_transformers shim + load the reference modules
    (same mechanics as test_data_parity.envs, without building datasets)."""
    tmp = tmp_path_factory.mktemp("variantparity")
    vocab_file = _write_vocab(str(tmp / "vocab.txt"))

    class ShimBertTokenizer(transformers.BertTokenizer):
        @classmethod
        def from_pretrained(cls, name, **kw):
            return cls(vocab_file=vocab_file, do_lower_case=True)

        def encode(self, text, **kw):
            kw.setdefault("add_special_tokens", False)
            return super().encode(text, **kw)

    pkg = types.ModuleType("pytorch_transformers")
    tb = types.ModuleType("pytorch_transformers.tokenization_bert")
    tb.BertTokenizer = ShimBertTokenizer
    pkg.tokenization_bert = tb
    sys.modules["pytorch_transformers"] = pkg
    sys.modules["pytorch_transformers.tokenization_bert"] = tb

    saved = {n: sys.modules.get(n) for n in ("utils", "fig_dataloader")}
    for name in ("utils", "fig_dataloader"):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_CRCT, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)

    yield str(tmp), vocab_file, sys.modules["fig_dataloader"]

    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod


WORDS = ["red", "blue", "green", "gold", "plum", "teal", "navy", "coral",
         "olive", "ivory"]


def _axes_text_feat(rng, *, with_legend, values_are_x=None):
    n_x, n_y = int(rng.integers(2, 5)), int(rng.integers(2, 5))
    tf = {
        "x_axis": {"label": "", "x": 300.0, "y": 400.0, "w": 500.0, "h": 4.0,
                   "ticks": sorted(
                       [(str(rng.choice(WORDS)), float(rng.random()))
                        for _ in range(n_x)], key=lambda t: t[1])},
        "y_axis": {"label": "", "x": 60.0, "y": 200.0, "w": 4.0, "h": 400.0,
                   "ticks": sorted(
                       [(str(int(v)), float(p)) for v, p in zip(
                           np.arange(n_y) * 10, rng.random(n_y))],
                       key=lambda t: t[1])},
    }
    if values_are_x is not None:
        tf["values_are_x"] = values_are_x
        # numeric ticks live on the value axis for dvqa
        if values_are_x:
            tf["x_axis"], tf["y_axis"] = tf["y_axis"], tf["x_axis"]
    if with_legend:
        k = int(rng.integers(1, 3))
        tf["legend"] = {
            "label": np.array(list(rng.choice(WORDS, size=k, replace=False))),
            "bbox": [[0.8, 0.9 - 0.1 * i, 0.95, 0.85 - 0.1 * i]
                     for i in range(k)],
        }
    return tf


def _record(image_id, rng, *, dataset, feat_dim=48, n_vis=5):
    n = n_vis + 1
    bbox = rng.random((n, 4)).astype(np.float32)
    bbox[:, 2] = bbox[:, 0] + 0.1 + 0.2 * rng.random(n)
    bbox[:, 1] = bbox[:, 3] + 0.3 + 0.4 * rng.random(n)
    bbox[0] = [0, 1, 1, 0]
    cls = np.zeros(n, np.int64)
    cls[0] = 1000
    if dataset == "figure_qa":
        cls[1:] = rng.integers(8, 250, size=n_vis)
        tf = _axes_text_feat(rng, with_legend=True)
    else:
        cls[1:] = rng.integers(4, 62, size=n_vis)
        tf = _axes_text_feat(rng, with_legend=True,
                             values_are_x=bool(image_id % 2))
        tf["title"] = {"text": " ".join(rng.choice(WORDS, size=2)),
                       "bbox": [0.2, 1.1, 0.8, 1.05]}
    return {"image_id": image_id,
            "vis_feat": rng.standard_normal((n, feat_dim)).astype(np.float32),
            "vis_bbox": bbox, "class": cls, "text_feat": tf,
            "width": 640, "height": 480}


def _write_family_dataset(root, *, dataset, n_images, n_questions, seed):
    """Reference-schema on-disk layout: feature shards + qa_pairs.npy."""
    rng = np.random.default_rng(seed)
    offset = 1 if dataset == "dvqa" else 0          # dvqa ids are 1-based
    records = [_record(i + offset, rng, dataset=dataset)
               for i in range(n_images)]
    qa = []
    for q in range(n_questions):
        img = int(rng.integers(0, n_images)) + offset
        if dataset == "figure_qa":
            qa.append({"question_string":
                       f"is {rng.choice(WORDS)} greater than "
                       f"{rng.choice(WORDS)} ?",
                       "answer": int(rng.integers(0, 2)),
                       "image_index": img})
        else:
            kind = int(rng.integers(0, 3))
            tmpl = ["structure", "data", "reasoning"][kind]
            if kind == 2:
                ans = str(float(np.round(rng.random() * 30, 1)))
            else:
                ans = str(rng.choice(["yes", "no", "three", "zero"]))
            qa.append({"question_string":
                       f"what is the value of {rng.choice(WORDS)} ?",
                       "answer": ans, "image_index": img,
                       "template_id": tmpl})
    for split in ("train", "val"):
        feat_dir = os.path.join(root, "fig_features", split)
        qa_dir = os.path.join(root, "QA", split)
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(qa_dir, exist_ok=True)
        np.save(os.path.join(feat_dir, "0.npy"),
                np.asarray(records, dtype=object), allow_pickle=True)
        np.save(os.path.join(qa_dir, "qa_pairs.npy"),
                np.asarray(qa, dtype=object), allow_pickle=True)
    return records, qa


def _family_params(root, vocab_file, *, dataset):
    cfg = {"dataset_files_divisions": {"train": 1000, "val": 1000,
                                       "test": 1000}}
    if dataset == "figure_qa":
        extra = dict(dataset="figure_qa", binary_answers=True,
                     max_seq_len=64, max_vis_features=10, categories=258)
    else:
        extra = dict(dataset="dvqa", binary_answers=False,
                     max_seq_len=124, max_vis_features=30, categories=62)
    params = default_params(
        figure_feat_path=os.path.join(root, "fig_features") + "/",
        qa_parent_dir=os.path.join(root, "QA") + "/",
        qa_file="qa_pairs.npy", dataset_config=cfg,
        splits=["train", "val", "test"], save_path=os.path.join(root, "r"),
        vocab_file=vocab_file, mask_prob=0.0, mask_prob_img=0.0, **extra)
    params.setdefault("question_templates", "")
    params.setdefault("max_previews", 4)
    return params


def _assert_family_parity(ref_env, root, *, dataset, seed, n_images=4,
                          n_questions=8):
    tmp, vocab_file, ref_mod = ref_env
    _write_family_dataset(root, dataset=dataset, n_images=n_images,
                          n_questions=n_questions, seed=seed)
    params = _family_params(root, vocab_file, dataset=dataset)

    mine = ChartQADataset(
        params, ["train", "val"],
        tokenizer=WordPieceTokenizer.from_vocab_file(vocab_file))
    ref = ref_mod.PlotQA_Dataset(dict(params), ["train", "val"])

    mine.split = ref.split = "train"
    mine.get_all_answers = ref.get_all_answers = False
    assert len(mine) == len(ref)
    n = mine.orig_len() if dataset == "dvqa" else len(mine)
    for i in range(n):        # dvqa: positives only (negatives draw RNG)
        _compare_item(mine[i], ref[i], ctx=f"{dataset} train idx {i}")

    mine.split = ref.split = "val"
    mine.get_all_answers = ref.get_all_answers = True
    for i in range(len(ref)):
        m, r = mine[i], ref[i]
        assert int(_np(m["num_ans"]).reshape(-1)[0]) == \
            int(_np(r["num_ans"]).reshape(-1)[0]), (dataset, i)
        assert int(_np(m["gt_id"]).reshape(-1)[0]) == \
            int(_np(r["gt_id"]).reshape(-1)[0]), (dataset, i)
        _compare_item(m, r, ctx=f"{dataset} eval idx {i}")
        for k in ("tolerance_margin", "reg_target", "needs_reg"):
            np.testing.assert_allclose(
                np.asarray(_np(m[k]), np.float64).reshape(-1),
                np.asarray(_np(r[k]), np.float64).reshape(-1),
                atol=1e-5, err_msg=f"{dataset} eval idx {i} key={k}")
    if dataset == "figure_qa":
        # area vector present and equal (pie-less charts -> zeros)
        for i in range(len(ref)):
            np.testing.assert_allclose(_np(mine[i]["area"]),
                                       _np(ref[i]["area"]), atol=1e-6)


@pytest.mark.parametrize("dataset", ["figure_qa", "dvqa"])
def test_variant_items_match_reference(ref_env, tmp_path, dataset):
    _assert_family_parity(ref_env, str(tmp_path / dataset),
                          dataset=dataset, seed=3)


@pytest.mark.parametrize("seed", [11, 23, 37])
@pytest.mark.parametrize("dataset", ["figure_qa", "dvqa"])
def test_variant_multi_seed_differential_fuzz(ref_env, tmp_path, dataset,
                                              seed):
    """Differential fuzz for the FigureQA/DVQA families (the PlotQA
    analogue lives in test_data_parity): fresh randomized datasets per
    seed — tick counts/texts/positions, legend sizes, values_are_x
    orientation, answer kinds — must encode byte-identically through both
    dataloaders on the train-positive and all-candidate eval paths."""
    _assert_family_parity(ref_env, str(tmp_path / f"{dataset}{seed}"),
                          dataset=dataset, seed=seed, n_images=3,
                          n_questions=6)


def _figqa_color_record(image_id, feat_dim=48):
    """A FigureQA record with legend + preview boxes whose classes map
    through CID_TO_COLOR (geometry from tests/test_variants.py, which the
    reference's get_previews area gate accepts)."""
    n = 5
    bbox = np.zeros((n, 4), np.float32)
    bbox[0] = [0, 1, 1, 0]
    bbox[1] = [0.80, 0.85, 0.84, 0.80]
    bbox[2] = [0.80, 0.75, 0.84, 0.70]
    bbox[3] = [0.1, 0.5, 0.3, 0.0]
    bbox[4] = [0.4, 0.8, 0.6, 0.0]
    cls = np.array([1000, 90, 27, 90, 27])
    tf = {
        "x_axis": {"label": "", "ticks": [("0", 0.2), ("50", 0.6)],
                   "x": 0.5, "y": 400.0, "w": 500.0, "h": 4.0},
        "y_axis": {"label": "", "ticks": [("0", 0.1), ("1", 0.9)],
                   "x": 60.0, "y": 0.5, "w": 4.0, "h": 400.0},
        "legend": {"label": np.array(["old_name_a", "old_name_b"]),
                   "bbox": [[0.86, 0.85, 0.99, 0.80],
                            [0.86, 0.75, 0.99, 0.70]]},
    }
    return {"image_id": image_id,
            "vis_feat": np.random.default_rng(image_id).random(
                (n, feat_dim)).astype(np.float32),
            "vis_bbox": bbox, "class": cls, "text_feat": tf,
            "width": 640, "height": 480}


def test_figureqa_test_split_color_replacement_matches(ref_env, tmp_path):
    """FigureQA 'test' split: the reference rewrites legend labels / tick
    texts to detected color names and rebuilds the question from the
    template (Color_Mapping.feature_replace, fig_dataloader.py:868-901);
    the encoded items must still match ours byte-for-byte."""
    tmp, vocab_file, ref_mod = ref_env
    root = str(tmp_path / "fqtest")
    records = [_figqa_color_record(i) for i in range(2)]
    qa = [{"question_id": 0, "color1_name": "old_name_a",
           "color2_name": "old_name_b", "answer": i % 2,
           "image_index": i % 2} for i in range(4)]
    for split in ("train", "test"):
        feat_dir = os.path.join(root, "fig_features", split)
        qa_dir = os.path.join(root, "QA", split)
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(qa_dir, exist_ok=True)
        np.save(os.path.join(feat_dir, "0.npy"),
                np.asarray(records, dtype=object), allow_pickle=True)
        np.save(os.path.join(qa_dir, "qa_pairs.npy"),
                np.asarray(qa, dtype=object), allow_pickle=True)
    params = _family_params(root, vocab_file, dataset="figure_qa")
    params["question_templates"] = {"1": "is $_c1_$ greater than $_c2_$ ?"}
    params["eval_set"] = "test"

    mine = ChartQADataset(
        params, ["test"], init_split="test",
        tokenizer=WordPieceTokenizer.from_vocab_file(vocab_file))
    ref = ref_mod.PlotQA_Dataset(dict(params), ["test"], init_split="test")
    mine.split = ref.split = "test"
    for i in range(len(ref)):
        _compare_item(mine[i], ref[i], ctx=f"figqa test idx {i}")
