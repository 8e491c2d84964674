"""FigureQA / DVQA variant tests: binary answers, CE regressor, areas,
color mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.config import DVQA_FLOATS, default_params
from crct_tpu.data.example_builder import ExampleBuilder
from crct_tpu.data.figureqa import CID_TO_COLOR, ColorMapping
from crct_tpu.data.tokenizer import WordPieceTokenizer
from crct_tpu.models.crct import CRCTModel
from tests.helpers import tiny_model_config
from tests.test_model import make_batch


def _figqa_fig_feat():
    """A FigureQA-style record: no title, legend labels, preview boxes."""
    n = 5
    bbox = np.zeros((n, 4), np.float32)
    bbox[0] = [0, 1, 1, 0]
    # preview boxes near the legend labels (area in 350..455 after denorm)
    bbox[1] = [0.80, 0.85, 0.84, 0.80]
    bbox[2] = [0.80, 0.75, 0.84, 0.70]
    bbox[3] = [0.1, 0.5, 0.3, 0.0]
    bbox[4] = [0.4, 0.8, 0.6, 0.0]
    cls = np.array([1000, 90, 27, 90, 27])   # Red, Blue
    text_feat = {
        "x_axis": {"label": "", "ticks": [("0", 0.2), ("50", 0.6)],
                   "x": 0.5, "y": 400.0, "w": 500.0, "h": 4.0},
        "y_axis": {"label": "", "ticks": [("0", 0.1), ("1", 0.9)],
                   "x": 60.0, "y": 0.5, "w": 4.0, "h": 400.0},
        "legend": {"label": np.array(["old_name_a", "old_name_b"]),
                   "bbox": [[0.86, 0.85, 0.99, 0.80],
                            [0.86, 0.75, 0.99, 0.70]]},
    }
    return {"image_id": 0, "vis_feat": np.random.default_rng(0).random(
        (n, 32)).astype(np.float32), "vis_bbox": bbox, "class": cls,
        "text_feat": text_feat, "width": 640, "height": 480}


def test_color_mapping_legend_replacement():
    fig = _figqa_fig_feat()
    cm = ColorMapping()
    previews = cm.get_previews(fig)
    assert previews[1] and previews[2]
    mapping = cm.get_nearest_mapping(fig)
    assert mapping is not None and len(mapping) == 2
    assert set(mapping.values()) <= set(CID_TO_COLOR.values())
    params = {"question_templates": {"1": "Is $_c1_$ greater than $_c2_$?"}}
    qa = {"color1_name": "old_name_a", "color2_name": "old_name_b",
          "question_id": 0}
    cm.feature_replace(params, qa, fig)
    assert "$_c1_$" not in qa["question_string"]
    assert "old_name_a" not in qa["question_string"]
    assert list(fig["text_feat"]["legend"]["label"]) == \
        [mapping["old_name_a"], mapping["old_name_b"]]


def test_figureqa_binary_example():
    params = default_params(dataset="figure_qa", binary_answers=True,
                            max_seq_len=64, max_vis_features=10,
                            categories=258)
    builder = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    fig = _figqa_fig_feat()
    qa = {"question_string": "is red greater than blue ?", "answer": 1,
          "image_index": 0}
    item = builder.build(fig, qa, split="train",
                         rng=np.random.default_rng(0))
    # single utterance, the answer is the binary label
    assert item["tokens"].shape == (64,)
    assert item["next_sentence_labels"][0] == 1
    assert item["gt_id"][0] == 0          # 1 - answer
    assert item["num_ans"][0] == 2        # Yes / No
    assert "area" in item and item["area"].shape == (10,)
    assert not item["needs_reg"][0]


def test_binary_model_has_no_regressor():
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10, binary_answers=True)
    batch = make_batch(np.random.default_rng(0))
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    assert "regressor" not in variables["params"]
    out = model.apply(variables, batch, train=False)
    assert np.all(np.asarray(out.reg_output) == 0)


def test_dvqa_ce_regressor_path():
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10, dataset="dvqa", ce_reg=True)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    # R[:, 0] holds the dvqa_floats INDEX for CE mode
    R = np.zeros((4, 4), np.float32)
    R[:2, 0] = [DVQA_FLOATS.index(5.0), DVQA_FLOATS.index(100.0)]
    R[:2, 1] = 1
    batch["R"] = jnp.asarray(R)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=True,
                      rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(float(out.loss))
    # predicted values come from the legal float table
    pred = np.asarray(out.reg_output)[np.asarray(out.needs_reg)]
    assert all(p in DVQA_FLOATS for p in pred.tolist())


def test_dvqa_inference_clips_to_legal_floats():
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10, dataset="dvqa", ce_reg=False)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    R = np.zeros((4, 4), np.float32)
    R[:2] = [[5.0, 1, 0.01, 10.0], [100.0, 1, 0.01, 1000.0]]
    batch["R"] = jnp.asarray(R)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    pred = np.asarray(out.reg_output)[np.asarray(out.needs_reg)]
    for p in pred.tolist():
        assert any(abs(p - f) < 1e-4 for f in DVQA_FLOATS), p


def test_dvqa_example_builder_fixed_vocab():
    params = default_params(dataset="dvqa", max_seq_len=124,
                            max_vis_features=30, categories=62, CE_REG=True)
    builder = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    assert builder.fixed_vocab[-1] == "="
    assert "zero" in builder.fixed_vocab
    assert builder.get_ans_type("yes") == 0
    assert builder.get_ans_type("three") == 1
    assert builder.get_ans_type("42.5") == 2


def test_figureqa_image_embeddings_drop_roi_features():
    """figure_qa/dvqa vision embeddings use loc+class only (vilbert.py:1480-84)."""
    from crct_tpu.models.vilbert import ImageEmbeddings
    cfg = tiny_model_config()
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.random((2, 6, 32)), jnp.float32)
    loc = jnp.asarray(rng.random((2, 6, 4)), jnp.float32)
    cls = jnp.asarray(rng.integers(0, 10, (2, 6)), jnp.int32)
    emb_fq = ImageEmbeddings(cfg, categories=10, dataset="figure_qa")
    p = emb_fq.init(jax.random.key(0), feats, loc, cls)
    out1 = emb_fq.apply(p, feats, loc, cls)
    out2 = emb_fq.apply(p, feats * 100, loc, cls)   # features must not matter
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    emb_pq = ImageEmbeddings(cfg, categories=10, dataset="plotqa")
    p = emb_pq.init(jax.random.key(0), feats, loc, cls)
    out3 = emb_pq.apply(p, feats, loc, cls)
    out4 = emb_pq.apply(p, feats * 100, loc, cls)   # features DO matter
    assert np.abs(np.asarray(out3) - np.asarray(out4)).max() > 1e-3


def test_figureqa_areas_embedding_used():
    from crct_tpu.models.vilbert import ImageEmbeddings
    cfg = tiny_model_config()
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.random((1, 4, 32)), jnp.float32)
    loc = jnp.asarray(rng.random((1, 4, 4)), jnp.float32)
    cls = jnp.asarray(rng.integers(0, 10, (1, 4)), jnp.int32)
    areas = jnp.asarray(rng.random((1, 4)), jnp.float32)
    emb = ImageEmbeddings(cfg, categories=10, dataset="figure_qa")
    p = emb.init(jax.random.key(0), feats, loc, cls, areas)
    out1 = emb.apply(p, feats, loc, cls, areas)
    out2 = emb.apply(p, feats, loc, cls, areas * 2)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_color_mapping_cow_leaves_record_unchanged():
    """The dataset applies feature_replace to a copy-on-write view of the
    shard-cached record (dataset.py __getitem__); the original must stay
    bit-identical so later samples of the same chart see clean text."""
    import copy

    from crct_tpu.data.example_builder import ExampleBuilder

    fig = _figqa_fig_feat()
    snapshot = copy.deepcopy(fig)
    params = {"question_templates": {"1": "Is $_c1_$ greater than $_c2_$?"}}
    qa = {"color1_name": "old_name_a", "color2_name": "old_name_b",
          "question_id": 0}
    view = ExampleBuilder._cow_fig_feat(fig)
    ColorMapping().feature_replace(params, dict(qa), view)
    assert list(view["text_feat"]["legend"]["label"]) != \
        list(fig["text_feat"]["legend"]["label"])
    np.testing.assert_array_equal(fig["text_feat"]["legend"]["label"],
                                  snapshot["text_feat"]["legend"]["label"])
    for ax in ("x_axis", "y_axis"):
        assert fig["text_feat"][ax]["ticks"] == \
            snapshot["text_feat"][ax]["ticks"]
