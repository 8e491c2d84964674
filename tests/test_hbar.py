"""hbar -> vbar reduction semantics (reference fig_dataloader.py:500-535)."""

import numpy as np
import pytest

from crct_tpu.config import default_params
from crct_tpu.data.example_builder import ExampleBuilder
from crct_tpu.data.tokenizer import WordPieceTokenizer


def _bar_fig(horizontal: bool):
    """A chart whose non-IMG elements are mostly bars; wide boxes => hbar."""
    n = 5
    cls = np.array([1000, 10, 11, 12, 3])     # 3 bars (plotqa range 8..80)
    bbox = np.zeros((n, 4), np.float32)
    bbox[0] = [0, 1, 1, 0]
    for i in range(1, 4):
        if horizontal:                        # wide, short boxes
            bbox[i] = [0.0, 0.1 * i + 0.08, 0.7, 0.1 * i]
        else:                                 # tall, thin boxes
            bbox[i] = [0.1 * i, 0.8, 0.1 * i + 0.08, 0.0]
    bbox[4] = [0.9, 0.2, 0.95, 0.1]
    text_feat = {
        "title": {"text": "a title", "bbox": [0.3, 1.1, 0.7, 1.15]},
        "x_axis": {"label": "xlab", "ticks": [("one", 0.25), ("two", 0.75)],
                   "x": 0.5, "y": 0.0, "w": 1.0, "h": 0.02},
        "y_axis": {"label": "ylab", "ticks": [("0", 0.1), ("50", 0.9)],
                   "x": 0.0, "y": 0.5, "w": 0.02, "h": 1.0},
    }
    return {"image_id": 0, "vis_feat": np.ones((n, 16), np.float32),
            "vis_bbox": bbox, "class": cls, "text_feat": text_feat,
            "width": 640, "height": 480}


@pytest.fixture
def builder():
    params = default_params(max_seq_len=124, max_vis_features=10,
                            categories=228)
    return ExampleBuilder(params, WordPieceTokenizer.synthetic()), params


def test_is_hbar_detection(builder):
    b, _ = builder
    assert b.is_hbar(_bar_fig(horizontal=True))
    assert not b.is_hbar(_bar_fig(horizontal=False))


def test_is_hbar_needs_bar_majority(builder):
    b, _ = builder
    fig = _bar_fig(horizontal=True)
    fig["class"] = np.array([1000, 3, 3, 3, 3])   # no bars at all
    assert not b.is_hbar(fig)


def test_hbar_axes_swapped_in_caption(builder):
    """For an hbar chart the value axis (y in the transposed frame) carries
    the numeric ticks, and the axis-label loc encoding flips."""
    b, params = builder
    fig = _bar_fig(horizontal=True)
    qa = {"question_string": "what is the value of one ?", "answer": 30.0,
          "qid": "D7", "type": "hbar", "image_index": 0}
    item = b.build(fig, qa, split="train", rng=np.random.default_rng(0))
    assert item["needs_reg"][0]
    # after the swap, ticks_values['y_axis'] = original x-axis... the numeric
    # ticks ("0", "50") sat on the original y axis, which becomes the new x
    # axis; regression y-scale must come from the ORIGINAL x ticks -> none
    # numeric there, so R[3] falls back over the swapped axes.
    assert item["R"][1] == 1


def test_hbar_bbox_transpose_flag(builder):
    b, params = builder
    fig = _bar_fig(horizontal=True)
    import copy
    f1 = copy.deepcopy(fig)
    b.apply_hbar_transpose(f1, transpose_bbox=False)
    # axes metadata swapped
    assert f1["text_feat"]["x_axis"]["label"] == "ylab"
    assert f1["text_feat"]["x_axis"]["w"] == fig["text_feat"]["y_axis"]["h"]
    # boxes untouched without the flag
    np.testing.assert_array_equal(f1["vis_bbox"], fig["vis_bbox"])
    f2 = copy.deepcopy(fig)
    b.apply_hbar_transpose(f2, transpose_bbox=True)
    np.testing.assert_array_equal(f2["vis_bbox"],
                                  fig["vis_bbox"][:, [3, 2, 1, 0]])


def test_get_possible_answers_uses_transposed_axes(builder):
    b, params = builder
    fig = _bar_fig(horizontal=True)
    answers = b.get_possible_answers(fig)
    # numeric ticks "0"/"50" were on y; after the swap they are x ticks and
    # become candidate answers
    assert "0" in answers and "50" in answers
    assert "=" in answers


def test_cut_batch_padding_parity(tmp_path):
    from crct_tpu.data.dataset import ChartQADataset, DataLoader
    from tests.helpers import synthetic_params
    params = synthetic_params(tmp_path, n_images=4, division=4,
                              n_questions=2)
    ds = ChartQADataset(params, ["val"], init_split="val")
    ds.get_all_answers = True
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    batch = next(iter(loader))
    n_total = int(np.sum(batch["num_ans"]))
    ds.cut_batch_padding(batch)
    assert batch["tokens"].shape[0] == n_total
    assert batch["image_feat"].shape[0] == n_total


def test_build_does_not_mutate_cached_record(builder):
    """build() must leave the (shard-cached, shared-across-samples) record
    untouched — the copy-on-write replacement for deepcopy relies on every
    in-place mutation site being covered. Repeated builds of an hbar chart
    (the mutating path: axis swap + bbox transpose) must be identical."""
    import copy
    b, params = builder
    fig = _bar_fig(horizontal=True)
    snapshot = copy.deepcopy(fig)
    qa = {"image_index": 0, "question_string": "What is one?",
          "answer": "two", "qid": "D0", "type": "vbar"}
    rng = np.random.default_rng(0)
    first = b.build(fig, qa, split="train", rng=np.random.default_rng(1))
    for _ in range(3):
        again = b.build(fig, qa, split="train", rng=np.random.default_rng(1))
        np.testing.assert_array_equal(first["tokens"], again["tokens"])
        np.testing.assert_array_equal(first["loc"], again["loc"])
        np.testing.assert_array_equal(first["image_loc"], again["image_loc"])
    # the record itself is bit-identical to before any build
    np.testing.assert_array_equal(fig["vis_bbox"], snapshot["vis_bbox"])
    np.testing.assert_array_equal(fig["vis_feat"], snapshot["vis_feat"])
    assert fig["text_feat"] == snapshot["text_feat"]
