"""Opt-in fast candidate scorer: one backbone pass per question.

Covers: fast-row derivation from the standard eval batch, head training
(listwise CE decreases with a frozen backbone), the fast evaluate() path
end-to-end on synthetic data, and the measured accuracy delta vs the full
x120 protocol (reported, not asserted — the head is trained for seconds on
random synthetic data; the assertion is that both protocols run and count
every question)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.models.crct import CRCTModel
from crct_tpu.train.eval_loop import build_fast_rows, evaluate
from crct_tpu.train.fast_scorer_train import train_fast_scorer
from tests.helpers import synthetic_params, tiny_model_config


@pytest.fixture(scope="module")
def fast_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fastdata")
    params = synthetic_params(tmp, n_images=4, division=4, n_questions=3,
                              feat_dim=32, eval_batch_size=16)
    params["fast_scorer"] = True
    ds = ChartQADataset(params, ["train", "val"])
    ds.split = "val"
    ds.get_all_answers = True
    cfg = tiny_model_config(v_feature_size=32)
    model = CRCTModel(config=cfg, categories=params["categories"],
                      fast_scorer=True)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    sample = next(iter(loader))
    rows = {k: jnp.asarray(v) for k, v in build_fast_rows(sample).items()}
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, rows)
    ds.get_all_answers = False
    return params, ds, model, variables["params"]


def test_build_fast_rows_shapes_and_masking(fast_env):
    params, ds, model, mp = fast_env
    ds.split = "val"
    ds.get_all_answers = True
    batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False,
                                 drop_last=False, num_workers=1)))
    rows = build_fast_rows(batch)
    B = len(np.asarray(batch["id"]).reshape(-1))
    P = np.asarray(batch["tokens"]).shape[1]
    assert rows["tokens"].shape == (B, params["max_seq_len"])
    assert rows["cand_tokens"].shape == (B, P, 8)
    assert rows["cand_valid"].shape == (B, P)
    assert rows["cand_valid"].sum(-1).tolist() == \
        np.asarray(batch["num_ans"]).reshape(-1).tolist()
    # answer tokens excluded from the question encoding's attention
    segs = np.asarray(batch["segments"])[:, 0]
    ans = segs == 1
    assert not (rows["attention_mask"].astype(bool) & ans).any()
    # every valid candidate with answer tokens got non-zero cand tokens
    num_ans = np.asarray(batch["num_ans"]).reshape(-1)
    for q in range(B):
        segq = np.asarray(batch["segments"])[q]
        for c in range(int(num_ans[q])):
            n_tok = int((segq[c] == 1).sum())
            got = int((rows["cand_tokens"][q, c] > 0).sum())
            assert got == min(n_tok, 8)
    ds.get_all_answers = False


def test_head_training_reduces_ce(fast_env):
    params, ds, model, mp = fast_env
    merged, last_ce = train_fast_scorer(
        dict(params), ds, model, mp, steps=25, lr=3e-3, batch_questions=4,
        log_print=lambda m: None)
    assert "fast_scorer" in merged
    # frozen backbone unchanged
    assert np.allclose(np.asarray(jax.tree.leaves(merged["bert"])[0]),
                       np.asarray(jax.tree.leaves(mp["bert"])[0]))
    # CE moved below the uniform-over-candidates baseline
    ds.split = "val"
    ds.get_all_answers = True
    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False,
                                 drop_last=False, num_workers=1)))
    uniform = float(np.mean(np.log(
        np.asarray(batch["num_ans"]).reshape(-1).astype(float))))
    assert last_ce is not None and last_ce < uniform
    ds.get_all_answers = False


def test_fast_eval_end_to_end_and_delta(fast_env, capsys):
    params, ds, model, mp = fast_env
    merged, _ = train_fast_scorer(
        dict(params), ds, model, mp, steps=15, lr=3e-3, batch_questions=4,
        log_print=lambda m: None)
    ds.split = "val"
    ds.get_all_answers = True
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    fast_total, _, _ = evaluate(loader, ds, dict(params), model, merged,
                                csv=False, log_print=lambda m: None)
    slow_params = dict(params)
    slow_params["fast_scorer"] = False
    slow_total, _, _ = evaluate(loader, ds, slow_params, model, merged,
                                csv=False, log_print=lambda m: None)
    # both protocols scored every question
    assert fast_total[0, 1] == slow_total[0, 1] == len(ds)
    assert np.isfinite(fast_total).all()
    acc_fast = fast_total[4, 0] / fast_total[4, 1]
    acc_slow = slow_total[4, 0] / slow_total[4, 1]
    print(f"[fast-scorer] total acc fast={acc_fast:.3f} "
          f"full-protocol={acc_slow:.3f} (delta {acc_fast - acc_slow:+.3f})")
    ds.get_all_answers = False


def test_topk_rescore_matches_full_protocol_when_k_covers(fast_env):
    """-fast_scorer_topk: with K >= every candidate count the shortlist
    always contains the true answer, so rescoring must reproduce the FULL
    reference protocol's accuracy tables exactly."""
    params, ds, model, mp = fast_env
    merged, _ = train_fast_scorer(
        dict(params), ds, model, mp, steps=10, lr=3e-3, batch_questions=4,
        log_print=lambda m: None)
    ds.split = "val"
    ds.get_all_answers = True
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    P = np.asarray(next(iter(loader))["tokens"]).shape[1]
    topk_params = dict(params, fast_scorer_topk=P)   # K covers all cands
    topk_total, topk_breakdown, _ = evaluate(
        loader, ds, topk_params, model, merged, csv=False,
        log_print=lambda m: None)
    slow_params = dict(params, fast_scorer=False)
    slow_total, slow_breakdown, _ = evaluate(
        loader, ds, slow_params, model, merged, csv=False,
        log_print=lambda m: None)
    np.testing.assert_array_equal(topk_total, slow_total)
    np.testing.assert_array_equal(topk_breakdown, slow_breakdown)
    ds.get_all_answers = False


def test_topk_rescore_small_k_recall_and_accuracy(fast_env, capsys):
    """Small-K rescore: shortlist recall bounds the end accuracy; report
    both (synthetic head => numbers are illustrative, the assertions are
    structural: every question counted, accuracy <= full protocol only by
    shortlist misses)."""
    from crct_tpu.train.eval_loop import build_fast_rows, _cached_eval_step
    params, ds, model, mp = fast_env
    merged, _ = train_fast_scorer(
        dict(params), ds, model, mp, steps=10, lr=3e-3, batch_questions=4,
        log_print=lambda m: None)
    ds.split = "val"
    ds.get_all_answers = True
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    K = 3
    # measure shortlist recall directly from the fast head
    import jax as _jax
    step = _cached_eval_step(model, "fast")
    hits = total = 0
    for batch in loader:
        rows = {k: np.asarray(v) for k, v in build_fast_rows(batch).items()}
        logits = np.asarray(step(merged, rows)[0])
        top = np.argsort(-logits, axis=1, kind="stable")[:, :K]
        gt = np.asarray(batch["gt_id"]).reshape(-1)
        hits += int((top == gt[:, None]).any(1).sum())
        total += len(gt)
    recall = hits / total

    topk_params = dict(params, fast_scorer_topk=K)
    topk_total, _, _ = evaluate(loader, ds, topk_params, model, merged,
                                csv=False, log_print=lambda m: None)
    assert topk_total[0, 1] == len(ds)
    nsp_acc = topk_total[0, 0] / topk_total[0, 1]
    # classification can only be right when the GT made the shortlist
    assert nsp_acc <= recall + 1e-9
    print(f"[fast-scorer topk={K}] shortlist recall={recall:.3f} "
          f"nsp acc={nsp_acc:.3f}")
    ds.get_all_answers = False


def test_fast_modes_emit_prediction_records(fast_env):
    """on_predictions works in the fast-only and topk-rescore modes too:
    one record per question, confidence from the head softmax (fast) or
    the rescored NSP probability (topk)."""
    params, ds, model, mp = fast_env
    merged, _ = train_fast_scorer(
        dict(params), ds, model, mp, steps=5, lr=3e-3, batch_questions=4,
        log_print=lambda m: None)
    ds.split = "val"
    ds.get_all_answers = True
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    for extra in ({}, {"fast_scorer_topk": 4}):
        got = []
        evaluate(loader, ds, dict(params, **extra), model, merged,
                 csv=False, log_print=lambda m: None,
                 on_predictions=got.extend)
        assert len(got) == len(ds), extra
        for r in got:
            opts = [str(o) for o in ds.get_possible_answers(r["image_index"])]
            assert r["cls_output"] in opts, extra
            assert r["confidence"] is None or 0 <= r["confidence"] <= 1
    ds.get_all_answers = False


def test_bf16_transfer_precast_is_bit_identical(tmp_path):
    """For a bfloat16 model, pre-casting image_feat to bf16 on the HOST
    before the transfer (eval_bf16_transfer, default on) must be
    bit-identical to shipping f32 and casting on device — the model's
    first touch of image_feat is `image_feat.astype(self.dtype)`
    (vilbert.py::ImageEmbeddings), the exact same RTNE cast. Covers the
    fast-only, topk-rescore and full-protocol paths."""
    import functools

    params = synthetic_params(tmp_path, n_images=4, division=4,
                              n_questions=3, feat_dim=32,
                              eval_batch_size=16)
    params["fast_scorer"] = True
    ds = ChartQADataset(params, ["val"], init_split="val")
    ds.get_all_answers = True
    cfg = tiny_model_config(v_feature_size=32, dtype="bfloat16")
    model = CRCTModel(config=cfg, categories=params["categories"],
                      fast_scorer=True)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    sample = next(iter(loader))
    rows = {k: jnp.asarray(v) for k, v in build_fast_rows(sample).items()}
    mp = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, rows)["params"]
    for extra in ({}, {"fast_scorer_topk": 4},
                  {"fast_scorer": False, "fast_scorer_topk": 0}):
        on = evaluate(loader, ds, dict(params, **extra), model, mp,
                      csv=False, log_print=lambda m: None)
        off = evaluate(loader, ds,
                       dict(params, eval_bf16_transfer=False, **extra),
                       model, mp, csv=False, log_print=lambda m: None)
        np.testing.assert_array_equal(on[0], off[0], err_msg=str(extra))
        np.testing.assert_array_equal(on[1], off[1], err_msg=str(extra))
