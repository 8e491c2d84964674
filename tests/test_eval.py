"""Evaluation-engine tests: candidate ranking, accumulators, resume."""

import jax
import numpy as np
import pytest

from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.models.crct import CRCTModel
from crct_tpu.train.eval_loop import (EvaluationLog, evaluate,
                                      get_prev_done_ids, get_qcat_by_qid,
                                      print_acc_table, print_breakdown_table,
                                      reduce_histogram, reduce_total_acc,
                                      _flatten_valid_rows, _chunk_rows)
from tests.helpers import synthetic_params, tiny_model_config


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evaldata")
    params = synthetic_params(tmp, n_images=4, division=4, n_questions=3,
                              feat_dim=32, eval_batch_size=64)
    ds = ChartQADataset(params, ["val"], init_split="val")
    ds.get_all_answers = True
    cfg = tiny_model_config(v_feature_size=32)
    model = CRCTModel(config=cfg, categories=params["categories"])
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    sample = next(iter(loader))
    rows, _ = _flatten_valid_rows(sample)
    chunked, _ = next(_chunk_rows(rows, 64))
    from crct_tpu.train.train_loop import device_batch
    variables = model.init({"params": jax.random.key(0)},
                           device_batch(chunked), train=False)
    return params, ds, model, variables["params"], loader


def test_qcat_mapping():
    assert get_qcat_by_qid("S7") == ("s", 0)
    assert get_qcat_by_qid("D14") == ("d", 1)
    assert get_qcat_by_qid("A1") == ("r", 2)


def test_flatten_valid_rows_shapes(eval_env):
    params, ds, model, mp, loader = eval_env
    batch = next(iter(loader))
    rows, offsets = _flatten_valid_rows(batch)
    n_total = int(np.sum(batch["num_ans"]))
    assert offsets[-1] == n_total
    assert rows["tokens"].shape == (n_total, params["max_seq_len"])
    assert rows["R"].shape == (n_total, 4)
    # candidate rows for one question share the image features
    q0 = slice(0, int(batch["num_ans"][0, 0]))
    assert np.allclose(rows["image_feat"][q0][0], rows["image_feat"][q0][-1])


def test_reduce_total_acc_columns():
    total = np.zeros((6, 2))
    needs = np.array([True, False, True, False])
    nsp_right = np.array([True, True, False, False])
    reg_right = np.array([True, False, False, False])
    reg_t = np.array([True, False, False, False])
    reduce_total_acc(total, needs, nsp_right, reg_right, reg_t)
    assert total[0].tolist() == [2, 4]      # nsp
    assert total[1].tolist() == [1, 2]      # reg_cls
    assert total[2].tolist() == [1, 2]      # reg acc
    assert total[4].tolist() == [2, 4]      # total: q0 (reg ok) + q1 (no reg)


def test_reduce_histogram_bins():
    hist = np.zeros(13, np.int64)
    reduce_histogram(hist, np.array([0.01, 0.07, 0.3, 2.0]))
    assert hist[0] == 1 and hist[1] == 1 and hist[4] == 1 and hist[12] == 1
    assert hist.sum() == 4


def test_evaluate_end_to_end(eval_env, capsys):
    params, ds, model, mp, loader = eval_env
    total, breakdown, hist = evaluate(loader, ds, params, model, mp,
                                      csv=True, progress=False)
    n_questions = len(ds)
    assert total[0, 1] == n_questions
    assert total[4, 1] == n_questions
    assert 0 <= total[4, 0] <= total[0, 0]
    # breakdown 'Total' row counts every question once
    assert np.sum(breakdown[0, :3, :, -1]) == n_questions
    print_acc_table(print, total)
    print_breakdown_table(params, print, breakdown)
    out = capsys.readouterr().out
    assert "Total Accuracy" in out and "Reasoning" in out


def test_evaluate_resume_from_csv(eval_env):
    params, ds, model, mp, loader = eval_env
    done = get_prev_done_ids(params)
    assert done is not None and len(done) == len(ds)
    remaining = np.array(sorted(set(range(len(ds))) - set(done.tolist())))
    assert len(remaining) == 0


def test_chunking_pads_last_chunk(eval_env):
    params, ds, model, mp, loader = eval_env
    batch = next(iter(loader))
    rows, _ = _flatten_valid_rows(batch)
    n = rows["tokens"].shape[0]
    chunks = list(_chunk_rows(rows, 32))
    assert sum(v for _, v in chunks) == n
    for piece, valid in chunks:
        assert piece["tokens"].shape[0] == 32


def test_histogram_png_written(eval_env, tmp_path):
    import numpy as np
    from crct_tpu.train.eval_loop import make_histogram_png
    params = dict(eval_env[0])
    params["save_path"] = str(tmp_path)
    hist = np.arange(13)
    out = make_histogram_png(params, hist)
    if out is not None:  # matplotlib present
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 0


def test_segmented_argmax_matches_loop():
    from crct_tpu.train.eval_loop import segmented_argmax
    g = np.random.default_rng(3)
    num_ans = g.integers(1, 9, 40)
    offsets = np.concatenate([[0], np.cumsum(num_ans)])
    vals = np.round(g.random(int(offsets[-1])), 1)  # duplicates force ties
    got = segmented_argmax(vals, offsets)
    want = np.asarray([int(np.argmax(vals[offsets[q]:offsets[q + 1]]))
                       for q in range(len(num_ans))])
    np.testing.assert_array_equal(got, want)


def test_reduce_breakdown_matches_loop_reference():
    """Vectorized scatter-add == the reference's per-question double loop
    (evaluation.py:465-491)."""
    from crct_tpu.train.eval_loop import (FIG_TABLE_IDS, get_qcat_by_qid,
                                          reduce_breakdown)
    g = np.random.default_rng(5)
    n = 64
    qa_types = list(FIG_TABLE_IDS)
    batch = {
        "id": np.arange(n),
        "qid": [g.choice(["S7", "D15", "R1", "Z9"]) for _ in range(n)],
        "qa_type": [qa_types[int(g.integers(0, len(qa_types)))] for _ in range(n)],
    }

    class DS:
        def get_ans_type(self, i):
            return int(i) % 3

    correct = g.integers(0, 2, n).astype(bool)
    t_correct = correct | (g.integers(0, 2, n).astype(bool))
    needs_reg = g.integers(0, 2, n).astype(bool)

    want = np.zeros((5, 4, 3, 3), np.float64)
    ds = DS()
    for i in range(n):
        ans_type = ds.get_ans_type(int(batch["id"][i]))
        _, qcat = get_qcat_by_qid(batch["qid"][i])
        for fig_id in {0, FIG_TABLE_IDS[batch["qa_type"][i]]}:
            want[fig_id, ans_type, qcat, 0] += bool(correct[i])
            want[fig_id, ans_type, qcat, 1] += bool(t_correct[i])
            want[fig_id, ans_type, qcat, -1] += 1
            if needs_reg[i]:
                want[fig_id, -1, qcat, 0] += bool(correct[i])
                want[fig_id, -1, qcat, 1] += bool(t_correct[i])
                want[fig_id, -1, qcat, -1] += 1

    got = reduce_breakdown(np.zeros((5, 4, 3, 3), np.float64), ds, batch,
                           correct, t_correct, needs_reg)
    np.testing.assert_array_equal(got, want)


def test_segmented_argmax_empty_segment():
    """Empty segments (num_ans == 0) return 0 instead of reading the next
    segment's rows (np.reduceat semantics on equal adjacent offsets)."""
    from crct_tpu.train.eval_loop import segmented_argmax
    vals = np.asarray([0.1, 0.9, 0.3])
    offsets = np.asarray([0, 2, 2, 3])
    got = segmented_argmax(vals, offsets)
    np.testing.assert_array_equal(got, [1, 0, 0])
    # all-empty and zero-length inputs stay well-defined
    np.testing.assert_array_equal(
        segmented_argmax(np.asarray([]), np.asarray([0, 0, 0])), [0, 0])


def test_resolve_eval_chunk_auto_scales_and_respects_explicit():
    """VERDICT r2 weak #4/#8: default eval dispatch must be compute-sized
    (EVAL_AUTO_ROWS_PER_CHIP x chip; 240 per the r5 end-to-end sweep),
    with -eval_batch_size kept as a parity override."""
    from crct_tpu.train.eval_loop import (EVAL_AUTO_ROWS_PER_CHIP,
                                          resolve_eval_chunk,
                                          resolve_eval_question_batch)
    n = len(jax.local_devices())
    auto = {"eval_batch_size": None}
    assert resolve_eval_chunk(auto) == EVAL_AUTO_ROWS_PER_CHIP * n
    # auto question batches pull several chunks worth of rows per loader
    # batch, capped to bound host memory (~22 MB per padded eval question)
    assert 8 <= resolve_eval_question_batch(auto) <= 128
    explicit = {"eval_batch_size": 10}
    assert resolve_eval_chunk(explicit) == 10
    assert resolve_eval_question_batch(explicit) == 10


def test_segmented_argmax_trailing_empty_segment():
    """A trailing EMPTY segment must not shrink the previous segment's
    reduction window (the old clamp returned argmax 1 instead of 2 here)."""
    from crct_tpu.train.eval_loop import segmented_argmax
    vals = np.asarray([1.0, 2.0, 5.0])
    out = segmented_argmax(vals, np.asarray([0, 3, 3]))
    assert out.tolist() == [2, 0]
    # empty segment in the middle + ties break to the first max
    out = segmented_argmax(np.asarray([3.0, 3.0, 7.0, 7.0]),
                           np.asarray([0, 2, 2, 4]))
    assert out.tolist() == [0, 0, 0]
    # all empty
    assert segmented_argmax(np.zeros(0), np.asarray([0, 0, 0])).tolist() \
        == [0, 0]


def test_flatten_valid_rows_clamps_overflowing_num_ans():
    """num_ans above the candidate pad (a chart with >120 candidate texts)
    must clamp instead of indexing into the NEXT question's rows."""
    from crct_tpu.train.eval_loop import _flatten_valid_rows
    B, P, L = 2, 4, 6
    batch = {
        "tokens": np.arange(B * P * L).reshape(B, P, L),
        "segments": np.zeros((B, P, L), np.int64),
        "loc": np.zeros((B, P, L, 4), np.float32),
        "sep_indices": np.zeros((B, P, 50), np.int64),
        "hist_len": np.zeros((B, P, 1), np.int64),
        "image_feat": np.zeros((B, P, 3, 8), np.float32),
        "image_loc": np.zeros((B, P, 3, 4), np.float32),
        "image_mask": np.ones((B, P, 3), np.float32),
        "image_target": np.zeros((B, P, 3), np.int64),
        "R": np.zeros((B, P, 4), np.float32),
        "num_ans": np.asarray([[9], [2]]),   # 9 > P=4 pad
    }
    rows, offsets = _flatten_valid_rows(batch)
    assert offsets.tolist() == [0, 4, 6]     # clamped to the pad
    # question 0 contributes ONLY its own padded rows
    np.testing.assert_array_equal(rows["tokens"][:4],
                                  np.asarray(batch["tokens"])[0, :4])


def test_evaluate_all_empty_candidate_batch(eval_env):
    """A loader batch in which EVERY question has zero valid candidates
    (possible on a tail batch of poisoned questions) must not crash the
    eval loop — the questions score as incorrect with poisoned regression
    outputs, exactly like the per-question `nonempty` masking."""
    params, ds, model, mp, loader = eval_env
    batch = {k: (np.array(v, dtype=object) if isinstance(v, list)
                 else np.copy(v)) for k, v in next(iter(loader)).items()}
    batch["num_ans"] = np.zeros_like(np.asarray(batch["num_ans"]))
    rows, offsets = _flatten_valid_rows(batch)   # the old reshape crash
    assert offsets[-1] == 0
    total, breakdown, hist = evaluate([batch], ds, params, model, mp,
                                      csv=False, progress=False)
    n = len(np.asarray(batch["id"]).reshape(-1))
    assert total[0, 1] == n        # every question counted...
    assert total[0, 0] == 0        # ...none correct
    assert hist.sum() == 0


def test_legacy_snapshot_fallback_rank0_only(tmp_path):
    """Resuming a pre-rank-suffix eval run: rank 0 adopts the shared legacy
    snapshot totals; other ranks must NOT (global_sum would count the
    legacy totals once per process) — they raise and restart from zeros."""
    params = {"save_path": str(tmp_path), "eval_set": "val",
              "start_checkpoint": "ck"}
    base = f"{tmp_path}/eval_results_val_ck"
    legacy_val = {"breakdown": np.full((5, 4, 3, 3), 2.0),
                  "total_correct": np.full((6, 2), 3.0),
                  "histogram": np.arange(13)}
    for key, arr in legacy_val.items():
        np.save(f"{base}_{key}.npy", arr)

    log0 = EvaluationLog(params, cont_eval=True, rank=0)
    b, t, h = log0.load_tensors()
    assert t[0, 0] == 3.0 and h.tolist() == list(range(13))

    log1 = EvaluationLog(params, cont_eval=True, rank=1)
    with pytest.raises(FileNotFoundError):
        log1.load_tensors()


def test_is_rank0_gating():
    """Explicit nonzero -rank loses logging ownership; the argparse default
    (rank 0 everywhere) defers to jax.process_index()."""
    from crct_tpu.utils.logging import is_rank0
    assert is_rank0({}) is True                 # single-process: index 0
    assert is_rank0({"rank": 0}) is True
    assert is_rank0({"rank": 3}) is False


def test_evaluate_emits_prediction_records(eval_env):
    """on_predictions: one record per question with the demo-bot pred-dict
    fields, cls_output resolved through get_possible_answers and the
    confidence = the selected candidate's NSP probability."""
    params, ds, model, mp, loader = eval_env
    got = []
    evaluate(loader, ds, params, model, mp, csv=False, progress=False,
             on_predictions=got.extend)
    assert len(got) == len(ds)
    for r in got:
        assert r["question_id"] in range(len(ds))
        raw = ds.get_raw(r["question_id"])
        assert r["question"] == raw["question_string"]
        assert r["image_index"] == raw["image_index"]
        opts = [str(o) for o in ds.get_possible_answers(r["image_index"])]
        assert r["cls_output"] in opts
        assert r["confidence"] is None or 0.0 <= r["confidence"] <= 1.0
        assert r["answer"] == (r.get("reg_output") if r["is_reg"]
                               else r["cls_output"])
        assert "gt_answer" in r


def test_evaluate_dedup_matches_reference_layout(eval_env):
    """The transfer-dedup path (per-question visual arrays shipped once and
    re-expanded by a device gather — EVAL_VIS_KEYS) must reproduce the
    reference-layout path bit for bit: same total/breakdown/histogram."""
    params, ds, model, mp, loader = eval_env
    t_d, b_d, h_d = evaluate(loader, ds, dict(params, eval_dedup=True),
                             model, mp, csv=False, progress=False)
    t_r, b_r, h_r = evaluate(loader, ds, dict(params, eval_dedup=False),
                             model, mp, csv=False, progress=False)
    np.testing.assert_array_equal(t_d, t_r)
    np.testing.assert_array_equal(b_d, b_r)
    np.testing.assert_array_equal(h_d, h_r)


def test_eval_step_dedup_matches_expanded_rows(eval_env):
    """make_eval_step_dedup(text rows + per-question vis + row_qidx) returns
    the same per-row outputs as make_eval_step on the fully expanded rows."""
    from crct_tpu.train.eval_loop import (EVAL_TEXT_KEYS, EVAL_VIS_KEYS,
                                          make_eval_step,
                                          make_eval_step_dedup)
    params, ds, model, mp, loader = eval_env
    batch = next(iter(loader))
    rows, offsets = _flatten_valid_rows(batch)
    text, _ = _flatten_valid_rows(batch, keys=EVAL_TEXT_KEYS)
    qidx = np.repeat(np.arange(len(np.asarray(batch["id"]).reshape(-1)),
                               dtype=np.int32),
                     np.diff(offsets).astype(np.int64))
    vis = {k: np.asarray(batch[k])[:, 0] for k in EVAL_VIS_KEYS
           if k in batch}
    ref = make_eval_step(model)(mp, rows)
    ded = make_eval_step_dedup(model)(mp, text, vis, qidx)
    for r, d in zip(ref, ded):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(d))
