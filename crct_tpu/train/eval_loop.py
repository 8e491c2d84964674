"""Full-candidate ranking evaluation (reference CRCT/evaluation.py).

Each question fans out to all its candidate answers (padded to
EVAL_PADDED_SIZE with a validity mask, fig_dataloader.py:584-693). Valid
candidate rows are packed host-side into fixed-size chunks so one compiled
eval step serves the whole run — the TPU replacement for the reference's
``cut_batch_padding`` + variable-size sub-batches (evaluation.py:232-262).
Per-question argmax over candidate NSP probabilities picks the answer; a
question is correct when the classification is right AND (it needs no
regression OR the regression is within 5% / the tick tolerance)
(evaluation.py:287-312).

Accumulators mirror the reference reducers: the 6x2 total-accuracy tensor
(reduce_total_acc, evaluation.py:494-525), the 5x4x3x3 fig-type x answer-type
x question-category breakdown (reduce_breakdown_table, evaluation.py:465-491)
and the 13-bin regression-error histogram (reduce_histogram,
evaluation.py:528-548). Evaluation is resumable through per-rank CSVs of
completed question ids + accumulator snapshots (evaluation.py:69-126).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from crct_tpu.models.crct import CRCTModel

# question-category membership by qid prefix lists (evaluation.py:434-445)
STRUCTURAL_QID = ['S7', 'S17', 'S6', 'S1', 'S4', 'S3', 'S5', 'S2', 'S0', 'S8',
                  'S9', 'S15', 'S10', 'S13', 'S14', 'S16', 'S11', 'S12']
DATA_RETRIEVAL_QID = ['D15', 'D9', 'D12', 'D8', 'D7', 'D10', 'D11', 'D14',
                      'D5', 'D2', 'D13', 'D3', 'D0', 'D4', 'D1']
FIG_TABLE_IDS = {'Total': 0, 'line': 1, 'vbar': 2, 'hbar': 3, 'dot': 4}


def get_qcat_by_qid(qid: str) -> Tuple[str, int]:
    if qid in STRUCTURAL_QID:
        return 's', 0
    if qid in DATA_RETRIEVAL_QID:
        return 'd', 1
    return 'r', 2


# ---------------------------------------------------------------------------
# jitted per-row scoring
# ---------------------------------------------------------------------------

def make_eval_step(model: CRCTModel):
    """Compiled scorer over a fixed-size chunk of candidate rows.

    Returns (nsp_prob_pos, reg_output, reg_5_dist, reg_l1) per row,
    the quantities the reference collects per sub-batch
    (evaluation.py:243-262: nsp_probs[:,0], regression[0], [4], [2])."""

    def eval_step(params, rows):
        out = model.apply({"params": params}, rows, train=False)
        nsp_probs = jax.nn.softmax(out.nsp_logits, axis=-1)[:, 0]
        return nsp_probs, out.reg_output, out.reg_5_dist, out.reg_l1

    return jax.jit(eval_step)


ROW_KEYS = ["tokens", "segments", "loc", "sep_indices", "hist_len",
            "image_feat", "image_loc", "image_mask", "image_target", "R",
            "area"]

# Per-QUESTION constants across the candidate fan-out: the builder
# broadcasts these over the P candidate rows (example_builder.py, the
# reference's fig_dataloader.py:690-693 layout). The dedup eval path ships
# them host->device ONCE per question and re-expands on device — image_feat
# alone is [44,1024] f32 per question, so the per-row duplication is ~98%
# of eval transfer bytes (latency-bound on tunneled/PCIe hosts).
# "area" (figure_qa) is per-question too but figure_qa eval is binary and
# never reaches the fan-out paths.
EVAL_VIS_KEYS = ["image_feat", "image_loc", "image_mask", "image_target",
                 "R"]
EVAL_TEXT_KEYS = [k for k in ROW_KEYS if k not in EVAL_VIS_KEYS]


def make_eval_step_dedup(model: CRCTModel):
    """`make_eval_step` over TRANSFER-DEDUPLICATED inputs: per-row text
    arrays plus per-QUESTION visual arrays and a row->question index; the
    visual rows are re-materialized on device with one gather. Outputs are
    bit-identical to `make_eval_step` on the expanded rows (the gather
    reproduces the exact same per-row tensors)."""
    import jax.numpy as jnp

    def eval_step(params, text_rows, vis, row_qidx):
        rows = dict(text_rows)
        for k, v in vis.items():
            rows[k] = jnp.take(v, row_qidx, axis=0)
        out = model.apply({"params": params}, rows, train=False)
        nsp_probs = jax.nn.softmax(out.nsp_logits, axis=-1)[:, 0]
        return nsp_probs, out.reg_output, out.reg_5_dist, out.reg_l1

    return jax.jit(eval_step)


FAST_CAND_TOKENS = 8        # max WordPiece tokens per candidate answer


def make_fast_eval_step(model: CRCTModel):
    """Compiled fast-scorer step over per-QUESTION rows: one backbone pass
    per question (answer tokens masked from attention) + the light candidate
    head. Returns (cand_logits[B,C], reg_output, reg_5_dist, reg_l1)."""

    def eval_step(params, rows):
        out = model.apply({"params": params}, rows, train=False)
        return out.cand_logits, out.reg_output, out.reg_5_dist, out.reg_l1

    return jax.jit(eval_step)


def make_fast_eval_step_dedup(model: CRCTModel):
    """`make_fast_eval_step` over transfer-deduplicated inputs: per-question
    text rows plus the SAME per-question visual arrays the rescore stage
    uses, re-joined on device with one gather. This lets the topk path ship
    image_feat (~98% of the bytes) ONCE per loader batch instead of twice
    (fast pass + put_vis) — measured 0.77 s fast_put + 0.54 s put_vis of a
    2.43 s 240-question topk-8 pass on the tunneled v5e before this path
    existed. Outputs are bit-identical to `make_fast_eval_step` on the
    joined rows."""
    import jax.numpy as jnp

    def eval_step(params, text_rows, vis, row_qidx):
        rows = dict(text_rows)
        for k, v in vis.items():
            rows[k] = jnp.take(v, row_qidx, axis=0)
        out = model.apply({"params": params}, rows, train=False)
        return out.cand_logits, out.reg_output, out.reg_5_dist, out.reg_l1

    return jax.jit(eval_step)


# Compiled-step memo: ``evaluate()`` is called repeatedly with the same model
# object (per-epoch in-train eval, resumed CLI eval) and a fresh jax.jit
# wrapper per call would recompile the whole eval graph each time. Keyed by
# object identity (Flax module configs hold lists, so modules aren't
# hashable); the strong model reference in the value keeps ids from being
# reused by the allocator. Bounded FIFO so checkpoint/config sweeps that
# build a model per evaluation don't pin every compiled graph forever.
_STEP_CACHE: Dict[Tuple[int, str], Tuple[CRCTModel, Callable]] = {}
_STEP_CACHE_MAX = 4


def _cached_eval_step(model: CRCTModel, kind: str) -> Callable:
    key = (id(model), kind)
    hit = _STEP_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    step = (make_fast_eval_step(model) if kind == "fast" else
            make_fast_eval_step_dedup(model) if kind == "fast_dedup" else
            make_eval_step_dedup(model) if kind == "rank_dedup" else
            make_eval_step(model))
    while len(_STEP_CACHE) >= _STEP_CACHE_MAX:
        _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
    _STEP_CACHE[key] = (model, step)
    return step


def build_fast_rows(batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Eval batch [B, P, ...] -> per-question rows for the fast scorer.

    Row = candidate row 0 with answer tokens masked out of the attention
    (the caption+question prefix is identical across a question's candidate
    rows); cand_tokens[B, P, A] = each candidate's answer tokens (segment
    type 1), cand_valid from num_ans."""
    tokens = np.asarray(batch["tokens"])          # [B, P, L]
    segments = np.asarray(batch["segments"])
    B, P, L = tokens.shape
    num_ans = np.asarray(batch["num_ans"]).reshape(-1)

    rows: Dict[str, np.ndarray] = {}
    for k in ROW_KEYS:
        if k in batch:
            rows[k] = np.asarray(batch[k])[:, 0]
    if rows["hist_len"].ndim > 1:
        rows["hist_len"] = rows["hist_len"].reshape(B, -1)[:, :1]

    # attention cut at the first answer token of row 0
    seq_len = np.take_along_axis(
        rows["sep_indices"], rows["hist_len"].reshape(B, 1), axis=1)[:, 0] + 1
    is_ans0 = segments[:, 0] == 1
    ans_start = np.where(is_ans0.any(-1), is_ans0.argmax(-1), seq_len)
    rows["attention_mask"] = (
        np.arange(L)[None, :] < np.minimum(seq_len, ans_start)[:, None]
    ).astype(np.float32)

    # candidate answer tokens: stable-sort the answer positions first
    is_ans = segments == 1                          # [B, P, L]
    order = np.argsort(~is_ans, axis=-1, kind="stable")[..., :FAST_CAND_TOKENS]
    cand = np.take_along_axis(tokens, order, axis=-1)
    n_ans_tok = is_ans.sum(-1, keepdims=True)       # [B, P, 1]
    cand = np.where(np.arange(FAST_CAND_TOKENS)[None, None, :] < n_ans_tok,
                    cand, 0)
    rows["cand_tokens"] = cand.astype(np.int64)
    rows["cand_valid"] = (np.arange(P)[None, :]
                          < num_ans[:, None]).astype(np.float32)
    return rows


def _flatten_valid_rows(batch: Dict[str, Any], keys=ROW_KEYS
                        ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """[B, P, ...] -> [N_valid, ...] keeping per-question row offsets.

    P is EVAL_PADDED_SIZE normally, or the fixed-vocab size when
    -fixed_vocab skips the 120-candidate padding. ``keys`` restricts the
    flattened keys (the dedup path flattens text keys only)."""
    num_ans = np.asarray(batch["num_ans"]).reshape(-1)
    B = num_ans.shape[0]
    pad = np.asarray(batch["tokens"]).shape[1]
    # defensive: a num_ans above the candidate pad would index into the
    # NEXT question's rows (builder clamps too; belt and braces)
    num_ans = np.minimum(num_ans, pad)
    take = [np.arange(n) + q * pad for q, n in enumerate(num_ans)]
    flat_idx = np.concatenate(take)
    rows = {}
    for k in keys:
        if k not in batch:
            continue
        v = np.asarray(batch[k])
        rows[k] = v.reshape((B * pad,) + v.shape[2:])[flat_idx]
    # hist_len arrives [B,120,1] after padding; the model wants [N] or [N,1]
    if rows["hist_len"].ndim > 1:
        hl = rows["hist_len"]
        # reshape(0, -1) is ambiguous for numpy when every question in the
        # batch has zero valid candidates — pin the trailing dim explicitly
        rows["hist_len"] = (hl.reshape(len(flat_idx), -1)[:, :1]
                            if len(flat_idx) else hl.reshape(0, 1))
    offsets = np.concatenate([[0], np.cumsum(num_ans)])
    return rows, offsets


# Rows per chip per eval dispatch. Chosen by the end-to-end sweep
# (tools/eval_chunk_sweep.py, docs/BENCHMARKS.md "eval chunk sweep"):
# evaluate() measures 39.8/40.2/39.2/37.8 q/s at 120/240/480/960 on v5e —
# near-flat because deferred fetches already overlap dispatch latency;
# 240 is the nominal winner and halves worst-case pad waste vs 480.
# The reference default of 10 is latency-dominated on a tunneled backend.
EVAL_AUTO_ROWS_PER_CHIP = 240


def resolve_eval_chunk(params: Dict[str, Any]) -> int:
    """Rows per eval dispatch. An explicit ``-eval_batch_size`` wins
    (reference-parity runs, CRCT/options.py default 10); otherwise
    auto-scale to ``EVAL_AUTO_ROWS_PER_CHIP x local device count`` so the
    default CLI run is compute-bound rather than dispatch-latency-bound
    (reference bottleneck: CRCT/evaluation.py:243-262)."""
    ebs = params.get("eval_batch_size")
    if ebs:
        return max(1, int(ebs))
    return EVAL_AUTO_ROWS_PER_CHIP * max(1, len(jax.local_devices()))


def resolve_eval_question_batch(params: Dict[str, Any]) -> int:
    """Questions per dataloader batch feeding the row chunker. An explicit
    ``-eval_batch_size`` keeps the reference's one-number semantics (it
    sized both the loader batch and the model chunk); in auto mode, pull
    enough questions that each loader batch fills several row chunks
    (typical questions carry ~20-40 valid candidate rows, capped at
    EVAL_PADDED_SIZE=120). Capped at 128: each padded eval question is
    ~22 MB host-side (image_feat [120, 44, 1024] f32), and the loader
    keeps a few batches in flight — the cap bounds that at ~3 GB/batch."""
    ebs = params.get("eval_batch_size")
    if ebs:
        return max(1, int(ebs))
    return max(8, min(resolve_eval_chunk(params) // 12, 128))


def shortlist_rescore_rows(batch: Dict[str, Any], top_idx: np.ndarray,
                           keys=ROW_KEYS) -> Dict[str, np.ndarray]:
    """Gather the per-candidate padded batch [B, P, ...] down to the
    shortlisted [B*K, ...] rows for full-model rescoring
    (-fast_scorer_topk). ``top_idx`` [B, K] holds candidate indices.
    ``keys`` restricts the gathered keys (the dedup path gathers text
    keys only)."""
    B, K = top_idx.shape
    rows: Dict[str, np.ndarray] = {}
    for k in keys:
        if k not in batch:
            continue
        v = np.asarray(batch[k])
        idx = top_idx.reshape((B, K) + (1,) * (v.ndim - 2))
        g = np.take_along_axis(v, idx, axis=1)
        rows[k] = g.reshape((B * K,) + v.shape[2:])
    if rows["hist_len"].ndim > 1:
        rows["hist_len"] = rows["hist_len"].reshape(B * K, -1)[:, :1]
    return rows


def _chunk_rows(rows: Dict[str, np.ndarray], chunk: int):
    n = len(next(iter(rows.values())))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        pad = chunk - (e - s)
        out = {}
        for k, v in rows.items():
            piece = v[s:e]
            if pad:
                piece = np.concatenate(
                    [piece, np.zeros((pad,) + piece.shape[1:], piece.dtype)])
            out[k] = piece
        yield out, e - s


def segmented_argmax(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """argmax within each [offsets[q], offsets[q+1]) segment, relative to the
    segment start; ties break to the first maximum like np.argmax. Empty
    segments return 0.

    reduceat runs over the NON-EMPTY segments' start indices only: their
    starts are strictly increasing and tile the row range exactly, so no
    clamping is needed. (Clamping an empty TRAILING segment's start into
    range, as a previous version did, silently shrank the last non-empty
    segment's reduction window and returned a wrong argmax for it.)"""
    starts = np.asarray(offsets[:-1], np.int64)
    lens = np.diff(offsets).astype(np.int64)
    nseg = len(starts)
    out = np.zeros(nseg, np.int64)
    nonempty = lens > 0
    n = len(values)
    if n == 0 or not nonempty.any():
        return out
    ne_starts = starts[nonempty]
    seg_max = np.maximum.reduceat(values, ne_starts)
    # map each row to its (non-empty) segment's max, find the first match
    seg_of_row = np.repeat(np.arange(nseg), lens)
    ne_index_of_seg = np.cumsum(nonempty) - 1
    row_max = seg_max[ne_index_of_seg[seg_of_row]]
    row_ids = np.where(values == row_max, np.arange(n), n)
    first = np.minimum.reduceat(row_ids, ne_starts)
    out[nonempty] = first - ne_starts
    return out


# ---------------------------------------------------------------------------
# accumulator reducers (host-side numpy; psum-able device arrays upstream)
# ---------------------------------------------------------------------------

def reduce_total_acc(total: np.ndarray, needs_reg, nsp_right, reg_right,
                     reg_t_right) -> np.ndarray:
    t = np.zeros_like(total)
    t[0] = [np.sum(nsp_right), nsp_right.shape[0]]
    t[1] = [np.sum(nsp_right & needs_reg), np.sum(needs_reg)]
    t[2] = [np.sum(reg_right), np.sum(needs_reg)]
    t[3] = [np.sum(reg_t_right), np.sum(needs_reg)]
    correct = nsp_right & (~needs_reg | reg_right)
    t[4] = [np.sum(correct), nsp_right.shape[0]]
    correct_t = nsp_right & (~needs_reg | reg_t_right)
    t[5] = [np.sum(correct_t), nsp_right.shape[0]]
    total += t
    return total


def reduce_breakdown(breakdown: np.ndarray, dataset, batch, correct,
                     t_correct, needs_reg) -> np.ndarray:
    """Vectorized breakdown accumulation (reference reduce_breakdown_table,
    evaluation.py:465-491): scatter-add over (fig, ans_type, qcat) index
    triples instead of a per-question Python loop. Only the string->int
    lookups (qid category, fig-table id, answer type) stay host-side."""
    ids = np.asarray(batch["id"]).reshape(-1)
    n = len(ids)
    fig = np.fromiter((FIG_TABLE_IDS[batch["qa_type"][i]] for i in range(n)),
                      np.int64, n)
    qcat = np.fromiter((get_qcat_by_qid(batch["qid"][i])[1] for i in range(n)),
                       np.int64, n)
    ans = np.fromiter((dataset.get_ans_type(int(i)) for i in ids),
                      np.int64, n)
    c = np.asarray(correct, breakdown.dtype)
    t = np.asarray(t_correct, breakdown.dtype)
    one = np.ones(n, breakdown.dtype)
    nr = np.asarray(needs_reg, bool)

    def scatter(sel, fig_idx, ans_idx):
        np.add.at(breakdown, (fig_idx, ans_idx, qcat[sel], 0), c[sel])
        np.add.at(breakdown, (fig_idx, ans_idx, qcat[sel], 1), t[sel])
        np.add.at(breakdown, (fig_idx, ans_idx, qcat[sel], -1), one[sel])

    # every question counts toward the 'Total' table (fig row 0) and, when
    # different, its own fig-type row ({0, fig_id} set semantics)
    every = np.ones(n, bool)
    nz = fig != 0
    reg_row = breakdown.shape[1] - 1
    scatter(every, np.zeros(n, np.int64), ans)
    scatter(nz, fig[nz], ans[nz])
    # regression rows (ans_type -1)
    scatter(nr, np.zeros(int(nr.sum()), np.int64),
            np.full(int(nr.sum()), reg_row, np.int64))
    both = nz & nr
    scatter(both, fig[both], np.full(int(both.sum()), reg_row, np.int64))
    return breakdown


def reduce_histogram(histogram: np.ndarray, reg_5_dist: np.ndarray) -> np.ndarray:
    """13 bins: 0-5..15-20 (by 5%), 20-30..90-100 (by 10%), 100+."""
    add = np.zeros_like(histogram)
    bar = 0
    for i in range(4):
        add[bar] = np.sum((i / 20 < reg_5_dist) & (reg_5_dist <= (i + 1) / 20))
        bar += 1
    for i in range(2, 10):
        add[bar] = np.sum((i / 10 < reg_5_dist) & (reg_5_dist <= (i + 1) / 10))
        bar += 1
    add[bar] = np.sum(reg_5_dist > 1)
    histogram += add
    return histogram


# ---------------------------------------------------------------------------
# resumable CSV log (reference Evaluation_Log, utils.py:252-281)
# ---------------------------------------------------------------------------

class EvaluationLog:
    COLUMNS = ["qa_ind", "gt_cls", "pred_cls", "gt_reg", "pred_reg",
               "reg_target", "reg_%_error", "reg_t_error"]

    def __init__(self, params: Dict[str, Any], cont_eval: bool,
                 rank: Optional[int] = None):
        os.makedirs(params["save_path"], exist_ok=True)
        ckpt = os.path.basename(str(params.get("start_checkpoint", "ck")))
        base = f"{params['save_path']}/eval_results_{params['eval_set']}_{ckpt}"
        # one CSV + one snapshot set per process: accumulators here are
        # per-host partial sums (reduced once at the end, unlike the
        # reference's per-batch all_reduce), so resume state must not be
        # shared between ranks (reference per-rank CSVs, evaluation.py:69-126)
        if rank is None:
            rank = jax.process_index()
        self.rank = rank
        self.fp = f"{base}_{rank}.csv"
        self.snapshot_paths = {k: f"{base}_{k}_{rank}.npy"
                               for k in ("breakdown", "total_correct", "histogram")}
        # a resume may add ranks that have no CSV yet: those must still get
        # a header or the next get_prev_done_ids parse crashes on them
        if not cont_eval or not os.path.exists(self.fp):
            with open(self.fp, "w") as f:
                f.write("," + ",".join(self.COLUMNS) + "\n")
        self._row = 0

    def append(self, data: np.ndarray) -> None:
        with open(self.fp, "a") as f:
            for row in data:
                f.write(f"{self._row}," + ",".join(str(x) for x in row) + "\n")
                self._row += 1

    def save_tensors(self, breakdown, total_correct, histogram) -> None:
        np.save(self.snapshot_paths["breakdown"], breakdown)
        np.save(self.snapshot_paths["total_correct"], total_correct)
        np.save(self.snapshot_paths["histogram"], histogram)

    def load_tensors(self):
        def _load(key):
            path = self.snapshot_paths[key]
            if not os.path.exists(path) and self.rank == 0:
                # pre-rank-suffix snapshot naming ("{base}_{key}.npy"):
                # fall back so resumes of older eval runs keep their totals.
                # Rank 0 ONLY — if every rank adopted the shared legacy
                # totals, the end-of-run global_sum would count them
                # process_count times (other ranks start from zeros)
                legacy = path.rsplit("_", 1)[0] + ".npy"
                if os.path.exists(legacy):
                    return np.load(legacy)
            return np.load(path)
        return (_load("breakdown"), _load("total_correct"),
                _load("histogram"))


def get_prev_done_ids(params: Dict[str, Any]) -> Optional[np.ndarray]:
    ckpt = os.path.basename(str(params.get("start_checkpoint", "ck")))
    files = glob.glob(
        f"{params['save_path']}/eval_results_{params['eval_set']}_{ckpt}_*.csv")
    files = [f for f in files if f.rsplit("_", 1)[-1].split(".")[0].isdigit()]
    if not files:
        return None
    ids: List[int] = []
    for fn in files:
        with open(fn) as f:
            header = f.readline().strip().split(",")
            col = header.index("qa_ind")
            for line in f:
                parts = line.strip().split(",")
                if len(parts) > col and parts[col]:
                    ids.append(int(float(parts[col])))
    return np.asarray(ids) if ids else None


# ---------------------------------------------------------------------------
# main evaluation loop
# ---------------------------------------------------------------------------

def evaluate(dataloader, dataset, params: Dict[str, Any], model: CRCTModel,
             model_params, *, eval_batch_size: Optional[int] = None,
             progress: Any = False, csv: bool = True, cont_eval: bool = False,
             log_print: Optional[Callable[[str], None]] = None,
             allreduce: Optional[Callable[[np.ndarray], np.ndarray]] = None,
             on_predictions: Optional[Callable[[List[dict]], None]] = None):
    """Run full-candidate eval; returns (total_correct[6,2], breakdown[5,4,3,3])."""
    log_print = log_print or (lambda msg: print(msg, flush=True))
    chunk = eval_batch_size or resolve_eval_chunk(params)
    chunk = max(chunk, 1)
    # the fast paths dispatch per-QUESTION rows; sizing those dispatches at
    # the candidate-ROW chunk would zero-pad every ~40-question loader
    # batch up to 480 rows of full backbone compute. In auto mode they get
    # the question-batch size instead (explicit -eval_batch_size keeps the
    # reference's one-number semantics for both).
    qchunk = eval_batch_size or resolve_eval_question_batch(params)
    qchunk = max(qchunk, 1)
    # data-parallel eval over the local mesh: chunks shard on the leading
    # (row) axis, params replicate (the reference's per-GPU DDP eval,
    # evaluation.py:134-153, within one host)
    from crct_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        replicate as _replicate,
                                        replicated_sharding)
    n_local = len(jax.local_devices())
    mesh = (make_mesh(devices=jax.local_devices())
            if n_local > 1 else None)
    if mesh is not None:
        chunk = ((chunk + n_local - 1) // n_local) * n_local
        qchunk = ((qchunk + n_local - 1) // n_local) * n_local
        model_params = _replicate(model_params, mesh)
        row_sharding = batch_sharding(mesh)
        vis_sharding = replicated_sharding(mesh)
    else:
        # checkpoint-restored params arrive as numpy; jit re-transfers
        # numpy args on EVERY dispatch — pin them on device once
        model_params = jax.device_put(model_params)
    # cross-process reduction for the final accumulators; overridable for
    # custom-sharded callers, defaults to the process allgather-sum
    allreduce = allreduce or global_sum
    binary = params.get("binary_answers", False)
    fast = bool(params.get("fast_scorer")) and not binary
    # -fast_scorer_topk K: the fast head only SHORTLISTS K candidates and
    # the full model rescores those K rows — exact reference numerics
    # whenever the true answer is in the shortlist, at ~(P/K)x less full
    # model compute than the reference fan-out (fig_dataloader.py:282-291)
    topk = int(params.get("fast_scorer_topk") or 0) if fast else 0
    if params.get("fast_scorer_topk") and not fast:
        log_print("WARNING: -fast_scorer_topk has no effect without "
                  "-fast_scorer (running the full reference protocol)")
    # dedup transfer: per-question visual arrays ship once per loader batch
    # and re-expand on device (see EVAL_VIS_KEYS) — the fan-out otherwise
    # duplicates image_feat ~P times in every host->device chunk transfer.
    # Flag-gated for A/B and reference-layout debugging; numerics are
    # identical either way (the device gather rebuilds the exact rows).
    dedup = bool(params.get("eval_dedup", True)) and not binary
    rank_kind = "rank_dedup" if dedup else "rank"
    fast_kind = "fast_dedup" if dedup else "fast"
    eval_step = _cached_eval_step(model, fast_kind if fast else rank_kind)
    rank_step = _cached_eval_step(model, rank_kind) if topk else None
    # bf16 models cast image_feat to bf16 on device anyway
    # (vilbert.py::ImageEmbeddings `image_feat.astype(self.dtype)`), so for
    # them the host can pre-cast before the transfer: image_feat is ~98% of
    # eval transfer bytes and the tunnel/PCIe link is the measured
    # bottleneck of the topk path. Bit-identical numerics (same RTNE cast,
    # just on the other side of the link). JSON-config `eval_bf16_transfer:
    # false` opts out.
    bf16_transfer = (bool(params.get("eval_bf16_transfer", True))
                     and str(getattr(getattr(model, "config", None),
                                     "dtype", "")) == "bfloat16")
    if bf16_transfer:
        from ml_dtypes import bfloat16 as _bf16_np

    def cast_feat(arrs):
        if bf16_transfer and "image_feat" in arrs:
            arrs = dict(arrs)
            arrs["image_feat"] = np.asarray(arrs["image_feat"]).astype(
                _bf16_np)
        return arrs
    regs_mode = bool(params.get("qa_file")) and "_REGS" in str(params["qa_file"])

    breakdown = np.zeros((5, 4, 3, 3), np.float64)
    total_correct = np.zeros((6, 2), np.float64)
    histogram = np.zeros(13, np.int64)
    logger = EvaluationLog(params, cont_eval) if csv else None
    if csv and cont_eval:
        try:
            breakdown, total_correct, histogram = logger.load_tensors()
        except FileNotFoundError:
            pass

    inf_time = [0.0, 0]
    _qb_pad = [0]   # stable question-axis pad so one executable serves

    def put_vis(batch):
        """Per-question visual arrays -> device, padded to a stable B."""
        nq = np.asarray(batch["tokens"]).shape[0]
        _qb_pad[0] = max(_qb_pad[0], nq)
        vis = {}
        for k in EVAL_VIS_KEYS:
            if k not in batch:
                continue
            v = np.asarray(batch[k])[:, 0]
            if k == "image_feat" and bf16_transfer:
                v = v.astype(_bf16_np)
            if _qb_pad[0] > nq:
                v = np.concatenate(
                    [v, np.zeros((_qb_pad[0] - nq,) + v.shape[1:], v.dtype)])
            vis[k] = (jax.device_put(v, vis_sharding) if mesh is not None
                      else jax.device_put(v))
        return vis

    def dispatch_chunks(rows, step=None, chunk_size=None, vis=None,
                        qidx=None):
        """Transfer + dispatch every chunk; fetches are deferred (see
        collect_chunks) so host packing of chunk k+1 overlaps device
        compute of chunk k — and, in the topk pipeline, so a later
        stage's dispatches can queue behind these before any fetch."""
        step = step or eval_step
        t0 = time.time()
        if qidx is not None:
            rows = dict(rows, _qidx=np.asarray(qidx, np.int32))
        pending = []
        for piece, valid in _chunk_rows(rows, chunk_size or chunk):
            q = piece.pop("_qidx", None)
            piece = cast_feat(piece)
            if mesh is not None:
                piece = {k: jax.device_put(v, row_sharding)
                         for k, v in piece.items()}
                if q is not None:
                    q = jax.device_put(q, row_sharding)
            outs = (step(model_params, piece, vis, q) if q is not None
                    else step(model_params, piece))
            pending.append((outs, valid))
        inf_time[0] += time.time() - t0
        return pending

    def collect_chunks(pending):
        t0 = time.time()
        collected = None
        for outs, valid in pending:
            # one host fetch for all outputs (each np.asarray would be its
            # own device->host round trip; latency-bound on tunneled
            # backends)
            outs = jax.device_get(outs)
            if collected is None:
                collected = [[] for _ in outs]
            for acc, o in zip(collected, outs):
                acc.append(o[:valid])
        inf_time[0] += time.time() - t0
        return [np.concatenate(a) for a in collected]

    def run_chunks(rows, step=None, chunk_size=None, vis=None, qidx=None):
        return collect_chunks(dispatch_chunks(rows, step, chunk_size, vis,
                                              qidx))

    def _topk_stage2(batch, ids, gt_id, frows):
        """Fast logits fetched -> shortlist -> dispatch the rescore
        (returns the in-flight state; outputs collected in _topk_finish)."""
        cand_valid = frows["cand_valid"] > 0                # [B, P]
        cand_logits = frows.pop("_cand_logits")
        B, P = cand_logits.shape
        K = min(topk, P)
        top_idx = np.argsort(-cand_logits, axis=1, kind="stable")[:, :K]
        if regs_mode:
            # regression-only eval scores the GT candidate's row;
            # pin it into the shortlist so its outputs exist
            has_gt = (top_idx == gt_id[:, None]).any(axis=1)
            top_idx[~has_gt, -1] = gt_id[~has_gt]
        if dedup:
            # vis is already on device from the fast pass
            pend = dispatch_chunks(
                shortlist_rescore_rows(batch, top_idx,
                                       keys=EVAL_TEXT_KEYS),
                rank_step, vis=frows["_vis"],
                qidx=np.repeat(np.arange(B, dtype=np.int32), K))
        else:
            pend = dispatch_chunks(
                shortlist_rescore_rows(batch, top_idx), rank_step)
        return (batch, ids, gt_id, cand_valid, top_idx, K, pend)

    def _topk_finish(st):
        batch, ids, gt_id, cand_valid, top_idx, K, pend = st
        nsp_probs, reg_out, reg5, regl1 = collect_chunks(pend)
        B = top_idx.shape[0]
        probs = np.where(
            np.take_along_axis(cand_valid, top_idx, axis=1),
            nsp_probs[:B * K].reshape(B, K), -np.inf)
        if regs_mode:
            best_k = np.argmax(top_idx == gt_id[:, None], axis=1)
            answers_idx = gt_id.astype(np.int64)
        else:
            # break prob ties by CANDIDATE index (the full protocol's
            # segmented_argmax picks the first max in candidate order;
            # argmax over shortlist order would pick by fast-head rank)
            corder = np.argsort(top_idx, axis=1, kind="stable")
            probs_c = np.take_along_axis(probs, corder, axis=1)
            bk0 = np.argmax(probs_c, axis=1)
            best_k = np.take_along_axis(corder, bk0[:, None],
                                        axis=1)[:, 0]
            answers_idx = np.take_along_axis(
                top_idx, best_k[:, None], axis=1)[:, 0]
        sel = np.arange(B) * K + best_k
        nonempty = np.isfinite(probs).any(axis=1)
        return batch, (answers_idx,
                       (answers_idx == gt_id) & nonempty,
                       np.where(nonempty, reg5[sel], np.inf),
                       np.where(nonempty, regl1[sel], np.inf),
                       np.where(nonempty, reg_out[sel], np.nan),
                       probs[np.arange(B), best_k])

    def _topk_batches():
        """Shortlist-then-rescore, software-pipelined one batch deep:
        while the device rescores batch k, the host builds + dispatches
        the fast pass of batch k+1 (its chunks queue behind the rescore),
        and batch k's outputs are collected only after that. Measured on
        the tunneled v5e: the un-pipelined loop left the device idle
        during every fetch/argsort/build segment. Exact reference
        numerics whenever the true answer makes the shortlist
        (fig_dataloader.py:282-291)."""
        inflight = None
        for batch in dataloader:
            ids = np.asarray(batch["id"]).reshape(-1)
            if ids.shape[0] == 0:
                continue
            gt_id = np.asarray(batch["gt_id"]).reshape(-1)
            frows = build_fast_rows(batch)
            if dedup:
                vis = put_vis(batch)
                ftext = {k: v for k, v in frows.items()
                         if k not in EVAL_VIS_KEYS}
                fpend = dispatch_chunks(
                    ftext, chunk_size=qchunk, vis=vis,
                    qidx=np.arange(len(ids), dtype=np.int32))
                frows["_vis"] = vis
            else:
                fpend = dispatch_chunks(frows, chunk_size=qchunk)
            if inflight is not None:
                yield _topk_finish(inflight)
            frows["_cand_logits"] = collect_chunks(fpend)[0]
            inflight = _topk_stage2(batch, ids, gt_id, frows)
        if inflight is not None:
            yield _topk_finish(inflight)

    def _rank_finish(st):
        batch, offsets, pend = st
        return batch, (collect_chunks(pend), offsets)

    def _rank_batches():
        """Full reference protocol, software-pipelined one batch deep
        (same structure as _topk_batches): batch k+1's rows transfer +
        dispatch before batch k's outputs are collected, so the device
        keeps working through the host's flatten/vis-put/accounting
        segments. Zero-candidate batches dispatch nothing and flush the
        pipeline to preserve batch order. Reference bottleneck being
        replaced: CRCT/evaluation.py:243-262."""
        inflight = None
        for batch in dataloader:
            ids = np.asarray(batch["id"]).reshape(-1)
            if ids.shape[0] == 0:
                continue
            if not np.any(np.asarray(batch["num_ans"]).reshape(-1) > 0):
                if inflight is not None:
                    yield _rank_finish(inflight)
                    inflight = None
                yield batch, None        # poisoned outputs, no dispatch
                continue
            if dedup:
                rows, offsets = _flatten_valid_rows(batch,
                                                    keys=EVAL_TEXT_KEYS)
                qidx = np.repeat(
                    np.arange(len(ids), dtype=np.int32),
                    np.diff(offsets).astype(np.int64))
                pend = dispatch_chunks(rows, vis=put_vis(batch), qidx=qidx)
            else:
                rows, offsets = _flatten_valid_rows(batch)
                pend = dispatch_chunks(rows)
            if inflight is not None:
                yield _rank_finish(inflight)
            inflight = (batch, offsets, pend)
        if inflight is not None:
            yield _rank_finish(inflight)

    if fast and topk:
        batch_iter = _topk_batches()
    elif not fast and not binary:
        batch_iter = _rank_batches()
    else:
        batch_iter = ((b, None) for b in dataloader)

    for batch, _topk_pre in batch_iter:
        ids = np.asarray(batch["id"]).reshape(-1)
        if ids.shape[0] == 0:
            continue
        needs_reg = np.asarray(batch["needs_reg"]).reshape(len(ids), -1)[:, 0]
        needs_reg = needs_reg.astype(bool)
        gt_id = np.asarray(batch["gt_id"]).reshape(-1)

        if fast and topk:
            (answers_idx, nsp_right, ans_reg5, ans_regl1, ans_reg_out,
             ans_prob) = _topk_pre
        elif fast:
            # one backbone pass per question + light candidate head; the
            # regression outputs come from the same answer-masked pass
            frows = build_fast_rows(batch)
            if dedup:
                ftext = {k: v for k, v in frows.items()
                         if k not in EVAL_VIS_KEYS}
                cand_logits, ans_reg_out, ans_reg5, ans_regl1 = run_chunks(
                    ftext, chunk_size=qchunk, vis=put_vis(batch),
                    qidx=np.arange(len(ids), dtype=np.int32))
            else:
                cand_logits, ans_reg_out, ans_reg5, ans_regl1 = run_chunks(
                    frows, chunk_size=qchunk)
            if regs_mode:
                answers_idx = gt_id.astype(np.int64)
            else:
                answers_idx = np.argmax(cand_logits, axis=-1)
            nsp_right = answers_idx == gt_id
            masked = np.where(frows["cand_valid"] > 0, cand_logits, -np.inf)
            masked = masked - masked.max(axis=1, keepdims=True)
            e = np.exp(masked)
            with np.errstate(invalid="ignore"):
                smax = e / np.maximum(e.sum(axis=1, keepdims=True), 1e-30)
            ans_prob = smax[np.arange(len(ids)), answers_idx]
        elif binary:
            rows = {k: np.asarray(batch[k]) for k in ROW_KEYS if k in batch}
            nsp_probs, reg_out, reg5, regl1 = run_chunks(rows)
            answers = np.round(nsp_probs).astype(np.int64)
            labels = np.asarray(batch["next_sentence_labels"]).reshape(-1)
            nsp_right = answers == (1 - labels)
            ans_reg5 = np.zeros(len(ids))
            ans_regl1 = np.zeros(len(ids))
            ans_reg_out = np.zeros(len(ids))
            answers_idx = answers
            ans_prob = np.where(answers == 1, nsp_probs, 1.0 - nsp_probs)
        elif not np.any(np.asarray(batch["num_ans"]).reshape(-1) > 0):
            # every question in this loader batch has zero valid candidates
            # (possible on a tail batch of poisoned questions): nothing to
            # dispatch — emit the same poisoned outputs the `nonempty`
            # masking below would produce
            answers_idx = (gt_id.astype(np.int64) if regs_mode
                           else np.zeros(len(ids), np.int64))
            nsp_right = np.zeros(len(ids), bool)
            ans_reg5 = np.full(len(ids), np.inf)
            ans_regl1 = np.full(len(ids), np.inf)
            ans_reg_out = np.full(len(ids), np.nan)
            ans_prob = np.full(len(ids), np.nan)
        else:
            if _topk_pre is not None:
                # pipelined rank path: outputs already collected
                (nsp_probs, reg_out, reg5, regl1), offsets = _topk_pre
            elif dedup:
                rows, offsets = _flatten_valid_rows(batch,
                                                    keys=EVAL_TEXT_KEYS)
                qidx = np.repeat(
                    np.arange(len(ids), dtype=np.int32),
                    np.diff(offsets).astype(np.int64))
                nsp_probs, reg_out, reg5, regl1 = run_chunks(
                    rows, vis=put_vis(batch), qidx=qidx)
            else:
                rows, offsets = _flatten_valid_rows(batch)
                nsp_probs, reg_out, reg5, regl1 = run_chunks(rows)
            # vectorized per-question (segmented) argmax over candidate NSP
            # probs — replaces the reference's per-question Python loop
            # (evaluation.py:287-296); first-max tie-breaking preserved
            starts = offsets[:-1].astype(np.int64)
            if regs_mode:
                answers_idx = gt_id.astype(np.int64)
            else:
                answers_idx = segmented_argmax(nsp_probs, offsets)
            sel = np.minimum(starts + answers_idx, max(len(nsp_probs) - 1, 0))
            # a question with zero valid candidates can never be right, and
            # its `sel` row belongs to another question — poison its
            # regression outputs so the reg-accuracy counters skip it too
            nonempty = np.diff(offsets) > 0
            ans_reg5 = np.where(nonempty, reg5[sel], np.inf)
            ans_regl1 = np.where(nonempty, regl1[sel], np.inf)
            ans_reg_out = np.where(nonempty, reg_out[sel], np.nan)
            nsp_right = (answers_idx == gt_id) & nonempty
            ans_prob = np.where(nonempty, nsp_probs[sel], np.nan)
        inf_time[1] += len(ids)

        tol = np.asarray(batch["tolerance_margin"]).reshape(len(ids), -1)[:, 0]
        reg_right = (ans_reg5 <= 0.05) & needs_reg
        reg_t_right = (ans_regl1 <= tol) & needs_reg
        correct = nsp_right & (~needs_reg | reg_right)
        t_correct = nsp_right & (~needs_reg | reg_t_right)

        if on_predictions is not None and dataset is not None:
            # batch answer serving: one record per question, mirroring the
            # demo bot's pred dict (cli/demo.py / reference
            # Interactive_demo.py:161-247) at full eval-loop throughput
            recs = []
            for i in range(len(ids)):
                raw = dataset.get_raw(int(ids[i]))
                rec = {"question_id": int(ids[i]),
                       "image_index": int(raw["image_index"]),
                       "question": str(raw.get("question_string", "")),
                       "is_reg": bool(needs_reg[i]),
                       "confidence": (float(ans_prob[i])
                                      if np.isfinite(ans_prob[i]) else None)}
                if binary:
                    rec["answer"] = rec["cls_output"] = int(answers_idx[i])
                else:
                    opts = dataset.get_possible_answers(raw["image_index"])
                    ci = int(answers_idx[i])
                    rec["cls_output"] = (str(opts[ci])
                                         if 0 <= ci < len(opts) else None)
                    if needs_reg[i]:
                        rec["reg_output"] = (float(ans_reg_out[i])
                                             if np.isfinite(ans_reg_out[i])
                                             else None)
                        rec["answer"] = rec["reg_output"]
                    else:
                        rec["answer"] = rec["cls_output"]
                if raw.get("answer") is not None:
                    a = raw["answer"]
                    rec["gt_answer"] = (a.item() if hasattr(a, "item")
                                        else a)
                recs.append(rec)
            on_predictions(recs)

        if logger is not None:
            gt = np.asarray(batch["gt"]).reshape(len(ids), -1)[:, 0]
            reg_target = np.asarray(batch["reg_target"]).reshape(len(ids), -1)[:, 0]
            data = np.stack([ids, gt_id, answers_idx, gt, ans_reg_out,
                             reg_target, ans_reg5, ans_regl1], axis=1).astype(object)
            data[~needs_reg, 3:] = np.nan
            logger.append(data)

        total_correct = reduce_total_acc(
            total_correct, needs_reg, nsp_right, reg_right, reg_t_right)
        if 'plotqa' in params.get('dataset', ''):
            breakdown = reduce_breakdown(breakdown, dataset, batch, correct,
                                         t_correct, needs_reg)
            histogram = reduce_histogram(histogram, ans_reg5[needs_reg])
        if logger is not None:
            # snapshots for EVERY dataset: resume reloads them, and a
            # dvqa/figure_qa resume without them would silently restart
            # total_correct at zero while the CSV still skips done ids
            logger.save_tensors(breakdown, total_correct, histogram)
        if progress:
            print_acc_table(log_print, total_correct)
            if 'plotqa' in params.get('dataset', ''):
                print_breakdown_table(params, log_print, breakdown)
            if progress == "examples" and dataset is not None:
                # right-regression and wrong-classification samples
                # (reference evaluation.py:360-382)
                for i in np.nonzero(nsp_right & needs_reg & reg_right)[0]:
                    raw = dataset.get_raw(int(ids[i]))
                    log_print("{} [I{}] Q:{} output: {} || {} || loss: {}"
                              .format(int(ids[i]), raw['image_index'],
                                      raw['question_string'],
                                      ans_reg_out[i], raw['answer'],
                                      ans_reg5[i]))
                for i in np.nonzero(nsp_right & ~needs_reg)[0]:
                    raw = dataset.get_raw(int(ids[i]))
                    opts = dataset.get_possible_answers(raw['image_index'])
                    log_print("*{} <I{}> Q: {} . A: {} || {}".format(
                        int(ids[i]), raw['image_index'],
                        raw['question_string'],
                        opts[int(answers_idx[i])], raw['answer']))

    if inf_time[1]:
        log_print(f"Avg inference time: {inf_time[0] / inf_time[1]:.4f}s "
                  f"for {inf_time[1]} questions.")
    # multi-host: sum accumulators across processes (the reference's
    # per-rank all_reduce, evaluation.py:487-523, done once at the end here)
    total_correct = allreduce(total_correct)
    breakdown = allreduce(breakdown)
    histogram = allreduce(histogram)
    return total_correct, breakdown, histogram


def global_sum(arr: np.ndarray) -> np.ndarray:
    """Sum a host-side accumulator over all JAX processes (no-op on one)."""
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(arr))
    return np.asarray(gathered).sum(axis=0).astype(arr.dtype)


# ---------------------------------------------------------------------------
# table printers (reference evaluation.py:551-603)
# ---------------------------------------------------------------------------

def _safe_div(a, b):
    return a / b if b else float("nan")


def print_acc_table(log_print, acc) -> None:
    from pandas import DataFrame
    frac = [[_safe_div(acc[3, 0], acc[3, 1]), _safe_div(acc[5, 0], acc[5, 1])],
            [_safe_div(acc[2, 0], acc[2, 1]), _safe_div(acc[4, 0], acc[4, 1])]]
    frac = [["%.5g" % v for v in row] for row in frac]
    log_print(str(DataFrame(frac, ["Reg +-t", "Reg +-5%"],
                            ["Accuracy", "Total Accuracy"])))
    log_print("-" * 10)
    nsp = [["%.5g" % _safe_div(acc[0, 0], acc[0, 1]),
            "%.5g" % _safe_div(acc[1, 0], acc[1, 1])]]
    log_print(str(DataFrame(nsp, [""], ["nsp", "reg_cls"])))
    log_print("-" * 20)


def print_breakdown_table(params, log_print, acc) -> None:
    from pandas import DataFrame
    table_ids = FIG_TABLE_IDS if params.get("dataset") != "dvqa" else {"Total": 0}
    for name, tid in table_ids.items():
        rows = []
        for ans_cat in range(acc.shape[1]):
            row = []
            for q_cat in range(acc.shape[2]):
                num, num_t, den = acc[tid, ans_cat, q_cat]
                if den == 0:
                    row.append("N/A")
                else:
                    s = "%.5g" % (num / den)
                    if num_t != num:
                        s += " | %.5g" % (num_t / den)
                    row.append(s)
            rows.append(row)
        rows.append([_safe_div(np.sum(acc[tid, :3, q, 0]),
                               np.sum(acc[tid, :3, q, -1]))
                     for q in range(3)])
        log_print("==================== {}: {} ======================="
                  .format(name, int(np.sum(acc[tid, :3, :, -1]))))
        log_print(str(DataFrame(rows,
                                ["Yes/No", "Fixed Vocabulary",
                                 "Open Vocabulary", "Regression", "Total"],
                                ["Structural", "Data Retrieval", "Reasoning"])))
    log_print("-" * 20)


def make_histogram_png(params, histogram) -> Optional[str]:
    """13-bin regression-error histogram PNG (reference make_hist,
    evaluation.py:389-431)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    bars = ['0-5', '5-10', '10-15', '15-20', '20-30', '30-40', '40-50',
            '50-60', '60-70', '70-80', '80-90', '90-100', '100+']
    total = max(1, int(np.sum(histogram)))
    fig, ax = plt.subplots()
    ax.set_title("reg_acc: [{}/{}] {}%  all regression outputs".format(
        int(histogram[0]), total, round(histogram[0] / total * 100, 2)))
    ax.bar(range(len(bars)), height=list(histogram))
    plt.xticks(range(len(bars)), bars, rotation="vertical")
    out = os.path.join(params["save_path"],
                       f"Eval_hist_{params['eval_set']}.png")
    os.makedirs(params["save_path"], exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out
