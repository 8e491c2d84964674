"""Decompose real ``evaluate()`` wall time into host/transfer/dispatch/compute.

The measured protocol numbers (BENCH aux ``eval_protocol_questions_per_sec
_per_chip_measured``, ``fast_topk8_questions_per_sec_per_chip``) sit far
below the pure eval-step row-throughput bound
(``eval_candidate_rows_per_sec_per_chip``): ~6 q/s vs the ~46 q/s the
measured 1990 rows/s x 43-candidate fan-out implies. This tool runs the
SAME synthetic setup as ``bench.bench_fast_topk8`` and times each phase of
the full-protocol dedup path and the topk path explicitly, so the gap gets
an owner (reference bottleneck being replaced: per-candidate sub-batches,
CRCT/evaluation.py:243-262).

Phases (full protocol, dedup):
  flatten   _flatten_valid_rows on the [B,120,...] loader batch (host)
  put_vis   per-question visual arrays -> device, blocked
  pack      _chunk_rows slice+pad (host)
  put       text chunk device_put, blocked
  dispatch  jitted step call, blocked (device compute + launch)
  fetch     device_get of the 4 output vectors
  account   argmax/reducers/accumulators (host)

Blocking per phase serializes the pipeline the real loop overlaps, so the
sum can exceed the unblocked end-to-end time — each number is an upper
bound on that phase's cost, and the e2e line is what the bench sees.

Usage: python tools/eval_overhead_profile.py [--questions 240]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--questions", type=int, default=240)
    ap.add_argument("--feat-dim", type=int, default=1024)
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from crct_tpu.config import CRCTModelConfig, default_params
    from crct_tpu.data.dataset import ChartQADataset, DataLoader
    from crct_tpu.data.synthetic import generate_dataset
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.train import eval_loop as el

    with tempfile.TemporaryDirectory() as td:
        n_img = 16
        cfg_ds = generate_dataset(os.path.join(td, "d"), n_images=n_img,
                                  division=4, feat_dim=args.feat_dim,
                                  n_questions=-(-args.questions // n_img))
        params = default_params(
            figure_feat_path=cfg_ds["figure_feat_path"],
            qa_parent_dir=cfg_ds["qa_parent_dir"],
            dataset_config={"dataset_files_divisions":
                            cfg_ds["dataset_files_divisions"]},
            splits=cfg_ds["splits"], categories=cfg_ds["categories"],
            eval_set="test", eval_batch_size=None)
        ds = ChartQADataset(params, ["test"], init_split="test")
        ds.get_all_answers = True
        loader = DataLoader(ds, batch_size=120, shuffle=False,
                            drop_last=False, num_workers=1)
        t0 = time.perf_counter()
        batches = [{k: np.asarray(v) for k, v in b.items()} for b in loader]
        t_mat = time.perf_counter() - t0
        n_q = sum(len(np.asarray(b["id"]).reshape(-1)) for b in batches)
        print(f"[setup] {n_q} questions in {len(batches)} loader batches, "
              f"materialize {t_mat:.2f}s", flush=True)

        model = CRCTModel(config=CRCTModelConfig(dtype="bfloat16"),
                          categories=params["categories"])
        rows0, _ = el._flatten_valid_rows(batches[0], keys=el.ROW_KEYS)
        init_rows = {k: jnp.asarray(v[:8]) for k, v in rows0.items()}
        mp = jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.key(4)}, init_rows)["params"]
        mp = jax.device_put(mp)
        chunk = el.resolve_eval_chunk(params)
        step = el.make_eval_step_dedup(model)

        # ---- instrumented full-protocol dedup pass -----------------------
        T = {k: 0.0 for k in ("flatten", "put_vis", "pack", "put",
                              "dispatch", "fetch", "account")}
        n_chunks = 0

        def run_instrumented():
            nonlocal n_chunks
            qb_pad = max(np.asarray(b["tokens"]).shape[0] for b in batches)
            for batch in batches:
                ids = np.asarray(batch["id"]).reshape(-1)
                t = time.perf_counter()
                rows, offsets = el._flatten_valid_rows(
                    batch, keys=el.EVAL_TEXT_KEYS)
                qidx = np.repeat(np.arange(len(ids), dtype=np.int32),
                                 np.diff(offsets).astype(np.int64))
                rows = dict(rows, _qidx=qidx)
                T["flatten"] += time.perf_counter() - t

                t = time.perf_counter()
                vis = {}
                for k in el.EVAL_VIS_KEYS:
                    if k not in batch:
                        continue
                    v = np.asarray(batch[k])[:, 0]
                    if qb_pad > len(ids):
                        v = np.concatenate([v, np.zeros(
                            (qb_pad - len(ids),) + v.shape[1:], v.dtype)])
                    vis[k] = jax.device_put(v)
                jax.block_until_ready(vis)
                T["put_vis"] += time.perf_counter() - t

                pending = []
                t = time.perf_counter()
                # materialize so the slice+pad cost lands in 'pack', not in
                # the untimed generator advance at the loop head
                chunks = list(el._chunk_rows(rows, chunk))
                T["pack"] += time.perf_counter() - t
                for piece, valid in chunks:
                    n_chunks += 1
                    t = time.perf_counter()
                    q = piece.pop("_qidx")
                    T["pack"] += time.perf_counter() - t
                    t = time.perf_counter()
                    piece = jax.device_put(piece)
                    q = jax.device_put(q)
                    jax.block_until_ready(piece)
                    T["put"] += time.perf_counter() - t
                    t = time.perf_counter()
                    outs = step(mp, piece, vis, q)
                    jax.block_until_ready(outs)
                    T["dispatch"] += time.perf_counter() - t
                    pending.append((outs, valid))
                t = time.perf_counter()
                coll = None
                for outs, valid in pending:
                    outs = jax.device_get(outs)
                    if coll is None:
                        coll = [[] for _ in outs]
                    for acc, o in zip(coll, outs):
                        acc.append(o[:valid])
                nsp_probs, reg_out, reg5, regl1 = [np.concatenate(a)
                                                   for a in coll]
                T["fetch"] += time.perf_counter() - t

                t = time.perf_counter()
                gt_id = np.asarray(batch["gt_id"]).reshape(-1)
                needs_reg = np.asarray(batch["needs_reg"]).reshape(
                    len(ids), -1)[:, 0].astype(bool)
                answers_idx = el.segmented_argmax(nsp_probs, offsets)
                starts = offsets[:-1].astype(np.int64)
                sel = np.minimum(starts + answers_idx,
                                 max(len(nsp_probs) - 1, 0))
                nonempty = np.diff(offsets) > 0
                reg_right = (np.where(nonempty, reg5[sel], np.inf)
                             <= 0.05) & needs_reg
                tol = np.asarray(batch["tolerance_margin"]).reshape(
                    len(ids), -1)[:, 0]
                reg_t_right = (np.where(nonempty, regl1[sel], np.inf)
                               <= tol) & needs_reg
                nsp_right = (answers_idx == gt_id) & nonempty
                tc = np.zeros((6, 2))
                el.reduce_total_acc(tc, needs_reg, nsp_right, reg_right,
                                    reg_t_right)
                el.reduce_breakdown(np.zeros((5, 4, 3, 3)), ds, batch,
                                    nsp_right & (~needs_reg | reg_right),
                                    nsp_right & (~needs_reg | reg_t_right),
                                    needs_reg)
                T["account"] += time.perf_counter() - t

        run_instrumented()          # compile pass
        for k in T:
            T[k] = 0.0
        n_chunks = 0
        t0 = time.perf_counter()
        run_instrumented()
        t_instr = time.perf_counter() - t0

        # ---- unblocked end-to-end through the REAL evaluate() ------------
        el.evaluate(batches, ds, dict(params), model, mp, csv=False,
                    log_print=lambda m: None)
        t0 = time.perf_counter()
        el.evaluate(batches, ds, dict(params), model, mp, csv=False,
                    log_print=lambda m: None)
        t_e2e = time.perf_counter() - t0

        out = {"questions": n_q, "chunks": n_chunks, "chunk_rows": chunk,
               "e2e_s": round(t_e2e, 3),
               "e2e_q_per_s": round(n_q / t_e2e, 2),
               "instrumented_s": round(t_instr, 3),
               "phases_s": {k: round(v, 3) for k, v in T.items()}}
        print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
