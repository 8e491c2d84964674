"""Shortlist miss-rate curve for `-fast_scorer_topk` K in {4, 8, 16}.

The topk mode's accuracy guarantee is conditional: numerics are EXACTLY the
reference all-candidate protocol (evaluation.py:243-262) whenever the true
answer makes the fast head's K-candidate shortlist — so its accuracy loss
equals the shortlist miss rate. This tool measures that miss rate on a
REAL learned task (the lexical-retrieval recipe from
tests/test_train.py::test_training_learns_retrieval_task: a from-scratch
tiny CRCT that learns the rule, then a fast-scorer head trained on the
frozen backbone), alongside the end-to-end topk accuracy through the real
``evaluate()`` for each K.

Runs on CPU. Results land in docs/BENCHMARKS.md (fast-scorer section).

    python tools/shortlist_miss_rate.py [--ks 4,8,16]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import synthetic_params, tiny_model_config
    from crct_tpu.data.dataset import ChartQADataset, DataLoader
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.train.eval_loop import (_cached_eval_step, build_fast_rows,
                                          evaluate)
    from crct_tpu.train.fast_scorer_train import train_fast_scorer
    from crct_tpu.train.train_loop import Trainer

    ks = [int(k) for k in "4,8,16".split(",")]
    if "--ks" in sys.argv:
        ks = [int(k) for k in sys.argv[sys.argv.index("--ks") + 1].split(",")]

    with tempfile.TemporaryDirectory() as td:
        # --- the learned retrieval task (test_train.py recipe) ------------
        params = synthetic_params(td, n_images=16, division=8,
                                  n_questions=4, feat_dim=32,
                                  task="retrieval", batch_size=32,
                                  eval_batch_size=64, max_seq_len=96,
                                  lr=2e-3, image_lr=2e-3, min_lr=5e-4,
                                  warmup=60, num_workers=0)
        cfg = tiny_model_config(v_feature_size=32,
                                hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0,
                                v_hidden_dropout_prob=0.0,
                                v_attention_probs_dropout_prob=0.0)
        model = CRCTModel(config=cfg, categories=params["categories"])
        ds = ChartQADataset(params, ["train", "val"])
        ds.split = "train"
        loader = DataLoader(ds, batch_size=32, shuffle=True, drop_last=True,
                            num_workers=0)
        batches = [b for _ in range(6) for b in loader]
        trainer = Trainer(params, model, batches[0], iters_per_epoch=30)
        for i in range(600):
            trainer.run_step(batches[i % len(batches)])
        print("backbone trained", flush=True)

        # --- fast-scorer head on the frozen backbone ----------------------
        trained = jax.device_get(trainer.params)
        model_f = CRCTModel(config=cfg, categories=params["categories"],
                            fast_scorer=True)
        ds.split = "val"
        ds.get_all_answers = True
        sample = next(iter(DataLoader(ds, batch_size=4, shuffle=False,
                                      num_workers=0)))
        rows = {k: jnp.asarray(v) for k, v in build_fast_rows(sample).items()}
        fvars = jax.jit(functools.partial(model_f.init, train=False))(
            {"params": jax.random.key(1)}, rows)
        ds.get_all_answers = False
        fparams = dict(trained)
        fparams["fast_scorer"] = jax.device_get(fvars["params"])["fast_scorer"]
        pf = dict(params, fast_scorer=True)
        fparams, _ = train_fast_scorer(pf, ds, model_f, fparams, steps=200,
                                       lr=1e-3, batch_questions=16,
                                       log_print=lambda s: None)
        print("fast head trained", flush=True)

        # --- shortlist recall: is the GT candidate in the fast top-K? -----
        ds.split = "val"
        ds.get_all_answers = True
        vl = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                        num_workers=0)
        fast_step = _cached_eval_step(model_f, "fast")
        mp = jax.device_put(fparams)
        ranks = []
        for batch in vl:
            frows = {k: jnp.asarray(v)
                     for k, v in build_fast_rows(batch).items()}
            logits = np.asarray(fast_step(mp, frows)[0])      # [B, P]
            valid = np.asarray(frows["cand_valid"]) > 0
            logits = np.where(valid, logits, -np.inf)
            gt = np.asarray(batch["gt_id"]).reshape(-1)
            order = np.argsort(-logits, axis=1, kind="stable")
            ranks.extend(int(np.where(order[b] == gt[b])[0][0])
                         for b in range(len(gt)))
        ranks = np.asarray(ranks)

        def eval_acc(extra):
            pp = dict(params)
            pp.update(extra)
            ds.split = "val"
            ds.get_all_answers = True
            vl = DataLoader(ds, batch_size=8, shuffle=False,
                            drop_last=False, num_workers=0)
            t, _, _ = evaluate(vl, ds, pp, model_f, fparams, csv=False,
                               progress=False)
            ds.get_all_answers = False
            return float(t[0, 0] / t[0, 1])

        acc_full = eval_acc({})
        out = {"n_questions": int(len(ranks)),
               "full_protocol_accuracy": round(acc_full, 4)}
        rows_md = ["| K | shortlist miss rate | topk-K accuracy "
                   "| full-protocol accuracy |", "|---|---|---|---|"]
        for k in ks:
            miss = float((ranks >= k).mean())
            acc_k = eval_acc({"fast_scorer": True, "fast_scorer_topk": k})
            out[f"k{k}"] = {"miss_rate": round(miss, 4),
                            "topk_accuracy": round(acc_k, 4)}
            rows_md.append(f"| {k} | {miss:.3f} | {acc_k:.3f} "
                           f"| {acc_full:.3f} |")
            print(f"K={k}: miss={miss:.3f} acc={acc_k:.3f} "
                  f"(full {acc_full:.3f})", flush=True)
        print(json.dumps(out))
        print("\n".join(rows_md))


if __name__ == "__main__":
    main()
