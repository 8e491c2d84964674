"""Fast-scorer head training: listwise CE over each question's candidates.

Trains ONLY the ``fast_scorer`` head on top of a frozen, already-trained
CRCT backbone (one backbone pass per question, answer-masked — the same
encoding the fast eval path uses). Gradients never reach the backbone:
reverse-mode stops at the head, so a step costs about one eval forward.

This stage has no reference equivalent — it's the structural answer to the
reference's x120-candidate eval fan-out (fig_dataloader.py:282-291).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from crct_tpu.models.crct import CRCTModel
from crct_tpu.train.eval_loop import build_fast_rows


def make_head_train_step(model: CRCTModel, tx: optax.GradientTransformation):
    def step(head, opt_state, frozen, rows, gt_id):
        def loss_fn(h):
            p = dict(frozen)
            p["fast_scorer"] = h
            out = model.apply({"params": p}, rows, train=False)
            logp = jax.nn.log_softmax(out.cand_logits, axis=-1)
            ce = -jnp.take_along_axis(
                logp, gt_id.reshape(-1, 1).astype(jnp.int32), axis=1)[:, 0]
            # rows can be zero-padded (chunking): a padded row has no valid
            # candidates -> all logits NEG_INF -> uniform logp; weight by
            # whether any candidate is valid
            w = (jnp.sum(rows["cand_valid"], axis=-1) > 0).astype(jnp.float32)
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(head)
        updates, opt_state = tx.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def train_fast_scorer(params: Dict[str, Any], dataset, model: CRCTModel,
                      model_params, *, steps: int, lr: float = 1e-3,
                      batch_questions: int = 32, log_print=print):
    """Returns the full param tree with a trained fast_scorer head."""
    from crct_tpu.data.dataset import DataLoader

    assert "fast_scorer" in model_params, \
        "init the model with fast_scorer=True and a cand_tokens batch"
    dataset.split = "train"
    dataset.get_all_answers = True
    loader = DataLoader(dataset, batch_size=batch_questions, shuffle=True,
                        drop_last=True,
                        num_workers=params.get("num_workers", 2) or 1)
    tx = optax.adam(lr)
    # copy: the jitted step donates the head buffers; the caller's tree
    # must stay alive
    head = jax.tree.map(lambda x: jnp.array(x, copy=True),
                        model_params["fast_scorer"])
    # warm-start candidate embeddings from the (pretrained) backbone word
    # embeddings when shapes line up
    try:
        word = model_params["bert"]["embeddings"]["word_embeddings"]["embedding"]
        if head["cand_embeddings"]["embedding"].shape == word.shape:
            head["cand_embeddings"] = dict(embedding=jnp.array(word))
            log_print("[fast-scorer] candidate embeddings warm-started "
                      "from backbone word embeddings")
    except (KeyError, TypeError):
        pass
    # the frozen backbone arrives as numpy (checkpoint transfer); jit
    # re-transfers numpy args host->device EVERY call, so without this
    # device_put the whole backbone would ride the (latency-bound) link
    # once per training step
    frozen = jax.device_put(
        {k: v for k, v in model_params.items() if k != "fast_scorer"})
    opt_state = jax.jit(tx.init)(head)
    step_fn = make_head_train_step(model, tx)

    it = 0
    last = None
    while it < steps:
        it_at_epoch_start = it
        for batch in loader:
            if it >= steps:
                break
            rows = build_fast_rows(batch)
            gt_id = np.asarray(batch["gt_id"]).reshape(-1)
            head, opt_state, loss = step_fn(head, opt_state, frozen,
                                            {k: jnp.asarray(v)
                                             for k, v in rows.items()},
                                            jnp.asarray(gt_id))
            if it % 20 == 0:
                last = float(loss)
                log_print(f"[fast-scorer {it}/{steps}] CE: {last:.4f}")
            it += 1
        if it == it_at_epoch_start:
            raise ValueError(
                "fast-scorer loader yielded no batches (dataset smaller "
                "than the question batch with drop_last) — lower "
                "batch_size or add data")
    dataset.get_all_answers = False
    merged = dict(frozen)
    merged["fast_scorer"] = head
    return merged, last
