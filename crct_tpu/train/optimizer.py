"""Optimizer + LR schedule (reference CRCT/utils.py:11-29,228-249).

AdamW with the reference's two learning-rate partition: text-stream
parameters (the BERT-pretrained weights listed in
config/language_weights.json) train at ``lr``, everything else (vision
stream, co-attention, poolers, heads, regressor, location/type embeddings)
at ``image_lr``. Bias and LayerNorm parameters are excluded from weight
decay. The schedule is linear warmup to the base LR then linear decay, with
a per-group floor at ``min_lr`` (WarmupLinearScheduleNonZero).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, FrozenSet, Optional

import jax
import optax

# The committed partition artifact: flax leaf paths of every parameter that
# takes ``lr`` (text stream). Generated from the reference's
# config/language_weights.json (utils.py:228-249) through the checkpoint
# converter's key mapping by tools/gen_language_weights.py.
LANGUAGE_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "language_weights.json")


@functools.lru_cache(maxsize=1)
def language_weight_paths() -> FrozenSet[str]:
    with open(LANGUAGE_WEIGHTS_PATH) as f:
        return frozenset(json.load(f))


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def _is_language_param(path, artifact: Optional[FrozenSet[str]] = None) -> bool:
    """Text-stream BERT weights get ``lr``; all else ``image_lr``.

    Membership in the committed artifact decides. The heuristic fallback
    (t_layers + text word/position embeddings + their LayerNorm — exactly
    the artifact's effective coverage of this tree; the location/type
    embeddings, vision/co-attention layers, poolers, bi_seq_relationship
    head and regressor all take image_lr) is only used if the artifact file
    is missing, and test_optimizer_partition pins the two against each
    other so drift fails CI.
    """
    if artifact is None:
        try:
            artifact = language_weight_paths()
        except OSError:
            artifact = None
    if artifact is not None:
        return _path_str(path) in artifact
    return _is_language_param_heuristic(path)


def _is_language_param_heuristic(path) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    if "encoder" in keys and any(k.startswith("t_layer_") for k in keys):
        return True
    if "embeddings" in keys and any(
            k in ("word_embeddings", "position_embeddings", "LayerNorm")
            for k in keys):
        # only the *text* embeddings module (bert/embeddings), not v_embeddings
        return "v_embeddings" not in keys
    return False


def _needs_decay(path) -> bool:
    """Torch no_decay = ['bias', 'LayerNorm.bias', 'LayerNorm.weight']."""
    keys = [getattr(p, "key", str(p)) for p in path]
    if keys and keys[-1] == "bias":
        return False
    if "LayerNorm" in keys or any(k.endswith("_ln") for k in keys):
        return False
    # flax LayerNorm scale
    if keys and keys[-1] == "scale":
        return False
    return True


def warmup_linear_min_schedule(base_lr: float, warmup_steps: int,
                               t_total: float, min_lr: float):
    """WarmupLinearScheduleNonZero (reference utils.py:11-29): linear 0->base
    over warmup, linear base->0 over the rest, floored at min_lr."""
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps))
        decay = jnp.maximum(
            0.0, (t_total - step) / max(1.0, t_total - warmup_steps))
        factor = jnp.where(step < warmup_steps, warm, decay)
        lr = base_lr * factor
        return jnp.where(lr > min_lr, lr, min_lr)
    return schedule


def make_optimizer(params_dict: Dict[str, Any], model_params,
                   iters_per_epoch: float) -> optax.GradientTransformation:
    """Build the 4-way-partitioned AdamW (lang/image x decay/nodecay)."""
    warmup = params_dict["warmup"]
    min_lr = params_dict["min_lr"]
    # reference horizon: iters_per_epoch * 20 regardless of num_epochs
    # (train.py:87)
    t_total = float(iters_per_epoch) * 20.0
    wd = params_dict["wd"]

    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: ("lang" if _is_language_param(path) else "image")
            + ("_decay" if _needs_decay(path) else "_nodecay"),
            tree)

    # -opt_bf16_m: first moments in bf16 (the update is memory-bound at
    # the HBM roofline — docs/BENCHMARKS.md; mu tolerates low precision,
    # nu does not: nu underflow near bf16's ~1e-38 floor would blow up
    # rsqrt, so second moments stay f32)
    mu_dtype = "bfloat16" if params_dict.get("opt_bf16_m") else None

    def group(base_lr: float, decay: float) -> optax.GradientTransformation:
        sched = warmup_linear_min_schedule(base_lr, warmup, t_total, min_lr)
        chain = [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                     mu_dtype=mu_dtype)]
        if decay > 0:
            chain.append(optax.add_decayed_weights(decay))
        chain.append(optax.scale_by_learning_rate(sched))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {
            "lang_decay": group(params_dict["lr"], wd),
            "lang_nodecay": group(params_dict["lr"], 0.0),
            "image_decay": group(params_dict["image_lr"], wd),
            "image_nodecay": group(params_dict["image_lr"], 0.0),
        },
        label_fn,
    )
    return tx


def current_lr(params_dict: Dict[str, Any], iters_per_epoch: float,
               step: int) -> float:
    """Host-side LR readout for logging: the actual schedule, evaluated at
    the optimizer-update count (callers divide mini-steps by
    batch_multiply)."""
    schedule = warmup_linear_min_schedule(
        params_dict["lr"], params_dict["warmup"],
        float(iters_per_epoch) * 20.0, params_dict["min_lr"])
    return float(schedule(step))
