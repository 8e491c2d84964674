"""Checkpoint IO with the reference's save/load semantics.

Orbax-backed saves named ``plotqa_encoder_<epoch>_<iter>.ckpt`` (reference
CRCT/train.py:284-291) containing params, opt_state and iteration counter.
Two load modes match the reference (train.py:91-130):

  * *transfer* — copy only the intersecting (path, shape) leaves into a
    freshly-initialized tree (weight transplant across head variants),
  * *continue* — strict restore of params + optimizer state + step, with the
    epoch parsed from the checkpoint filename.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer() -> "ocp.Checkpointer":
    """Checkpointer whose coordination barriers are scoped to the CALLING
    process. All our checkpoints move host-numpy trees with a single
    designated writer (rank 0 for train checkpoints, per-rank paths
    elsewhere), so orbax's default global sync barriers are never needed —
    and in a multi-process run they deadlock: rank 0's epoch save blocks on
    a barrier rank 1 never reaches because rank 1 is already inside the
    in-train eval's collectives (reference multi-node save semantics,
    CRCT/train.py:284-291 — torch.save there is likewise local-only)."""
    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    me = jax.process_index()
    mp_opts = ocp.options.MultiprocessingOptions(
        primary_host=me, active_processes={me},
        barrier_sync_key_prefix=f"proc{me}")
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(multiprocessing_options=mp_opts),
        multiprocessing_options=mp_opts)


def checkpoint_name(epoch: int, iter_id: int) -> str:
    return f"plotqa_encoder_{epoch}_{iter_id}.ckpt"


def epoch_from_name(path: str) -> int:
    """Parse the epoch number out of plotqa_encoder_<epoch>_<iter>.ckpt."""
    return int(os.path.basename(path).split("_")[2])


def epoch_iter_from_name(path: str) -> tuple:
    """(epoch, iter) recency key: a preemption save shares its epoch
    number with the regular epoch save, so epoch alone cannot order them."""
    parts = os.path.basename(path).split("_")
    return int(parts[2]), int(parts[3].split(".")[0])


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    iter_id: int = 0, extra: Optional[Dict] = None) -> None:
    from flax import serialization
    tree = {"model_state_dict": params, "iter_id": np.asarray(iter_id)}
    if opt_state is not None:
        # optax states are namedtuples; serialize to a plain state dict so
        # the on-disk layout is structure-free and restorable anywhere
        tree["optimizer_state_dict"] = serialization.to_state_dict(opt_state)
    if extra:
        tree.update(extra)
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def restore_opt_state(live_opt_state: Any, saved_state_dict: Any) -> Any:
    """Map a restored plain state dict back onto the live optax structure."""
    from flax import serialization
    return serialization.from_state_dict(live_opt_state, saved_state_dict)


def load_checkpoint(path: str, target: Any = None) -> Dict[str, Any]:
    ckptr = _checkpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))


def transfer_params(init_params: Any, loaded_params: Any,
                    verbose: bool = True) -> Tuple[Any, int]:
    """Copy leaves whose path and shape match (reference 'transfer' load,
    train.py:93-104). Returns (merged tree, number of transferred leaves)."""
    flat_init = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_flatten_with_path(init_params)[0]}
    flat_loaded = {jax.tree_util.keystr(p): v
                   for p, v in jax.tree_util.tree_flatten_with_path(loaded_params)[0]}
    merged = dict(flat_init)
    n = 0
    for k, v in flat_loaded.items():
        if k in flat_init and np.shape(flat_init[k]) == np.shape(v):
            merged[k] = v
            n += 1
    assert n > 0, "no keys transferred from checkpoint"
    # rebuild the tree in init_params' structure
    leaves_paths = jax.tree_util.tree_flatten_with_path(init_params)
    treedef = leaves_paths[1]
    new_leaves = [merged[jax.tree_util.keystr(p)] for p, _ in leaves_paths[0]]
    if verbose:
        print(f"number of keys transferred: {n}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves), n
