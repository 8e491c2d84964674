"""Rank-gated run logging (reference CRCT/utils.py:32-47)."""

from __future__ import annotations

import os
from time import gmtime, strftime
from typing import Any, Dict


def is_rank0(params: Dict[str, Any]) -> bool:
    """True on the process that should own logs/TensorBoard. An explicit
    nonzero ``-rank`` wins (reference per-GPU semantics); otherwise the
    live truth is ``jax.process_index()`` — env-var multihost launches
    (JAX_PROCESS_ID, see parallel/mesh.py) never set the flag, and argparse
    leaves the default 0 on every host."""
    if int(params.get('rank') or 0):
        return False
    import jax
    return jax.process_index() == 0


def init_log_file(params: Dict[str, Any]) -> None:
    os.makedirs(params['save_path'], exist_ok=True)
    params['log_file'] = os.path.join(
        params['save_path'], strftime('%d-%b-%y-%X-%a', gmtime()) + ".txt")
    if is_rank0(params):
        with open(params['log_file'], 'w') as f:
            f.write(str(params).replace(",", "\n"))
            f.write("\n\n ============= Details ========== \n"
                    + str(params.get('details', '')))


def log_line(params: Dict[str, Any], line: str, all_ranks: bool = False) -> None:
    if is_rank0(params) or all_ranks:
        lf = params.get('log_file')
        if lf and lf != "None":
            with open(lf, 'a') as f:
                f.write(line + "\n")
        print(line, flush=True)
