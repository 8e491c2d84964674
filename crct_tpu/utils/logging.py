"""Rank-gated run logging (reference CRCT/utils.py:32-47)."""

from __future__ import annotations

import os
from time import gmtime, strftime
from typing import Any, Dict


def init_log_file(params: Dict[str, Any]) -> None:
    os.makedirs(params['save_path'], exist_ok=True)
    params['log_file'] = os.path.join(
        params['save_path'], strftime('%d-%b-%y-%X-%a', gmtime()) + ".txt")
    if params.get('rank', 0) == 0:
        with open(params['log_file'], 'w') as f:
            f.write(str(params).replace(",", "\n"))
            f.write("\n\n ============= Details ========== \n"
                    + str(params.get('details', '')))


def log_line(params: Dict[str, Any], line: str, all_ranks: bool = False) -> None:
    if params.get('rank', 0) == 0 or all_ranks:
        lf = params.get('log_file')
        if lf and lf != "None":
            with open(lf, 'a') as f:
                f.write(line + "\n")
        print(line, flush=True)
