"""Generate crct_tpu/configs/language_weights.json.

The reference gives text-stream ("language") parameters the ``lr`` learning
rate and everything else ``image_lr``, keyed by an explicit 214-entry list of
torch parameter names (CRCT/config/language_weights.json, consumed at
CRCT/utils.py:228-249). This script maps every entry of that list through
the checkpoint converter's key mapping into the flax param tree and writes
the resulting leaf paths (slash-joined) — the framework's own partition
artifact, consumed by crct_tpu.train.optimizer.

Run (needs the reference checkout):
    python tools/gen_language_weights.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crct_tpu.utils.convert import convert_torch_state_dict  # noqa: E402

REF_LIST = "/root/reference/CRCT/config/language_weights.json"
OUT = os.path.join(REPO, "crct_tpu", "configs", "language_weights.json")


def flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from flatten(v, prefix + (k,))
        else:
            yield prefix + (k,)


def main() -> None:
    with open(REF_LIST) as f:
        torch_keys = json.load(f)
    # dummy tensors: the converter only reshapes/transposes values, the key
    # mapping is what we want. 2-D works for every Linear/Embedding/LN entry.
    sd = {k: np.zeros((2, 2), np.float32) for k in torch_keys}
    tree, skipped = convert_torch_state_dict(sd)
    paths = sorted("/".join(p) for p in flatten(tree))
    with open(OUT, "w") as f:
        json.dump(paths, f, indent=1)
    print(f"wrote {len(paths)} flax paths ({len(skipped)} reference-only "
          f"entries skipped: legacy heads absent from the rebuilt tree)")
    for s in sorted(set(k.rsplit(".", 1)[0] for k in skipped))[:20]:
        print("  skipped:", s)


if __name__ == "__main__":
    main()
