"""One-shot converter: published torch crct.ckpt -> crct_tpu orbax checkpoint.

Usage:
    python -m crct_tpu.cli.convert_checkpoint crct.ckpt out_dir/crct_tpu.ckpt \
        [--model-config config/vilbert.json]

The output loads through ``-start_checkpoint`` exactly like a
framework-native checkpoint (transfer mode), reproducing the published
weights (BASELINE.md: "published weights reproduce").
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="torch .ckpt path")
    parser.add_argument("dst", help="output checkpoint directory")
    parser.add_argument("--report", action="store_true",
                        help="print per-key conversion report")
    args = parser.parse_args(argv)

    from crct_tpu.utils.checkpoint import save_checkpoint
    from crct_tpu.utils.convert import (convert_torch_state_dict,
                                        load_torch_checkpoint)

    sd = load_torch_checkpoint(args.src)
    tree, skipped = convert_torch_state_dict(sd)
    n_converted = sum(1 for _ in _iter_leaves(tree))
    print(f"converted {n_converted} tensors; skipped {len(skipped)} "
          f"legacy/unused keys")
    if args.report:
        for k in skipped:
            print(f"  skipped: {k}")
    save_checkpoint(args.dst, tree, opt_state=None, iter_id=0)
    print(f"wrote {args.dst}")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
