"""Import plain BERT weights into the text stream (pretrained init).

Replaces the reference's bert-base-uncased download + key remap
(CRCT/backbone/vilbert.py:1112-1285): takes a local HF-style
``pytorch_model.bin`` (or any torch state dict with ``bert.embeddings.* /
bert.encoder.layer.*`` keys, old gamma/beta naming included) and writes a
crct_tpu checkpoint whose text-stream weights are the BERT ones. Loaded
through ``-start_checkpoint`` in transfer mode, the remaining (vision /
co-attention / heads) parameters keep their fresh initialization — exactly
the reference's from_pretrained behavior.

Usage:
    # from a local file
    python -m crct_tpu.cli.import_bert pytorch_model.bin out/bert_init.ckpt
    # from the HF hub (downloads + caches via transformers, like the
    # reference's cached_path; works offline once cached)
    python -m crct_tpu.cli.import_bert hf:bert-base-uncased out/bert_init.ckpt
"""

from __future__ import annotations

import argparse


def hf_state_dict(model_name: str):
    """Fetch a BERT state dict through the transformers hub cache — the
    TPU-framework equivalent of the reference's tar.gz download+cache
    (vilbert.py:1150-1285). Requires network on first use only."""
    import numpy as np
    from transformers import AutoModel
    model = AutoModel.from_pretrained(model_name)
    return {f"bert.{k}" if not k.startswith("bert.") else k:
            np.asarray(v.detach().numpy())
            for k, v in model.state_dict().items()}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src", help="HF pytorch_model.bin / torch state dict, or "
                               "hf:<model-name> to pull through the "
                               "transformers cache")
    p.add_argument("dst", help="output checkpoint directory")
    args = p.parse_args(argv)

    from crct_tpu.utils.checkpoint import save_checkpoint
    from crct_tpu.utils.convert import (convert_torch_state_dict,
                                        load_torch_checkpoint)

    if args.src.startswith("hf:"):
        sd = hf_state_dict(args.src[3:])
    else:
        sd = load_torch_checkpoint(args.src)
    tree, skipped = convert_torch_state_dict(sd)
    n = sum(1 for _ in _leaves(tree))
    print(f"imported {n} BERT tensors; skipped {len(skipped)} "
          f"(heads/pooler/type embeddings)")
    save_checkpoint(args.dst, tree)
    print(f"wrote {args.dst}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
