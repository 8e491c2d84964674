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
    # from a Google-released TensorFlow checkpoint (bert_model.ckpt prefix;
    # the reference's from_tf path, vilbert.py:48-108)
    python -m crct_tpu.cli.import_bert tf:uncased_L-12/bert_model.ckpt out/b
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


def tf_state_dict(ckpt_prefix: str):
    """Read a Google-released TensorFlow BERT checkpoint and emit the
    torch-style state dict ``convert_torch_state_dict`` consumes — the
    reference's ``load_tf_weights_in_bert`` path (vilbert.py:48-108):
    optimizer slots skipped, ``layer_N``->``layer.N``, kernel->weight with
    transpose (TF stores dense kernels [in, out]), gamma/beta->weight/bias,
    bare ``*_embeddings`` tables get the ``.weight`` suffix."""
    import re

    import numpy as np
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_prefix)
    sd = {}
    for name in sorted(reader.get_variable_to_shape_map()):
        if any(p in ("adam_v", "adam_m", "global_step")
               for p in name.split("/")):
            continue                    # optimizer slots (vilbert.py:62-66)
        arr = np.asarray(reader.get_tensor(name))
        parts = []
        for piece in name.split("/"):
            m = re.fullmatch(r"layer_(\d+)", piece)
            parts.append(f"layer.{m.group(1)}" if m else piece)
        last = parts[-1]
        if last == "kernel":
            parts[-1], arr = "weight", arr.T
        elif last in ("gamma", "output_weights"):
            parts[-1] = "weight"
        elif last in ("beta", "output_bias"):
            parts[-1] = "bias"
        elif last.endswith("_embeddings"):
            parts.append("weight")      # vilbert.py:101-102
        sd[".".join(parts)] = arr
    return sd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src", help="HF pytorch_model.bin / torch state dict, "
                               "hf:<model-name> to pull through the "
                               "transformers cache, or tf:<ckpt-prefix> / a "
                               "TF checkpoint prefix (<prefix>.index exists) "
                               "for Google-released TensorFlow checkpoints")
    p.add_argument("dst", help="output checkpoint directory")
    args = p.parse_args(argv)

    import os

    from crct_tpu.utils.checkpoint import save_checkpoint
    from crct_tpu.utils.convert import (convert_torch_state_dict,
                                        load_torch_checkpoint)

    if args.src.startswith("hf:"):
        sd = hf_state_dict(args.src[3:])
    elif args.src.startswith("tf:") or os.path.exists(args.src + ".index"):
        sd = tf_state_dict(args.src[3:] if args.src.startswith("tf:")
                           else args.src)
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
