"""Published-checkpoint converter: torch ``crct.ckpt`` -> flax param tree.

The reference ships PyTorch checkpoints whose state_dict keys follow the
``bert_pretrained.*`` layout (CRCT/backbone/encoder_decorator.py:9-17,
vilbert.py:1499-1537). This module maps every forward-relevant tensor onto
the crct_tpu tree (Linear weights transposed to flax [in, out] kernels;
LayerNorm weight->scale; Embedding weight->embedding). Legacy heads that the
reference never uses at inference (cls.predictions LM head,
cls.imagePredictions, biOutput.q_dense*, v_embeddings.type_embeddings) are
skipped, mirroring the reference's own key-intersection load
(train.py:97-102).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

PREFIXES = ("bert_pretrained.", "module.bert_pretrained.")

# state_dict keys that exist in the torch model but are not part of the
# inference/training graph we rebuild
SKIPPED_PATTERNS = [
    r"^cls\.predictions\.",            # tied LM head (returns None, vilbert.py:1059)
    r"^cls\.imagePredictions\.",       # masked-image head (loss hard-zeroed)
    r"\.q_dense1\.", r"\.q_dense2\.",  # defined but unused in BertBiOutput
    r"^bert\.v_embeddings\.type_embeddings\.",  # unused 13-way embedding
    r"^bert\.v_embeddings\.sep_emb\.",          # figure_qa-only, unused in fwd
    r"^inconsistency_head\.",
    # plain HF BERT checkpoints (bert-base-uncased init path):
    r"^bert\.embeddings\.token_type_embeddings",  # type emb replaced by the
                                                  # 12-way chart-element emb
    r"^bert\.embeddings\.position_ids$",          # buffer, not a weight
    r"^bert\.pooler\.",                           # HF pooler unused
    r"^cls\.seq_relationship\.",                  # HF NSP head (bi_ head used)
]


def _strip_prefix(key: str) -> str:
    for p in PREFIXES:
        if key.startswith(p):
            return key[len(p):]
    return key


def _linear(dst: Dict, path: Tuple[str, ...], weight=None, bias=None):
    node = dst
    for k in path:
        node = node.setdefault(k, {})
    if weight is not None:
        node["kernel"] = np.asarray(weight).T
    if bias is not None:
        node["bias"] = np.asarray(bias)


def _layernorm(dst: Dict, path: Tuple[str, ...], weight=None, bias=None):
    node = dst
    for k in path:
        node = node.setdefault(k, {})
    if weight is not None:
        node["scale"] = np.asarray(weight)
    if bias is not None:
        node["bias"] = np.asarray(bias)


def _embed(dst: Dict, path: Tuple[str, ...], weight):
    node = dst
    for k in path:
        node = node.setdefault(k, {})
    node["embedding"] = np.asarray(weight)


_TXT_EMB = {
    "word_embeddings": "word_embeddings",
    "position_embeddings": "position_embeddings",
    "plotqa_type_embeddings": "plotqa_type_embeddings",
}
_LAYER_SUB = {
    # torch BertLayer submodule -> (flax module path, kind)
    "attention.self.query": (("attention", "query"), "linear"),
    "attention.self.key": (("attention", "key"), "linear"),
    "attention.self.value": (("attention", "value"), "linear"),
    "attention.output.dense": (("attention", "out"), "linear"),
    "attention.output.LayerNorm": (("attention", "out_ln"), "ln"),
    "intermediate.dense": (("ffn", "inter"), "linear"),
    "output.dense": (("ffn", "out"), "linear"),
    "output.LayerNorm": (("ffn", "out_ln"), "ln"),
}
_CONN_SUB = {
    "biattention.query1": (("biattention", "v_query"), "linear"),
    "biattention.key1": (("biattention", "v_key"), "linear"),
    "biattention.value1": (("biattention", "v_value"), "linear"),
    "biattention.query2": (("biattention", "t_query"), "linear"),
    "biattention.key2": (("biattention", "t_key"), "linear"),
    "biattention.value2": (("biattention", "t_value"), "linear"),
    "biOutput.dense1": (("v_dense",), "linear"),
    "biOutput.LayerNorm1": (("v_ln",), "ln"),
    "biOutput.dense2": (("t_dense",), "linear"),
    "biOutput.LayerNorm2": (("t_ln",), "ln"),
    "v_intermediate.dense": (("v_ffn", "inter"), "linear"),
    "v_output.dense": (("v_ffn", "out"), "linear"),
    "v_output.LayerNorm": (("v_ffn", "out_ln"), "ln"),
    "t_intermediate.dense": (("t_ffn", "inter"), "linear"),
    "t_output.dense": (("t_ffn", "out"), "linear"),
    "t_output.LayerNorm": (("t_ffn", "out_ln"), "ln"),
}
# MLP pipes: torch Sequential index -> flax dense index
_PIPE_IDX = {0: 0, 2: 1, 4: 2, 6: 3}


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Tuple[Dict, List[str]]:
    """Convert a reference state_dict into a nested flax-style param dict.

    Returns (tree, skipped_keys). Tensors must be numpy-convertible (call
    ``.numpy()`` on torch tensors before passing, or pass torch tensors —
    np.asarray handles CPU tensors).
    """
    tree: Dict[str, Any] = {}
    pending: Dict[str, Dict[str, Any]] = {}
    skipped: List[str] = []

    for full_key, value in state_dict.items():
        key = _strip_prefix(full_key)
        if any(re.search(p, key) for p in SKIPPED_PATTERNS):
            skipped.append(full_key)
            continue
        base, _, param = key.rpartition(".")
        # old TF-era naming: gamma/beta -> weight/bias (vilbert.py:1150-1285)
        param = {"gamma": "weight", "beta": "bias"}.get(param, param)
        pending.setdefault(base, {})[param] = np.asarray(value)

    for base, params in pending.items():
        w, b = params.get("weight"), params.get("bias")
        if _convert_one(tree, base, w, b):
            continue
        skipped.append(base)
    return tree, skipped


def _convert_one(tree: Dict, base: str, w, b) -> bool:
    # --- text embeddings ------------------------------------------------
    m = re.match(r"^bert\.embeddings\.(\w+)$", base)
    if m:
        name = m.group(1)
        if name in _TXT_EMB:
            _embed(tree, ("bert", "embeddings", _TXT_EMB[name]), w)
            return True
        if name == "txt_location_embeddings":
            _linear(tree, ("bert", "embeddings", "txt_location_embeddings"), w, b)
            return True
        if name == "LayerNorm":
            _layernorm(tree, ("bert", "embeddings", "LayerNorm"), w, b)
            return True
        return False
    # --- image embeddings -----------------------------------------------
    m = re.match(r"^bert\.v_embeddings\.(\w+)$", base)
    if m:
        name = m.group(1)
        if name in ("new_image_embeddings", "new_loc_emb"):
            _linear(tree, ("bert", "v_embeddings", name), w, b)
            return True
        if name == "areas_emp":
            _linear(tree, ("bert", "v_embeddings", "areas_emb"), w, b)
            return True
        if name == "color_emb":
            _embed(tree, ("bert", "v_embeddings", "color_emb"), w)
            return True
        if name == "LayerNorm":
            _layernorm(tree, ("bert", "v_embeddings", "LayerNorm"), w, b)
            return True
        return False
    # --- encoder layers ---------------------------------------------------
    m = re.match(r"^bert\.encoder\.(layer|v_layer|c_layer)\.(\d+)\.(.+)$", base)
    if m:
        kind, idx, sub = m.group(1), int(m.group(2)), m.group(3)
        if kind == "c_layer":
            if sub not in _CONN_SUB:
                return False
            path, ptype = _CONN_SUB[sub]
            full = ("bert", "encoder", f"c_layer_{idx}") + path
        else:
            if sub not in _LAYER_SUB:
                return False
            path, ptype = _LAYER_SUB[sub]
            prefix = "t_layer_" if kind == "layer" else "v_layer_"
            full = ("bert", "encoder", f"{prefix}{idx}") + path
        (_linear if ptype == "linear" else _layernorm)(tree, full, w, b)
        return True
    # --- poolers ----------------------------------------------------------
    m = re.match(r"^bert\.(t_pooler|v_pooler)\.dense$", base)
    if m:
        _linear(tree, ("bert", m.group(1), "dense"), w, b)
        return True
    # --- NSP head ---------------------------------------------------------
    if base == "cls.bi_seq_relationship":
        _linear(tree, ("cls", "bi_seq_relationship"), w, b)
        return True
    # --- regressor pipes ----------------------------------------------------
    m = re.match(r"^regressor\.(txt_pipe|vis_pipe|fusion|ce_fusion)\.(\d+)$", base)
    if m:
        pipe, idx = m.group(1), int(m.group(2))
        if pipe in ("txt_pipe", "vis_pipe"):
            _linear(tree, ("regressor", pipe, f"dense_{_PIPE_IDX[idx]}"), w, b)
            return True
        # fusion Sequential: 0,2,4 -> fusion_hidden dense_0..2; 6 -> fusion_out
        if idx in (0, 2, 4):
            _linear(tree, ("regressor", "fusion_hidden",
                           f"dense_{_PIPE_IDX[idx]}"), w, b)
        else:
            _linear(tree, ("regressor", "fusion_out"), w, b)
        return True
    return False


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .ckpt (torch.save dict) on CPU and return the
    model_state_dict with numpy values."""
    import torch
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    sd = loaded.get("model_state_dict", loaded)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def inverse_convert(flax_params: Dict[str, Any],
                    ce_reg: bool = False) -> Dict[str, np.ndarray]:
    """flax tree -> torch-style state_dict (testing / export utility)."""
    out: Dict[str, np.ndarray] = {}

    def emit_linear(torch_base, node):
        out[f"bert_pretrained.{torch_base}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            out[f"bert_pretrained.{torch_base}.bias"] = np.asarray(node["bias"])

    def emit_ln(torch_base, node):
        out[f"bert_pretrained.{torch_base}.weight"] = np.asarray(node["scale"])
        out[f"bert_pretrained.{torch_base}.bias"] = np.asarray(node["bias"])

    def emit_embed(torch_base, node):
        out[f"bert_pretrained.{torch_base}.weight"] = np.asarray(node["embedding"])

    emb = flax_params["bert"]["embeddings"]
    for flax_name, torch_name in _TXT_EMB.items():
        emit_embed(f"bert.embeddings.{torch_name}", emb[flax_name])
    emit_linear("bert.embeddings.txt_location_embeddings",
                emb["txt_location_embeddings"])
    emit_ln("bert.embeddings.LayerNorm", emb["LayerNorm"])

    vemb = flax_params["bert"]["v_embeddings"]
    emit_linear("bert.v_embeddings.new_image_embeddings",
                vemb["new_image_embeddings"])
    emit_linear("bert.v_embeddings.new_loc_emb", vemb["new_loc_emb"])
    emit_embed("bert.v_embeddings.color_emb", vemb["color_emb"])
    emit_ln("bert.v_embeddings.LayerNorm", vemb["LayerNorm"])
    if "areas_emb" in vemb:
        emit_linear("bert.v_embeddings.areas_emp", vemb["areas_emb"])

    enc = flax_params["bert"]["encoder"]
    inv_layer = {v[0]: (k, v[1]) for k, v in _LAYER_SUB.items()}
    inv_conn = {v[0]: (k, v[1]) for k, v in _CONN_SUB.items()}
    for name, layer in enc.items():
        if name.startswith(("t_layer_", "v_layer_")):
            idx = name.split("_")[-1]
            kind = "layer" if name.startswith("t_") else "v_layer"
            for path, (torch_sub, ptype) in inv_layer.items():
                node = layer
                for k in path:
                    node = node[k]
                base = f"bert.encoder.{kind}.{idx}.{torch_sub}"
                (emit_linear if ptype == "linear" else emit_ln)(base, node)
        elif name.startswith("c_layer_"):
            idx = name.split("_")[-1]
            for path, (torch_sub, ptype) in inv_conn.items():
                node = layer
                for k in path:
                    node = node[k]
                base = f"bert.encoder.c_layer.{idx}.{torch_sub}"
                (emit_linear if ptype == "linear" else emit_ln)(base, node)

    emit_linear("bert.t_pooler.dense", flax_params["bert"]["t_pooler"]["dense"])
    emit_linear("bert.v_pooler.dense", flax_params["bert"]["v_pooler"]["dense"])
    emit_linear("cls.bi_seq_relationship",
                flax_params["cls"]["bi_seq_relationship"])

    if "regressor" in flax_params:
        reg = flax_params["regressor"]
        inv_pipe = {v: k for k, v in _PIPE_IDX.items()}
        for pipe in ("txt_pipe", "vis_pipe"):
            for dname, node in reg[pipe].items():
                di = int(dname.split("_")[-1])
                emit_linear(f"regressor.{pipe}.{inv_pipe[di]}", node)
        fusion_name = "ce_fusion" if ce_reg else "fusion"
        for dname, node in reg["fusion_hidden"].items():
            di = int(dname.split("_")[-1])
            emit_linear(f"regressor.{fusion_name}.{inv_pipe[di]}", node)
        emit_linear(f"regressor.{fusion_name}.6", reg["fusion_out"])
    return out
