"""Pretrained detector weight importer: torch/Detectron2 -> flax tree.

The reference detector starts from the Detectron2 model-zoo COCO checkpoint
(``mask_rcnn_R_50_FPN_1x``, Detector/frcnn.py:215) and fine-tunes on chart
data. This module maps either key layout onto the crct_tpu detector tree:

  * **Detectron2** (full Mask R-CNN): ``backbone.bottom_up.res*``,
    ``backbone.fpn_*``, ``proposal_generator.rpn_head.*``,
    ``roi_heads.{box_head,box_predictor,mask_head}.*`` — the model-zoo
    ``.pkl`` files (``{"model": {key: ndarray}}``) and ``.pth`` state dicts.
  * **torchvision ResNet** (backbone only): ``conv1/bn1/layer{1..4}``.

Transforms: conv OIHW -> flax HWIO; ConvTranspose (IOHW) -> HWIO;
Dense (out,in) -> (in,out); BatchNorm running stats -> FrozenBN
scale/bias/mean/var params; the box-head fc1 input permutation from
torch's flattened (C,H,W) RoI layout to flax's (H,W,C).

NOTE Detectron2 model-zoo ResNets put the stride-2 on the 1x1 conv
(``STRIDE_IN_1X1=True``, Caffe2 heritage); torchvision puts it on the 3x3.
The converter reports which convention the weights need via the returned
``meta["stride_in_1x1"]`` — construct the model with that flag.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _conv(node: Dict, name: str, w=None, b=None) -> None:
    d = node.setdefault(name, {})
    if w is not None:
        d["kernel"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
    if b is not None:
        d["bias"] = np.asarray(b)


def _deconv(node: Dict, name: str, w=None, b=None) -> None:
    d = node.setdefault(name, {})
    if w is not None:
        # torch ConvTranspose2d weight: (in, out, kH, kW) -> (kH, kW, in, out),
        # PLUS a spatial flip: torch's ConvTranspose scatters the kernel as-is
        # while flax's ConvTranspose(transpose_kernel=False) runs a fractionally
        # strided *convolution*, which mirrors the taps. Without [::-1, ::-1]
        # every stride-2 output 2x2 block comes out point-mirrored
        # (verified by impulse response; pinned in test_detector_convert).
        d["kernel"] = np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]
    if b is not None:
        d["bias"] = np.asarray(b)


def _dense(node: Dict, name: str, w=None, b=None) -> None:
    d = node.setdefault(name, {})
    if w is not None:
        d["kernel"] = np.asarray(w).T
    if b is not None:
        d["bias"] = np.asarray(b)


def _bn(node: Dict, name: str, stats: Dict[str, Any]) -> None:
    d = node.setdefault(name, {})
    if "weight" in stats:
        d["scale"] = np.asarray(stats["weight"])
    if "bias" in stats:
        d["bias"] = np.asarray(stats["bias"])
    if "running_mean" in stats:
        d["mean"] = np.asarray(stats["running_mean"])
    if "running_var" in stats:
        d["var"] = np.asarray(stats["running_var"])


def _group_params(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """'a.b.weight' -> {'a.b': {'weight': v}} (drops num_batches_tracked)."""
    out: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        base, _, leaf = k.rpartition(".")
        if leaf == "num_batches_tracked":
            continue
        out.setdefault(base, {})[leaf] = v
    return out


def _fc1_kernel_from_torch(w: np.ndarray, spatial: int = 7,
                           channels: int = 256) -> np.ndarray:
    """box_head fc1: torch flattens RoI features as (C, H, W); flax as
    (H, W, C). Permute the input dimension accordingly."""
    w = np.asarray(w)
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, spatial, spatial)
    w = np.transpose(w, (2, 3, 1, 0))           # (H, W, C, out)
    return w.reshape(spatial * spatial * channels, out_dim)


def convert_detector_state_dict(sd: Dict[str, Any]
                                ) -> Tuple[Dict, List[str], Dict[str, Any]]:
    """Convert a torch/Detectron2 detector state_dict.

    Returns (flax tree fragment, unmapped keys, meta). The tree mirrors
    MaskRCNN's param layout; load with utils.checkpoint.transfer_params so
    class-count-dependent heads (cls_score/bbox_pred/mask predictor) are
    skipped automatically when shapes differ.
    """
    groups = _group_params(sd)
    detectron2 = any(k.startswith(("backbone.bottom_up", "roi_heads."))
                     for k in groups)
    tree: Dict[str, Any] = {}
    skipped: List[str] = []
    for base, p in groups.items():
        if not _convert_group(tree, base, p):
            skipped.append(base)
    if detectron2 and "stem_conv" in tree.get("backbone", {}):
        # Caffe2-heritage zoo weights expect BGR input; flipping the stem
        # conv's input channels makes the converted model consume RGB like
        # the rest of the pipeline
        k = tree["backbone"]["stem_conv"]["kernel"]     # HWIO
        tree["backbone"]["stem_conv"]["kernel"] = k[:, :, ::-1, :].copy()
    meta = _layout_meta(detectron2)
    meta["depth"] = _depth_from_keys(sd)
    return tree, skipped, meta


def _layout_meta(detectron2: bool) -> Dict[str, Any]:
    """Model-build + preprocessing facts implied by a weights layout.
    Caffe2-heritage Detectron2 zoo models: stride-in-1x1 blocks and
    mean-subtraction-only normalization (std 1; means here in RGB order
    since the converter flips the stem to RGB). torchvision layout keeps
    the ImageNet mean/std convention."""
    if detectron2:
        return {"stride_in_1x1": True,
                "pixel_mean": [123.675, 116.28, 103.53],
                "pixel_std": [1.0, 1.0, 1.0],
                "depth": None}
    return {"stride_in_1x1": False,
            "pixel_mean": [123.675, 116.28, 103.53],
            "pixel_std": [58.395, 57.12, 57.375],
            "depth": None}


def _depth_from_keys(sd) -> Any:
    """Derive the ResNet trunk depth from a torch state dict's stage-3
    block count (R50: blocks 0-5, R101: 0-22); None when unrecognized."""
    import re
    mx = -1
    for k in sd:
        m = re.search(r"(?:res4|layer3)\.(\d+)\.", k)
        if m:
            mx = max(mx, int(m.group(1)))
    return {5: 50, 22: 101}.get(mx)


def _resnet_dest(tree: Dict) -> Dict:
    return tree.setdefault("backbone", {})


_D2_RES = re.compile(r"^backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)$")
_D2_RES_NORM = re.compile(
    r"^backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)\.norm$")
_TV_LAYER = re.compile(r"^layer(\d)\.(\d+)\.(conv\d|bn\d|downsample\.[01])$")
_FPN = re.compile(r"^backbone\.fpn_(lateral|output)(\d)$")


def _convert_group(tree: Dict, base: str, p: Dict[str, Any]) -> bool:
    w, b = p.get("weight"), p.get("bias")

    # ---------------- Detectron2 layout ----------------
    if base == "backbone.bottom_up.stem.conv1":
        _conv(_resnet_dest(tree), "stem_conv", w)
        return True
    if base == "backbone.bottom_up.stem.conv1.norm":
        _bn(_resnet_dest(tree), "stem_bn", p)
        return True
    m = _D2_RES_NORM.match(base)
    if m:
        stage, block, conv = int(m.group(1)), int(m.group(2)), m.group(3)
        blk = _resnet_dest(tree).setdefault(f"stage{stage}_block{block}", {})
        _bn(blk, "shortcut_bn" if conv == "shortcut" else
            conv.replace("conv", "bn"), p)
        return True
    m = _D2_RES.match(base)
    if m:
        stage, block, conv = int(m.group(1)), int(m.group(2)), m.group(3)
        blk = _resnet_dest(tree).setdefault(f"stage{stage}_block{block}", {})
        _conv(blk, conv, w, b)
        return True
    m = _FPN.match(base)
    if m:
        kind, level = m.group(1), int(m.group(2))
        _conv(tree.setdefault("fpn", {}), f"{kind}{level}", w, b)
        return True
    if base == "proposal_generator.rpn_head.conv":
        _conv(tree.setdefault("rpn_head", {}), "conv", w, b)
        return True
    if base == "proposal_generator.rpn_head.objectness_logits":
        _conv(tree.setdefault("rpn_head", {}), "objectness", w, b)
        return True
    if base == "proposal_generator.rpn_head.anchor_deltas":
        _conv(tree.setdefault("rpn_head", {}), "deltas", w, b)
        return True
    if base in ("roi_heads.box_head.fc1", "roi_heads.box_head.fc2"):
        node = tree.setdefault("box_head", {})
        name = base.rsplit(".", 1)[-1]
        if name == "fc1" and w is not None:
            d = node.setdefault("fc1", {})
            d["kernel"] = _fc1_kernel_from_torch(w)
            if b is not None:
                d["bias"] = np.asarray(b)
        else:
            _dense(node, name, w, b)
        return True
    if base in ("roi_heads.box_predictor.cls_score",
                "roi_heads.box_predictor.bbox_pred"):
        _dense(tree.setdefault("box_predictor", {}),
               base.rsplit(".", 1)[-1], w, b)
        return True
    m = re.match(r"^roi_heads\.mask_head\.mask_fcn(\d)$", base)
    if m:
        _conv(tree.setdefault("mask_head", {}), f"mask_fcn{m.group(1)}", w, b)
        return True
    if base == "roi_heads.mask_head.deconv":
        _deconv(tree.setdefault("mask_head", {}), "deconv", w, b)
        return True
    if base == "roi_heads.mask_head.predictor":
        _conv(tree.setdefault("mask_head", {}), "predictor", w, b)
        return True

    # ---------------- torchvision ResNet layout ----------------
    if base == "conv1":
        _conv(_resnet_dest(tree), "stem_conv", w)
        return True
    if base == "bn1":
        _bn(_resnet_dest(tree), "stem_bn", p)
        return True
    m = _TV_LAYER.match(base)
    if m:
        layer, block, sub = int(m.group(1)), int(m.group(2)), m.group(3)
        blk = _resnet_dest(tree).setdefault(f"stage{layer + 1}_block{block}", {})
        if sub.startswith("conv"):
            _conv(blk, sub, w, b)
        elif sub.startswith("bn"):
            _bn(blk, sub, p)
        elif sub == "downsample.0":
            _conv(blk, "shortcut", w, b)
        else:                                    # downsample.1
            _bn(blk, "shortcut_bn", p)
        return True
    return False


# last-loaded weights file, keyed by (abspath, mtime): detector_file_meta
# runs before model construction and restore_detector_params right after —
# without this the multi-hundred-MB file deserializes twice per CLI start
_LOAD_CACHE: Dict[Tuple[str, float], Any] = {}


def _cached(path: str, loader):
    key = (os.path.abspath(path), os.path.getmtime(path))
    if key not in _LOAD_CACHE:
        _LOAD_CACHE.clear()
        _LOAD_CACHE[key] = loader()
    return _LOAD_CACHE[key]


def load_detector_torch_file(path: str) -> Dict[str, Any]:
    """Load a Detectron2 model-zoo ``.pkl`` ({"model": {...}}) or a torch
    ``.pth``/``.bin`` state dict, returning {key: np.ndarray} (cached for
    the meta-probe + restore double read)."""
    return _cached(path, lambda: _load_detector_torch_file(path))


def _load_detector_torch_file(path: str) -> Dict[str, Any]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
    else:
        import torch
        data = torch.load(path, map_location="cpu", weights_only=False)
        sd = data.get("model", data.get("state_dict",
                                        data.get("model_state_dict", data)))
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in sd.items() if hasattr(v, "shape") or
            isinstance(v, (list, tuple, np.ndarray))}


def detector_file_meta(path: str) -> Dict[str, Any]:
    """Meta for a weights file BEFORE the model is constructed — the stride
    convention must inform the ResNet build and the pixel normalization
    must match the weights' training convention (see _layout_meta), not be
    guessed from the file extension (torchvision ``.pth`` backbones need
    stride-on-3x3 + ImageNet std, Detectron2 ``.pth``/``.pkl`` need
    stride-in-1x1 + mean-only)."""
    if not path:
        return _layout_meta(False)
    if not path.endswith((".pkl", ".pth", ".bin")):
        # crct_tpu detector checkpoints persist the convention they were
        # trained with (save path: cli/detector_train.py) — a fine-tune
        # from Detectron2 zoo weights must extract with the same stride +
        # normalization or features are silently garbage
        try:
            from crct_tpu.utils.checkpoint import load_checkpoint
            loaded = _cached(path, lambda: load_checkpoint(path))
            m = loaded.get("detector_meta")
            if m is not None:
                return {"stride_in_1x1": bool(np.asarray(m["stride_in_1x1"])),
                        "pixel_mean": [float(x) for x in
                                       np.asarray(m["pixel_mean"])],
                        "pixel_std": [float(x) for x in
                                      np.asarray(m["pixel_std"])],
                        # older checkpoints predate depth persistence
                        "depth": int(np.asarray(m["depth"]))
                        if "depth" in m else None}
        except (FileNotFoundError, KeyError, ValueError, OSError) as e:
            # do NOT silently fall back on a corrupt/unreadable fine-tuned
            # checkpoint — that is exactly the silent-garbage-features
            # failure mode; name the path and the convention we fell to
            print(f"detector_file_meta: probe of {path!r} failed ({e!r}); "
                  "falling back to torchvision stride/normalization")
        return _layout_meta(False)
    sd = load_detector_torch_file(path)
    detectron2 = any(k.startswith(("backbone.bottom_up", "roi_heads."))
                     for k in sd)
    meta = _layout_meta(detectron2)
    meta["depth"] = _depth_from_keys(sd)
    return meta


def restore_detector_params(init_params: Any, path: str,
                            verbose: bool = True) -> Tuple[Any, Dict[str, Any]]:
    """Restore detector params from either a crct_tpu checkpoint or a
    torch/Detectron2 file (sniffed by content). Returns (params, meta)."""
    from crct_tpu.utils.checkpoint import load_checkpoint, transfer_params

    if path.endswith((".pkl", ".pth", ".bin")):
        sd = load_detector_torch_file(path)
        tree, skipped, meta = convert_detector_state_dict(sd)
        if verbose and skipped:
            print(f"detector import: {len(skipped)} source keys unmapped "
                  f"(e.g. {skipped[:3]})")
        params, n = transfer_params(init_params, tree, verbose=verbose)
        return params, meta
    loaded = _cached(path, lambda: load_checkpoint(path))
    params, _ = transfer_params(init_params,
                                loaded.get("model_state_dict", loaded),
                                verbose=verbose)
    return params, detector_file_meta(path)
