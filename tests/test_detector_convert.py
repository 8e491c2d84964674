"""Detector pretrained-weight importer parity tests.

A torch ResNet-50 with torchvision module names (and a Detectron2-renamed
variant, incl. the Caffe2 stride-in-1x1 convention) is random-initialized
with random BatchNorm running stats; the converter maps its state_dict into
the flax tree and the C2..C5 feature maps must match numerically — pinning
the conv OIHW->HWIO transpose, FrozenBN stat folding, stride placement,
padding and maxpool semantics. Reference init path: Detector/frcnn.py:215
(Detectron2 model zoo mask_rcnn_R_50_FPN_1x).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from crct_tpu.detector.convert import (_deconv, _fc1_kernel_from_torch,
                                       convert_detector_state_dict,
                                       restore_detector_params)
from crct_tpu.detector.resnet import ResNet
from crct_tpu.utils.checkpoint import transfer_params

BLOCKS = (3, 4, 6, 3)


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, stride_in_1x1):
        super().__init__()
        s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = tnn.Conv2d(cin, width, 1, s1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, s3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = None
        if cin != width * 4 or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4))

    def forward(self, x):
        s = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + s)


class TorchResNet50(tnn.Module):
    """torchvision-named ResNet-50 trunk returning C2..C5."""

    def __init__(self, stride_in_1x1=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
        cin = 64
        for li, (n, width) in enumerate(zip(BLOCKS, (64, 128, 256, 512))):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and li > 0) else 1
                blocks.append(TorchBottleneck(cin, width, stride,
                                              stride_in_1x1))
                cin = width * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        outs = []
        for li in range(4):
            y = getattr(self, f"layer{li + 1}")(y)
            outs.append(y)
        return outs


def randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=g)
                                     * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g)
                                    * 1.5 + 0.5)
                m.weight.copy_(torch.randn(m.num_features, generator=g) * 0.2
                               + 1.0)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def tv_to_d2_keys(sd):
    """torchvision names -> Detectron2 model-zoo names."""
    out = {}
    for k, v in sd.items():
        if k.startswith("conv1."):
            out["backbone.bottom_up.stem.conv1." + k.split(".", 1)[1]] = v
        elif k.startswith("bn1."):
            out["backbone.bottom_up.stem.conv1.norm." + k.split(".", 1)[1]] = v
        else:
            # layerL.B.convI / bnI / downsample.{0,1}
            parts = k.split(".")
            stage = f"res{int(parts[0][-1]) + 1}"
            block = parts[1]
            rest = parts[2:]
            if rest[0].startswith("conv"):
                name = f"{rest[0]}.{rest[1]}"
            elif rest[0].startswith("bn"):
                name = f"conv{rest[0][-1]}.norm.{rest[1]}"
            elif rest[:2] == ["downsample", "0"]:
                name = f"shortcut.{rest[2]}"
            else:
                name = f"shortcut.norm.{rest[2]}"
            out[f"backbone.bottom_up.{stage}.{block}.{name}"] = v
    return out


@pytest.mark.parametrize("layout,stride_in_1x1",
                         [("torchvision", False), ("detectron2", True),
                          ("detectron2", False)])
def test_resnet50_feature_map_parity(layout, stride_in_1x1):
    torch.manual_seed(3)
    tm = TorchResNet50(stride_in_1x1=stride_in_1x1).eval()
    randomize_bn_stats(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    if layout == "detectron2":
        sd = tv_to_d2_keys(sd)
    tree, skipped, meta = convert_detector_state_dict(sd)
    assert not skipped, skipped[:5]
    assert meta["stride_in_1x1"] == (layout == "detectron2")

    g = np.random.default_rng(4)
    img = g.normal(size=(1, 64, 64, 3)).astype(np.float32)
    model = ResNet(50, stride_in_1x1=stride_in_1x1)
    # converted tree must exactly cover the flax structure
    want_tree = jax.eval_shape(lambda: model.init(jax.random.key(0),
                                                  jnp.asarray(img)))
    got = model.apply({"params": tree["backbone"]}, jnp.asarray(img))
    del want_tree
    # Detectron2/Caffe2-heritage weights see BGR input; the converter flips
    # the stem conv so the flax model consumes RGB — the torch original must
    # therefore see the channel-reversed image to agree
    torch_img = img[..., ::-1].copy() if layout == "detectron2" else img
    with torch.no_grad():
        want = tm(torch.from_numpy(torch_img.transpose(0, 3, 1, 2)))
    for c_flax, c_torch in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(c_flax), c_torch.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, rtol=1e-3)


def test_fc1_input_permutation():
    """torch flattens RoI features (C,H,W); flax (H,W,C) — the converted
    fc1 kernel must produce identical outputs on identical features."""
    g = np.random.default_rng(5)
    pooled_hwc = g.normal(size=(2, 7, 7, 256)).astype(np.float32)
    w = g.normal(size=(1024, 256 * 7 * 7)).astype(np.float32) * 0.01
    want = pooled_hwc.transpose(0, 3, 1, 2).reshape(2, -1) @ w.T
    kernel = _fc1_kernel_from_torch(w)
    got = pooled_hwc.reshape(2, -1) @ kernel
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_full_detectron2_maskrcnn_transfer():
    """A synthetic full Detectron2 state dict (COCO 80-class heads) maps
    onto MaskRCNN: backbone/FPN/RPN/box_head transfer; the class-dependent
    predictor/mask-predictor heads are skipped on shape mismatch, like the
    reference's fine-tune from the zoo."""
    from crct_tpu.detector.mask_rcnn import MaskRCNN

    torch.manual_seed(6)
    tm = TorchResNet50(stride_in_1x1=True).eval()
    sd = tv_to_d2_keys({k: v.detach().numpy()
                        for k, v in tm.state_dict().items()})
    g = np.random.default_rng(7)

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = g.normal(size=(cout, cin, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = g.normal(size=(cout,)).astype(np.float32)

    for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", cin, 256, 1)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1)
    sd["roi_heads.box_head.fc1.weight"] = g.normal(
        size=(1024, 256 * 49)).astype(np.float32)
    sd["roi_heads.box_head.fc1.bias"] = g.normal(size=(1024,)).astype(np.float32)
    sd["roi_heads.box_head.fc2.weight"] = g.normal(
        size=(1024, 1024)).astype(np.float32)
    sd["roi_heads.box_head.fc2.bias"] = g.normal(size=(1024,)).astype(np.float32)
    # COCO heads: 80 classes (81 with background)
    sd["roi_heads.box_predictor.cls_score.weight"] = g.normal(
        size=(81, 1024)).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.bias"] = g.normal(
        size=(81,)).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = g.normal(
        size=(320, 1024)).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = g.normal(
        size=(320,)).astype(np.float32)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_head.deconv.weight"] = g.normal(
        size=(256, 256, 2, 2)).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = g.normal(size=(256,)).astype(np.float32)
    conv("roi_heads.mask_head.predictor", 256, 80, 1)

    tree, skipped, meta = convert_detector_state_dict(sd)
    assert not skipped
    assert meta["stride_in_1x1"]

    model = MaskRCNN(num_classes=16, with_mask=True, stride_in_1x1=True,
                     post_nms_topk_test=32)
    dummy = jnp.zeros((64, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), dummy, train=False))
    init = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype),
                        variables["params"])
    merged, n = transfer_params(init, tree, verbose=False)
    # everything but the 16-class predictor + mask predictor transfers
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(merged)[0]}
    assert np.any(flat["['backbone']['stem_conv']['kernel']"] != 0)
    assert np.any(flat["['box_head']['fc1']['kernel']"] != 0)
    assert np.any(flat["['rpn_head']['conv']['kernel']"] != 0)
    assert np.any(flat["['mask_head']['deconv']['kernel']"] != 0)
    # class-count-dependent heads skipped (shapes differ: 81 vs 17, 80 vs 16)
    assert np.all(flat["['box_predictor']['cls_score']['kernel']"] == 0)
    assert np.all(flat["['mask_head']['predictor']['kernel']"] == 0)


def test_deconv_kernel_numeric_parity():
    """The mask-head ConvTranspose import must flip the kernel spatially:
    torch's ConvTranspose2d scatters the kernel as-is while flax's
    ConvTranspose(transpose_kernel=False) convolves, mirroring the taps.
    Pins the converted kernel's output against torch on random input."""
    import flax.linen as nn

    torch.manual_seed(3)
    tdeconv = tnn.ConvTranspose2d(4, 5, 2, stride=2).eval()
    x = torch.randn(2, 4, 7, 7)
    with torch.no_grad():
        want = tdeconv(x).numpy().transpose(0, 2, 3, 1)   # NCHW -> NHWC

    node = {}
    _deconv(node, "deconv", tdeconv.weight.detach().numpy(),
            tdeconv.bias.detach().numpy())
    fdeconv = nn.ConvTranspose(5, (2, 2), (2, 2))
    got = fdeconv.apply(
        {"params": {"kernel": jnp.asarray(node["deconv"]["kernel"]),
                    "bias": jnp.asarray(node["deconv"]["bias"])}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == want.shape == (2, 14, 14, 5)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_restore_detector_params_from_pth(tmp_path):
    """--load-weights with a torch .pth file end-to-end."""
    torch.manual_seed(8)
    tm = TorchResNet50(stride_in_1x1=False).eval()
    randomize_bn_stats(tm, seed=1)
    path = tmp_path / "r50.pth"
    torch.save({"state_dict": tm.state_dict()}, path)

    model = ResNet(50)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), img)
    params, meta = restore_detector_params(
        {"backbone": variables["params"]}, str(path), verbose=False)
    assert meta["stride_in_1x1"] is False
    got = model.apply({"params": params["backbone"]}, img)
    with torch.no_grad():
        want = tm(torch.zeros(1, 3, 64, 64))
    np.testing.assert_allclose(np.asarray(got[-1]),
                               want[-1].numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-3)


def test_detector_file_meta_layouts(tmp_path):
    """The CLI-facing meta probe reports stride convention + pixel
    normalization from the weights layout, not the file extension."""
    from crct_tpu.detector.convert import detector_file_meta

    tv = {"conv1.weight": torch.zeros(64, 3, 7, 7)}
    d2 = {"backbone.bottom_up.stem.conv1.weight": torch.zeros(64, 3, 7, 7)}
    tv_path, d2_path = str(tmp_path / "tv.pth"), str(tmp_path / "d2.pth")
    torch.save(tv, tv_path)
    torch.save(d2, d2_path)

    m_tv = detector_file_meta(tv_path)
    assert not m_tv["stride_in_1x1"]
    assert m_tv["pixel_std"] == [58.395, 57.12, 57.375]

    m_d2 = detector_file_meta(d2_path)
    assert m_d2["stride_in_1x1"]
    assert m_d2["pixel_std"] == [1.0, 1.0, 1.0]

    # non-torch paths (crct checkpoints, empty) -> torchvision-style default
    assert not detector_file_meta("")["stride_in_1x1"]
    assert not detector_file_meta("x.ckpt")["stride_in_1x1"]


def test_depth_recorded_and_resolved(tmp_path):
    """Trunk depth travels with the weights: derived from torch block
    counts, persisted in crct checkpoints, and a contradicting --depth is
    an error instead of a silent half-random transfer."""
    from crct_tpu.detector.convert import detector_file_meta
    from crct_tpu.detector.extract import resolve_depth
    from crct_tpu.utils.checkpoint import save_checkpoint

    # torch layouts: stage-3 block count identifies R50 vs R101
    r50 = {f"backbone.bottom_up.res4.{i}.conv1.weight":
           torch.zeros(1, 1, 1, 1) for i in range(6)}
    r101 = {f"backbone.body.layer3.{i}.conv1.weight":
            torch.zeros(1, 1, 1, 1) for i in range(23)}
    p50, p101 = str(tmp_path / "r50.pth"), str(tmp_path / "r101.pth")
    torch.save(r50, p50)
    torch.save(r101, p101)
    assert detector_file_meta(p50)["depth"] == 50
    assert detector_file_meta(p101)["depth"] == 101

    # crct checkpoints persist the depth they were trained with
    ck = str(tmp_path / "det.ckpt")
    save_checkpoint(ck, {"w": np.zeros(1)}, extra={"detector_meta": {
        "stride_in_1x1": np.asarray(0),
        "pixel_mean": np.zeros(3, np.float32),
        "pixel_std": np.ones(3, np.float32),
        "depth": np.asarray(14)}})
    meta = detector_file_meta(ck)
    assert meta["depth"] == 14

    # resolution: file wins over the dataset rule; explicit CLI must agree
    assert resolve_depth(0, meta, "plotqa") == 14
    assert resolve_depth(14, meta, "plotqa") == 14
    assert resolve_depth(0, {"depth": None}, "figure_qa") == 101
    assert resolve_depth(0, {"depth": None}, "plotqa") == 50
    with pytest.raises(ValueError, match="does not match"):
        resolve_depth(50, meta, "plotqa", ck)


# ---------------------------------------------------------------------------
# head-level inference parity (beyond the trunk feature maps)
# ---------------------------------------------------------------------------

def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _d2_decode_all_classes(deltas, proposals, hw, weights=(10., 10., 5., 5.)):
    """Detectron2 Box2BoxTransform.apply_deltas for every class
    (detectron2 fast_rcnn inference semantics): deltas [N, K, 4],
    proposals [N, 4] -> clipped boxes [N, K, 4]."""
    w = np.maximum(proposals[:, 2] - proposals[:, 0], 1e-6)[:, None]
    h = np.maximum(proposals[:, 3] - proposals[:, 1], 1e-6)[:, None]
    cx = proposals[:, 0][:, None] + w / 2
    cy = proposals[:, 1][:, None] + h / 2
    dx = deltas[:, :, 0] / weights[0]
    dy = deltas[:, :, 1] / weights[1]
    clamp = np.log(1000.0 / 16)
    dw = np.minimum(deltas[:, :, 2] / weights[2], clamp)
    dh = np.minimum(deltas[:, :, 3] / weights[3], clamp)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    out = np.stack([pcx - pw / 2, pcy - ph / 2,
                    pcx + pw / 2, pcy + ph / 2], axis=-1)
    out[..., 0::2] = np.clip(out[..., 0::2], 0, hw[1])
    out[..., 1::2] = np.clip(out[..., 1::2], 0, hw[0])
    return out


def _np_greedy_nms(boxes, scores, iou_thr):
    """torchvision.ops.nms semantics: sort desc, suppress IoU > thr."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        lt = np.maximum(boxes[i, :2], boxes[rest, :2])
        rb = np.minimum(boxes[i, 2:], boxes[rest, 2:])
        whs = np.maximum(rb - lt, 0)
        inter = whs[:, 0] * whs[:, 1]
        a_i = max(boxes[i, 2] - boxes[i, 0], 0) * max(boxes[i, 3] - boxes[i, 1], 0)
        a_r = (np.maximum(boxes[rest, 2] - boxes[rest, 0], 0)
               * np.maximum(boxes[rest, 3] - boxes[rest, 1], 0))
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[iou <= iou_thr]
    return np.asarray(keep, np.int64)


def _d2_reference_box_inference(feats, sd, proposals, hw, K,
                                score_thresh=0.5, nms_thresh=0.5, topk=100):
    """Detectron2 FastRCNNOutputLayers.inference reimplemented in numpy
    (fast_rcnn_inference_single_image): softmax scores, per-(row, class)
    threshold, per-class decode + clip, class-aware NMS, top-k.
    Returns (rows, classes, scores, boxes) sorted by descending score."""
    scores = feats @ sd["roi_heads.box_predictor.cls_score.weight"].T \
        + sd["roi_heads.box_predictor.cls_score.bias"]
    probs = _np_softmax(scores)[:, :K]              # drop background column
    deltas = (feats @ sd["roi_heads.box_predictor.bbox_pred.weight"].T
              + sd["roi_heads.box_predictor.bbox_pred.bias"]).reshape(-1, K, 4)
    boxes = _d2_decode_all_classes(deltas, proposals, hw)
    rows, cls = np.nonzero(probs > score_thresh)
    b = boxes[rows, cls]
    s = probs[rows, cls]
    # class-aware NMS via the coordinate-offset trick
    off = cls[:, None].astype(np.float64) * (max(hw) + 10.0)
    keep = _np_greedy_nms(b + off, s, nms_thresh)[:topk]
    order = keep[np.argsort(-s[keep], kind="stable")]
    return rows[order], cls[order], s[order], b[order]


def test_converted_head_inference_parity():
    """Head-level conversion parity beyond the trunk (VERDICT r3 #5):
    Detectron2's box-predictor decode + score threshold + class-aware NMS
    and the mask-head conv/deconv math, reimplemented in numpy/torch, must
    match the CONVERTED flax heads + box_head_inference end-to-end on
    fixed pooled RoI features and proposals
    (reference Detector/extract_features.py:48-106)."""
    import torch.nn.functional as F

    from crct_tpu.detector.heads import (BoxHead, BoxPredictor, MaskHead,
                                         box_head_inference)

    K, N, HW = 5, 48, (480, 640)
    g = np.random.default_rng(11)
    sd = {}

    def lin(name, cout, cin, scale):
        sd[f"{name}.weight"] = (g.normal(size=(cout, cin)) * scale
                                ).astype(np.float32)
        sd[f"{name}.bias"] = (g.normal(size=(cout,)) * 0.1).astype(np.float32)

    def conv(name, cout, cin, k, scale=0.05):
        sd[f"{name}.weight"] = (g.normal(size=(cout, cin, k, k)) * scale
                                ).astype(np.float32)
        sd[f"{name}.bias"] = (g.normal(size=(cout,)) * 0.1).astype(np.float32)

    lin("roi_heads.box_head.fc1", 1024, 256 * 49, 0.01)
    lin("roi_heads.box_head.fc2", 1024, 1024, 0.03)
    # scaled so softmax yields a spread of confidences around the 0.5
    # score threshold (some detections survive, some rows are filtered)
    lin("roi_heads.box_predictor.cls_score", K + 1, 1024, 0.3)
    lin("roi_heads.box_predictor.bbox_pred", K * 4, 1024, 0.005)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_head.deconv.weight"] = (
        g.normal(size=(256, 256, 2, 2)) * 0.05).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = (
        g.normal(size=(256,)) * 0.1).astype(np.float32)
    conv("roi_heads.mask_head.predictor", K, 256, 1, scale=0.1)

    tree, skipped, _ = convert_detector_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()})
    assert not skipped

    # fixed pooled RoI features + proposals (several near-duplicate
    # proposal clusters so NMS suppression is actually exercised)
    pooled = g.normal(size=(N, 7, 7, 256)).astype(np.float32)
    base = np.sort(g.random((N // 4, 2, 2)).astype(np.float32), axis=1)
    base = np.concatenate([base[:, 0] * [HW[1], HW[0]],
                           base[:, 1] * [HW[1], HW[0]]], axis=1)
    jitter = g.normal(size=(4, N // 4, 4)).astype(np.float32) * 3.0
    proposals = (base[None] + jitter).reshape(N, 4)
    proposals[:, 2:] = np.maximum(proposals[:, 2:], proposals[:, :2] + 4)

    # --- flax path (converted weights) ---------------------------------
    feats_j = BoxHead().apply({"params": tree["box_head"]},
                              jnp.asarray(pooled))
    scores_j, deltas_j = BoxPredictor(num_classes=K).apply(
        {"params": tree["box_predictor"]}, feats_j)
    det_boxes, det_scores, det_classes, det_valid, kept_rows = \
        box_head_inference(scores_j, deltas_j, jnp.asarray(proposals),
                           jnp.ones((N,), jnp.float32), HW,
                           score_thresh=0.5, nms_thresh=0.5,
                           max_detections=100)
    nv = int(np.asarray(det_valid).sum())

    # --- torch/numpy Detectron2 reference ------------------------------
    x = pooled.transpose(0, 3, 1, 2).reshape(N, -1)     # torch CHW flatten
    f1 = np.maximum(x @ sd["roi_heads.box_head.fc1.weight"].T
                    + sd["roi_heads.box_head.fc1.bias"], 0)
    feats_t = np.maximum(f1 @ sd["roi_heads.box_head.fc2.weight"].T
                         + sd["roi_heads.box_head.fc2.bias"], 0)
    np.testing.assert_allclose(np.asarray(feats_j), feats_t,
                               rtol=1e-4, atol=1e-3)
    rows_t, cls_t, s_t, b_t = _d2_reference_box_inference(
        feats_t, sd, proposals, HW, K)

    # the test is vacuous unless detections survive AND rows get filtered
    assert 3 <= len(rows_t) < N
    assert nv == len(rows_t)
    order_j = np.argsort(-np.asarray(det_scores)[:nv], kind="stable")
    np.testing.assert_array_equal(np.asarray(kept_rows)[:nv][order_j], rows_t)
    np.testing.assert_array_equal(np.asarray(det_classes)[:nv][order_j], cls_t)
    np.testing.assert_allclose(np.asarray(det_scores)[:nv][order_j], s_t,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(det_boxes)[:nv][order_j], b_t,
                               rtol=1e-4, atol=1e-2)

    # --- mask head on the detected boxes' pooled features ---------------
    mp = g.normal(size=(max(nv, 1), 14, 14, 256)).astype(np.float32)
    logits_j = MaskHead(num_classes=K).apply({"params": tree["mask_head"]},
                                             jnp.asarray(mp))
    t = torch.from_numpy(mp.transpose(0, 3, 1, 2))
    for i in range(1, 5):
        t = F.relu(F.conv2d(
            t, torch.from_numpy(sd[f"roi_heads.mask_head.mask_fcn{i}.weight"]),
            torch.from_numpy(sd[f"roi_heads.mask_head.mask_fcn{i}.bias"]),
            padding=1))
    t = F.relu(F.conv_transpose2d(
        t, torch.from_numpy(sd["roi_heads.mask_head.deconv.weight"]),
        torch.from_numpy(sd["roi_heads.mask_head.deconv.bias"]), stride=2))
    t = F.conv2d(t, torch.from_numpy(sd["roi_heads.mask_head.predictor.weight"]),
                 torch.from_numpy(sd["roi_heads.mask_head.predictor.bias"]))
    np.testing.assert_allclose(np.asarray(logits_j),
                               t.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-3)
