"""Mask R-CNN component tests on tiny images (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.detector.boxes import (decode_deltas, encode_deltas,
                                     generate_anchors, match_anchors,
                                     sample_fixed)
from crct_tpu.detector.mask_rcnn import MaskRCNN


def test_delta_coding_round_trip():
    rng = np.random.default_rng(0)
    anchors = np.array([[0, 0, 10, 10], [5, 5, 30, 20]], np.float32)
    boxes = np.array([[1, 2, 12, 9], [4, 6, 28, 25]], np.float32)
    deltas = encode_deltas(jnp.asarray(boxes), jnp.asarray(anchors))
    back = decode_deltas(deltas, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-5, atol=1e-4)


def test_generate_anchors_count_and_center():
    a = generate_anchors((4, 6), stride=8, sizes=[32])
    assert a.shape == (4 * 6 * 3, 4)
    # first cell anchors centered at (4, 4)
    cx = (a[:3, 0] + a[:3, 2]) / 2
    cy = (a[:3, 1] + a[:3, 3]) / 2
    np.testing.assert_allclose(cx, 4.0, atol=1e-4)
    np.testing.assert_allclose(cy, 4.0, atol=1e-4)


def test_match_anchors_labels():
    anchors = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110],
                           [0, 0, 9, 9]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    valid = jnp.asarray([True])
    matched, label = match_anchors(anchors, gt, valid, pos_thr=0.7,
                                   neg_thr=0.3)
    assert int(label[0]) == 1       # exact match
    assert int(label[1]) == 0       # far away
    assert int(label[2]) == 1       # IoU 0.81 > 0.7


def test_sample_fixed_shapes_and_quota():
    label = jnp.asarray([1] * 3 + [0] * 100 + [-1] * 10)
    idx, weight = sample_fixed(label, jax.random.key(0), num=32,
                               pos_fraction=0.25)
    assert idx.shape == (32,) and weight.shape == (32,)
    assert weight.sum() == 32       # enough candidates to fill
    pos_rows = np.asarray(label)[np.asarray(idx)] == 1
    assert pos_rows.sum() == 3      # all positives taken (under the 8 quota)


@pytest.fixture(scope="module")
def tiny_detector():
    model = MaskRCNN(num_classes=5, depth=14, with_mask=True,
                     post_nms_topk_train=32, post_nms_topk_test=16,
                     roi_batch=16, fc_dim=64)
    image = jnp.asarray(np.random.default_rng(0).random((64, 64, 3)),
                        jnp.float32)
    gt_boxes = jnp.asarray([[4, 4, 30, 30], [32, 32, 60, 60],
                            [0, 0, 0, 0]], jnp.float32)
    gt_classes = jnp.asarray([1, 3, 0], jnp.int32)
    gt_valid = jnp.asarray([True, True, False])
    gt_masks = jnp.ones((3, 28, 28), jnp.float32)
    import functools
    variables = jax.jit(functools.partial(
        model.init, train=True))(jax.random.key(0), image,
                                 gt_boxes=gt_boxes, gt_classes=gt_classes,
                                 gt_valid=gt_valid, gt_masks28=gt_masks,
                                 rng=jax.random.key(1))
    return model, variables, image, (gt_boxes, gt_classes, gt_valid, gt_masks)


def test_train_losses_finite(tiny_detector):
    model, variables, image, (gtb, gtc, gtv, gtm) = tiny_detector
    losses = model.apply(variables, image, train=True, gt_boxes=gtb,
                         gt_classes=gtc, gt_valid=gtv, gt_masks28=gtm,
                         rng=jax.random.key(2))
    for k in ("rpn_obj", "rpn_box", "box_cls", "box_reg", "mask", "total"):
        assert k in losses and np.isfinite(float(losses[k])), k
        assert float(losses[k]) >= 0

    # opt-in --fast-nms train path: same loss keys, finite, same params
    fast_model = MaskRCNN(num_classes=5, depth=14, with_mask=True,
                          post_nms_topk_train=32, post_nms_topk_test=16,
                          roi_batch=16, fc_dim=64, fast_train_nms=True)
    fl = fast_model.apply(variables, image, train=True, gt_boxes=gtb,
                          gt_classes=gtc, gt_valid=gtv, gt_masks28=gtm,
                          rng=jax.random.key(2))
    for k in ("rpn_obj", "rpn_box", "box_cls", "box_reg", "mask", "total"):
        assert k in fl and np.isfinite(float(fl[k])), k
    # inference is unaffected by the flag (always exact NMS)
    out_e = model.apply(variables, image, train=False)
    out_f = fast_model.apply(variables, image, train=False)
    np.testing.assert_array_equal(np.asarray(out_e["boxes"]),
                                  np.asarray(out_f["boxes"]))


def test_inference_shapes(tiny_detector):
    model, variables, image, _ = tiny_detector
    out = model.apply(variables, image, train=False)
    assert out["boxes"].shape == (100, 4)
    assert out["features"].shape == (100, 64)
    assert out["mask_logits"].shape == (100, 28, 28, 5)
    # boxes inside the image
    b = np.asarray(out["boxes"])
    assert (b >= -1e-3).all() and (b[:, [0, 2]] <= 64.001).all()


def test_extract_roi_features(tiny_detector):
    model, variables, image, _ = tiny_detector
    boxes = jnp.asarray([[0, 0, 64, 64], [8, 8, 24, 24]], jnp.float32)
    feats = model.apply(variables, image, boxes,
                        method=MaskRCNN.extract_roi_features)
    assert feats.shape == (2, 64)
    assert np.isfinite(np.asarray(feats)).all()


def test_train_step_reduces_loss(tiny_detector):
    import optax
    model, variables, image, (gtb, gtc, gtv, gtm) = tiny_detector
    tx = optax.adam(1e-3)

    def loss_fn(params, rng):
        losses = model.apply({"params": params}, image, train=True,
                             gt_boxes=gtb, gt_classes=gtc, gt_valid=gtv,
                             gt_masks28=gtm, rng=rng)
        # track rpn_obj: it depends only on fixed anchors + a fixed sample,
        # so it must decrease steadily (total loss is noisy early on because
        # the proposal pool itself shifts as the RPN trains)
        return losses["total"], losses["rpn_obj"]

    params = variables["params"]
    state = tx.init(params)
    step = jax.jit(lambda p, s, r: _update(p, s, r, loss_fn, tx))
    rpn_objs = []
    for i in range(5):
        params, state, (loss, rpn_obj) = step(params, state, jax.random.key(3))
        rpn_objs.append(float(rpn_obj))
        assert np.isfinite(float(loss))
    assert rpn_objs[-1] < rpn_objs[0]


def _update(params, state, rng, loss_fn, tx):
    import optax
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, rng)
    updates, state = tx.update(grads, state, params)
    return optax.apply_updates(params, updates), state, (loss, aux)


def test_fg_subset_mask_loss_equals_all_roi(tiny_detector):
    """The roi_batch//4 fg-first subset must reproduce the all-roi mask
    loss exactly: every foreground row is inside the subset (sample_fixed
    caps positives at that count) and background rows carry weight 0."""
    from crct_tpu.detector.heads import mask_loss

    rng = np.random.default_rng(3)
    R, C = 16, 5
    mlogits = jnp.asarray(rng.normal(size=(R, 28, 28, C)), jnp.float32)
    gt_masks = jnp.asarray(rng.random((R, 28, 28)) < 0.5, jnp.float32)
    gt_cls = jnp.asarray(rng.integers(0, C, R), jnp.int32)
    is_fg = jnp.asarray([True] * 3 + [False] * (R - 3))
    weight = jnp.asarray(rng.random(R) > 0.2, jnp.float32)
    fg_w = weight * is_fg.astype(jnp.float32)

    full = mask_loss(mlogits, gt_masks, gt_cls, fg_w)
    sel = jnp.argsort(~is_fg, stable=True)[:R // 4]
    sub = mask_loss(mlogits[sel], gt_masks[sel], gt_cls[sel], fg_w[sel])
    np.testing.assert_allclose(float(full), float(sub), rtol=1e-6)


def test_bf16_train_and_inference():
    """Opt-in bf16 detector (--bf16): the train step stays finite with f32
    loss numerics at the boundary, and inference box coordinates remain
    f32 (bf16 coords would quantize to whole pixels on large canvases)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from crct_tpu.detector.mask_rcnn import MaskRCNN

    rng = np.random.default_rng(0)
    model = MaskRCNN(num_classes=4, with_mask=True, depth=14,
                     roi_batch=16, post_nms_topk_train=16,
                     post_nms_topk_test=16, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    raw = np.sort(rng.random((6, 2, 2)).astype(np.float32) * 64, axis=1)
    gtb = jnp.asarray(np.concatenate([raw[:, 0], raw[:, 1]], -1))
    gtc = jnp.asarray(rng.integers(0, 4, 6), jnp.int32)
    gtv = jnp.ones((6,), jnp.float32)
    gtm = jnp.asarray((rng.random((6, 28, 28)) < 0.5), jnp.float32)
    key = jax.random.key(0)
    variables = model.init(key, img, train=True, gt_boxes=gtb,
                           gt_classes=gtc, gt_valid=gtv, gt_masks28=gtm,
                           rng=key)

    losses = model.apply(variables, img, train=True, gt_boxes=gtb,
                         gt_classes=gtc, gt_valid=gtv, gt_masks28=gtm,
                         rng=key)
    for k, v in losses.items():
        assert v.dtype == jnp.float32, (k, v.dtype)
        assert np.isfinite(float(v)), (k, float(v))
    # gradient flows through the bf16 path (advisor fix: cotangent dtypes)
    grads = jax.grad(lambda p: model.apply(
        {"params": p}, img, train=True, gt_boxes=gtb, gt_classes=gtc,
        gt_valid=gtv, gt_masks28=gtm, rng=key)["total"])(variables["params"])
    assert np.isfinite(float(jnp.asarray(
        jax.tree.leaves(grads)[0]).astype(jnp.float32).sum()))

    out = model.apply(variables, img, train=False)
    assert out["boxes"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["scores"], np.float32)).all()
