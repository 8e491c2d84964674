"""RoIAlign and NMS golden tests against naive numpy implementations."""

import numpy as np
import pytest

from crct_tpu.ops.nms import batched_nms, iou_matrix, nms
from crct_tpu.ops.roi_align import multilevel_roi_align, roi_align


def naive_roi_align(feat, boxes, spatial_scale, P, S):
    """Straightforward loop implementation (aligned=True convention)."""
    H, W, C = feat.shape

    def sample(y, x):
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        wy1, wx1 = y - y0, x - x0
        return (feat[y0, x0] * (1 - wy1) * (1 - wx1)
                + feat[y0, x1] * (1 - wy1) * wx1
                + feat[y1, x0] * wy1 * (1 - wx1)
                + feat[y1, x1] * wy1 * wx1)

    out = np.zeros((len(boxes), P, P, C), np.float32)
    for n, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1 = bx1 * spatial_scale - 0.5, by1 * spatial_scale - 0.5
        x2, y2 = bx2 * spatial_scale - 0.5, by2 * spatial_scale - 0.5
        bw = max(x2 - x1, 1e-6) / P
        bh = max(y2 - y1, 1e-6) / P
        for i in range(P):
            for j in range(P):
                acc = np.zeros(C, np.float32)
                for si in range(S):
                    for sj in range(S):
                        y = y1 + (i + (si + 0.5) / S) * bh
                        x = x1 + (j + (sj + 0.5) / S) * bw
                        acc += sample(y, x)
                out[n, i, j] = acc / (S * S)
    return out


def naive_nms(boxes, scores, iou_thr, score_thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    ious = np.asarray(iou_matrix(boxes, boxes))
    for i in order:
        if suppressed[i] or scores[i] <= score_thr:
            continue
        keep.append(i)
        suppressed |= ious[i] > iou_thr
    return keep


def test_roi_align_matches_naive():
    rng = np.random.default_rng(0)
    feat = rng.random((16, 20, 3)).astype(np.float32)
    boxes = np.array([[2.0, 3.0, 30.0, 40.0],
                      [0.0, 0.0, 64.0, 48.0],
                      [10.0, 10.0, 12.0, 18.0]], np.float32)
    got = np.asarray(roi_align(feat, boxes, spatial_scale=0.25,
                               output_size=4, sampling_ratio=2))
    want = naive_roi_align(feat, boxes, 0.25, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_constant_map():
    """Pooling a constant map returns the constant everywhere."""
    feat = np.full((8, 8, 2), 3.5, np.float32)
    boxes = np.array([[1.0, 1.0, 6.0, 6.0]], np.float32)
    out = np.asarray(roi_align(feat, boxes, spatial_scale=1.0,
                               output_size=7, sampling_ratio=2))
    np.testing.assert_allclose(out, 3.5, rtol=1e-6)


def test_multilevel_roi_align_level_assignment():
    rng = np.random.default_rng(1)
    feats = [rng.random((64 // s, 64 // s, 4)).astype(np.float32)
             for s in (4, 8, 16, 32)]
    # small box -> level 2, huge box -> level 5
    boxes = np.array([[0, 0, 16, 16], [0, 0, 512, 512]], np.float32)
    out = np.asarray(multilevel_roi_align(feats, boxes, output_size=7))
    small_l2 = np.asarray(roi_align(feats[0], boxes[:1], spatial_scale=0.25,
                                    output_size=7))
    big_l5 = np.asarray(roi_align(feats[3], boxes[1:], spatial_scale=1 / 32,
                                  output_size=7))
    np.testing.assert_allclose(out[0], small_l2[0], rtol=1e-5)
    np.testing.assert_allclose(out[1], big_l5[0], rtol=1e-5)


def test_nms_matches_naive():
    rng = np.random.default_rng(2)
    n = 40
    centers = rng.random((n, 2)) * 60
    sizes = rng.random((n, 2)) * 20 + 4
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    idx, valid = nms(boxes, scores, iou_threshold=0.4, score_threshold=0.1,
                     max_outputs=n)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    want = naive_nms(boxes, scores, 0.4, 0.1)
    assert got == want


def test_nms_score_threshold_filters_all():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.2, 0.1], np.float32)
    idx, valid = nms(boxes, scores, iou_threshold=0.5, score_threshold=0.5,
                     max_outputs=2)
    assert not np.any(np.asarray(valid))


def test_batched_nms_keeps_cross_class_overlaps():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    idx, valid = batched_nms(boxes, scores, classes, iou_threshold=0.5,
                             max_outputs=2)
    assert np.asarray(valid).sum() == 2  # same box, different class: both kept
    idx2, valid2 = nms(boxes, scores, iou_threshold=0.5, max_outputs=2)
    assert np.asarray(valid2).sum() == 1  # class-agnostic: one suppressed


def test_fast_nms_subset_and_no_overlap():
    """fast_nms (parallel, train-time opt-in) only over-suppresses: its
    keep set is a subset of exact nms()'s, kept boxes never overlap above
    the threshold, and sparse layouts (no overlaps) match exactly."""
    from crct_tpu.ops.nms import fast_nms

    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 60
        centers = rng.random((n, 2)) * 80
        sizes = rng.random((n, 2)) * 25 + 4
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype(np.float32)
        scores = (rng.random(n) * 0.9 + 0.05).astype(np.float32)
        fi, fv = fast_nms(boxes, scores, iou_threshold=0.4,
                          score_threshold=0.0, max_outputs=n)
        ei, ev = nms(boxes, scores, iou_threshold=0.4,
                     score_threshold=0.0, max_outputs=n)
        fast_kept = {int(i) for i, v in zip(np.asarray(fi),
                                            np.asarray(fv)) if v}
        exact_kept = {int(i) for i, v in zip(np.asarray(ei),
                                             np.asarray(ev)) if v}
        assert fast_kept <= exact_kept, (trial, fast_kept - exact_kept)
        kept = sorted(fast_kept)
        if len(kept) > 1:
            m = np.array(iou_matrix(boxes[kept], boxes[kept]))
            np.fill_diagonal(m, 0)
            assert m.max() <= 0.4 + 1e-6
        # indices come out in score order, highest first
        fvalid = [int(i) for i, v in zip(np.asarray(fi),
                                         np.asarray(fv)) if v]
        assert all(scores[a] >= scores[b]
                   for a, b in zip(fvalid, fvalid[1:]))

    # no overlaps at all -> identical to exact NMS
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [40, 0, 50, 10]],
                     np.float32)
    scores = np.array([0.3, 0.9, 0.6], np.float32)
    fi, fv = fast_nms(boxes, scores, iou_threshold=0.5, max_outputs=3)
    assert list(np.asarray(fi)) == [1, 2, 0]
    assert np.asarray(fv).all()

    # score_threshold zeroes degenerate candidates like nms()
    fi, fv = fast_nms(boxes, np.zeros(3, np.float32), iou_threshold=0.5,
                      score_threshold=0.0, max_outputs=3)
    assert not np.asarray(fv).any()


def test_propose_fast_shapes_match_exact():
    """propose(fast=True) keeps the exact path's fixed output contract."""
    import jax.numpy as jnp

    from crct_tpu.detector.rpn import level_anchors, propose

    rng = np.random.default_rng(3)
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    anchors = level_anchors(shapes)
    logits = [jnp.asarray(rng.standard_normal(a.shape[0]), jnp.float32)
              for a in anchors]
    deltas = [jnp.asarray(rng.standard_normal((a.shape[0], 4)) * 0.1,
                          jnp.float32) for a in anchors]
    for fast in (False, True):
        b, s, v = propose(logits, deltas, anchors, (64, 64),
                          post_nms_topk=32, fast=fast)
        assert b.shape == (32, 4) and s.shape == (32,) and v.shape == (32,)
        assert bool(np.asarray(v).any())


def test_nms_fixed_output_shape():
    boxes = np.array([[0, 0, 10, 10]], np.float32)
    scores = np.array([0.9], np.float32)
    idx, valid = nms(boxes, scores, max_outputs=16)
    assert idx.shape == (16,) and valid.shape == (16,)
    assert np.asarray(valid)[0] and not np.any(np.asarray(valid)[1:])


def test_multilevel_roi_align_custom_vjp_matches_autodiff():
    """The dense-einsum backward must equal autodiff through the gather
    forward on every pyramid level (and send no gradient to boxes)."""
    import jax
    import jax.numpy as jnp
    from crct_tpu.ops.roi_align import _mlra_forward

    rng = np.random.default_rng(7)
    feats = tuple(jnp.asarray(rng.normal(
        size=(32 // (2 ** l), 32 // (2 ** l), 8)).astype(np.float32))
        for l in range(4))
    raw = np.sort(rng.random((12, 2, 2), np.float32) * 300, axis=1)
    boxes = jnp.asarray(np.concatenate([raw[:, 0], raw[:, 1]], -1))

    def loss_custom(fs):
        return jnp.sum(multilevel_roi_align(list(fs), boxes) ** 2)

    def loss_ref(fs):
        return jnp.sum(_mlra_forward(list(fs), boxes, (4, 8, 16, 32),
                                     7, 2, 4, 224, 2, 5) ** 2)

    np.testing.assert_allclose(np.asarray(loss_custom(feats)),
                               np.asarray(loss_ref(feats)), rtol=1e-5)
    g1 = jax.grad(loss_custom)(feats)
    g2 = jax.grad(loss_ref)(feats)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    gb = jax.grad(lambda b: jnp.sum(
        multilevel_roi_align(list(feats), b) ** 2))(boxes)
    assert np.all(np.asarray(gb) == 0.0)
