"""Measured decomposition of the 800px detector train step (VERDICT r4 #4).

The production-shape Mask R-CNN step (800x1088 canvas, batch 2/chip, the
Detectron2 recipe at Detector/frcnn.py:133-175) runs at ~82 ms / ~16% MFU,
and both prior theories (RoIAlign backward, RPN-NMS serialization) were
measured innocent. This tool produces the missing attribution by KNOCKOUT:
it times the full jitted grad step, then re-times it with one component
stubbed out at a time (patched at the mask_rcnn module namespace so the
jitted program simply omits that work), and reports the deltas:

  full            the baseline step
  no_mask         with_mask=False          -> mask branch (RoIAlign14 +
                                              head + loss, fwd+bwd)
  stub_roialign   RoIAlign -> broadcast    -> RoIAlign gathers fwd+bwd
  stub_nms        propose -> fixed slices  -> proposal NMS (sort + iou loop)
  stub_rpn_loss   rpn_losses -> tiny       -> RPN target matching/sampling
  stub_roi_match  + match/sample -> fixed  -> RoI matching/sampling
                                              (delta vs stub_rpn_loss)
  backbone_only   loss = sum(mean(P_i))    -> ResNet+FPN fwd+bwd floor
  optimizer_only  step on frozen graph     -> SGD+momentum update cost

Caveat: XLA overlaps independent sections, so a knockout delta is the
SERIAL-PATH cost of that component (what the step actually saves), which
is exactly the decision-relevant number. Deltas need not sum to `full`.

Usage: python tools/detector_step_decomp.py [--hw 800x1088] [--batch 2]
"""
from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def patched(module, **repls):
    olds = {k: getattr(module, k) for k in repls}
    try:
        for k, v in repls.items():
            setattr(module, k, v)
        yield
    finally:
        for k, v in olds.items():
            setattr(module, k, v)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="800x1088")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args(argv)
    IH, IW = (int(x) for x in args.hw.split("x"))
    B = args.batch

    import jax
    import jax.numpy as jnp

    from crct_tpu.detector import boxes as boxes_mod
    from crct_tpu.detector import mask_rcnn as mr
    from crct_tpu.detector.trainer import (make_detector_optimizer,
                                           make_detector_train_step)

    MAXB = 40
    rng = np.random.default_rng(0)
    raw = np.sort(rng.random((B, MAXB, 2, 2), np.float32)
                  * min(IH, IW), axis=2)
    batch = {
        "image": rng.random((B, IH, IW, 3)).astype(np.float32),
        "gt_boxes": np.concatenate([raw.min(2), raw.max(2)], -1),
        "gt_classes": rng.integers(0, 25, (B, MAXB)).astype(np.int32),
        "gt_valid": (rng.random((B, MAXB)) < 0.5).astype(np.float32),
        "gt_masks28": (rng.random((B, MAXB, 28, 28)) < 0.5).astype(
            np.float32),
    }

    def stub_roialign(feats, rois, *, strides, output_size):
        base = feats[0][:output_size, :output_size, :]
        return jnp.broadcast_to(
            base[None], (rois.shape[0],) + base.shape).astype(base.dtype)

    def stub_propose(logits, deltas, anchors, hw, *, post_nms_topk=512,
                     **kw):
        all_anchors = jnp.asarray(
            np.concatenate([np.asarray(a) for a in anchors])
            [:post_nms_topk], jnp.float32)
        scores = jnp.concatenate(
            [l.reshape(-1) for l in logits])[:post_nms_topk]
        return (all_anchors, scores,
                jnp.ones((all_anchors.shape[0],), jnp.float32))

    def stub_rpn_losses(logits, deltas, anchors, gt_boxes, gt_valid, rng):
        return {"rpn_cls": sum(l.mean() for l in logits) * 1e-9,
                "rpn_loc": sum(d.mean() for d in deltas) * 1e-9}

    def stub_match_anchors(boxes, gt_boxes, gt_valid, *, pos_thr, neg_thr):
        n = boxes.shape[0]
        return (jnp.zeros((n,), jnp.int32),
                (jnp.arange(n) % 2).astype(jnp.int32))

    def stub_sample_fixed(label, rng, *, num, pos_fraction):
        return (jnp.arange(num, dtype=jnp.int32) % label.shape[0],
                jnp.ones((num,), jnp.float32))

    def time_step(with_mask=True, patches=None, boxes_patches=None,
                  loss_override=None):
        model = mr.MaskRCNN(num_classes=25, with_mask=with_mask,
                            dtype=jnp.float32)
        ctx = contextlib.ExitStack()
        with ctx:
            if patches:
                ctx.enter_context(patched(mr, **patches))
            if boxes_patches:
                ctx.enter_context(patched(boxes_mod, **boxes_patches))

            def init_fn(r):
                v = model.init(r, jnp.asarray(batch["image"][0]),
                               train=True,
                               gt_boxes=jnp.asarray(batch["gt_boxes"][0]),
                               gt_classes=jnp.asarray(
                                   batch["gt_classes"][0]),
                               gt_valid=jnp.asarray(batch["gt_valid"][0]),
                               gt_masks28=jnp.asarray(
                                   batch["gt_masks28"][0]), rng=r)
                return v["params"]

            params = jax.jit(init_fn)(jax.random.key(0))
            tx = make_detector_optimizer()
            opt_state = jax.jit(tx.init)(params)
            if loss_override is None:
                step = jax.jit(make_detector_train_step(model, tx),
                               donate_argnums=(0, 1))
            else:
                def step_fn(params, opt_state, b, rng):
                    def batched_loss(p):
                        val = jax.vmap(
                            lambda img: loss_override(model, p, img))(
                                b["image"])
                        return val.mean(), {"total": val.mean()}
                    (_, losses), grads = jax.value_and_grad(
                        batched_loss, has_aux=True)(params)
                    updates, opt_state2 = tx.update(grads, opt_state,
                                                    params)
                    params = jax.tree.map(lambda a, u: a + u, params,
                                          updates)
                    return params, opt_state2, losses
                step = jax.jit(step_fn, donate_argnums=(0, 1))

            db = {k: jnp.asarray(v) for k, v in batch.items()}
            key = jax.random.key(1)
            for _ in range(3):
                params, opt_state, losses = step(params, opt_state, db,
                                                 key)
            np.asarray(losses["total"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                params, opt_state, losses = step(params, opt_state, db,
                                                 key)
            np.asarray(losses["total"])
            return (time.perf_counter() - t0) / args.steps * 1000.0

    out = {}
    out["full_ms"] = round(time_step(), 2)
    print(json.dumps({"full_ms": out["full_ms"]}), flush=True)
    out["no_mask_ms"] = round(time_step(with_mask=False), 2)
    print(json.dumps({"no_mask_ms": out["no_mask_ms"]}), flush=True)
    out["stub_roialign_ms"] = round(time_step(
        patches={"multilevel_roi_align": stub_roialign}), 2)
    print(json.dumps({"stub_roialign_ms": out["stub_roialign_ms"]}),
          flush=True)
    out["stub_nms_ms"] = round(time_step(
        patches={"propose": stub_propose}), 2)
    print(json.dumps({"stub_nms_ms": out["stub_nms_ms"]}), flush=True)
    out["stub_rpn_loss_ms"] = round(time_step(
        patches={"rpn_losses": stub_rpn_losses}), 2)
    print(json.dumps({"stub_rpn_loss_ms": out["stub_rpn_loss_ms"]}),
          flush=True)
    out["stub_roi_match_ms"] = round(time_step(
        patches={"rpn_losses": stub_rpn_losses},
        boxes_patches={"match_anchors": stub_match_anchors,
                       "sample_fixed": stub_sample_fixed}), 2)
    print(json.dumps({"stub_roi_match_ms": out["stub_roi_match_ms"]}),
          flush=True)

    def backbone_loss(model, p, img):
        feats = model.apply({"params": p}, img,
                            method=mr.MaskRCNN.features)
        return sum(f.mean() for f in feats)

    out["backbone_only_ms"] = round(
        time_step(loss_override=backbone_loss), 2)
    print(json.dumps({"backbone_only_ms": out["backbone_only_ms"]}),
          flush=True)

    full = out["full_ms"]
    out["deltas_ms"] = {
        "mask_branch": round(full - out["no_mask_ms"], 2),
        "roialign": round(full - out["stub_roialign_ms"], 2),
        "proposal_nms": round(full - out["stub_nms_ms"], 2),
        "rpn_loss_matching": round(full - out["stub_rpn_loss_ms"], 2),
        "roi_matching_sampling": round(
            out["stub_rpn_loss_ms"] - out["stub_roi_match_ms"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
