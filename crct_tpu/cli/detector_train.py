"""Detector training CLI (reference Detector/frcnn.py).

Usage parity:
    python -m crct_tpu.cli.detector_train --dataset plotqa \
        --annotations train.json --image-dir pngs/ [--test]

The reference's dataset registry (frcnn.py:86-128) becomes explicit
--annotations/--image-dir flags (one dataset per run; the reference
concatenated three PlotQA annotation shards). Model choice follows
frcnn.py:137-155: Mask R-CNN R50 for plotqa, Faster R-CNN R50 for
plotqa_colorless/dvqa, R101 for figure_qa.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="plotqa",
                   choices=["plotqa", "plotqa_colorless", "figure_qa", "dvqa"])
    p.add_argument("--annotations", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--val-annotations", default="")
    p.add_argument("--val-image-dir", default="")
    p.add_argument("--output-dir", default="./output/detector")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--max-iter", type=int, default=100000)
    p.add_argument("--base-lr", type=float, default=2.5e-4)
    p.add_argument("--max-boxes", type=int, default=100)
    p.add_argument("--image-size", type=int, default=1344)
    p.add_argument("--checkpoint-every", type=int, default=5000)
    p.add_argument("--load-weights", default="",
                   help="crct_tpu detector ckpt, torch .pth, or Detectron2 "
                        "model-zoo .pkl (e.g. mask_rcnn_R_50_FPN_1x, the "
                        "reference's default init, frcnn.py:215)")
    p.add_argument("--freeze-at", type=int, default=None,
                   help="freeze backbone through this stage (1=stem, "
                        "2=res2...); default 2 when fine-tuning from "
                        "--load-weights (reference FREEZE_AT), else 0")
    p.add_argument("--test", action="store_true", help="evaluation only")
    p.add_argument("--eval-images", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 activations in the backbone/heads (box "
                        "decoding and losses stay f32); the reference "
                        "recipe is fp32 — opt-in throughput trade")
    p.add_argument("--depth", type=int, default=0,
                   choices=[0, 14, 50, 101],
                   help="ResNet trunk depth override (default 0 = the "
                        "dataset rule: R101 for figure_qa, R50 otherwise; "
                        "14 = tiny trunk for CPU smoke/proof runs)")
    p.add_argument("--fast-nms", action="store_true",
                   help="parallel fast-NMS for train-time RPN proposals "
                        "(keep set is a subset of exact NMS; inference "
                        "and extraction always stay exact) — opt-in "
                        "throughput trade, see docs/BENCHMARKS.md")
    p.add_argument("--no-augment", action="store_true",
                   help="disable train-time random hflip + multi-scale "
                        "shortest-edge sampling (on by default, matching "
                        "the Detectron2 INPUT pipeline the reference "
                        "trainer inherits, frcnn.py:182-205)")
    args = p.parse_args(argv)

    from crct_tpu.detector.coco import CocoDataset
    from crct_tpu.detector.trainer import DetectorTrainer, coco_evaluate
    from crct_tpu.utils.checkpoint import save_checkpoint

    with_mask = args.dataset == "plotqa"
    # stride convention AND pixel normalization follow the weights file's
    # layout (Detectron2 model-zoo = Caffe2 stride-in-1x1 + mean-only BGR
    # stats folded to RGB by the converter; torchvision = stride-on-3x3 +
    # ImageNet mean/std)
    from crct_tpu.detector.convert import detector_file_meta
    from crct_tpu.detector.extract import resolve_depth
    meta = detector_file_meta(args.load_weights)
    depth = resolve_depth(args.depth, meta, args.dataset, args.load_weights)
    stride_in_1x1 = meta["stride_in_1x1"]
    augment = not (args.test or args.no_augment)
    ds = CocoDataset(args.annotations, args.image_dir,
                     max_boxes=args.max_boxes, max_size=args.image_size,
                     with_masks=with_mask, pixel_mean=meta["pixel_mean"],
                     pixel_std=meta["pixel_std"], augment=augment)
    if augment:
        print(f"augmentation: hflip p=0.5 + short-edge {ds.train_scales} "
              f"(fixed {args.image_size}px canvas: one compiled shape)")
    print(f"{len(ds)} images, {len(ds.categories)} classes")
    freeze_at = args.freeze_at
    if freeze_at is None:
        freeze_at = 2 if args.load_weights else 0
    import jax.numpy as jnp
    trainer = DetectorTrainer(ds, num_classes=len(ds.categories),
                              with_mask=with_mask, depth=depth,
                              batch_size=args.batch_size,
                              base_lr=args.base_lr,
                              stride_in_1x1=stride_in_1x1,
                              freeze_at=freeze_at,
                              dtype=jnp.bfloat16 if args.bf16
                              else jnp.float32,
                              fast_nms=args.fast_nms)
    if args.load_weights:
        import jax
        from crct_tpu.detector.convert import restore_detector_params
        trainer.params, _ = restore_detector_params(
            jax.device_get(trainer.params), args.load_weights)

    if args.test:
        metrics = coco_evaluate(trainer.model, trainer.params, ds,
                                max_images=args.eval_images or None)
        print(json.dumps(metrics, indent=2))
        return metrics

    os.makedirs(args.output_dir, exist_ok=True)
    keys = ("image", "gt_boxes", "gt_classes", "gt_valid")
    if with_mask:
        keys += ("gt_masks28",)
    from crct_tpu.detector.trainer import detector_batch_iterator
    batches = detector_batch_iterator(ds, args.batch_size, keys,
                                      args.max_iter)
    t0 = time.time()
    for it, batch in enumerate(batches):
        losses = trainer.run_step(batch)
        if it % 20 == 0:
            msg = " ".join(f"{k}:{v:.4f}" for k, v in losses.items())
            print(f"[{it}/{args.max_iter}] [{time.time() - t0:.1f}s] {msg}",
                  flush=True)
        if (it + 1) % args.checkpoint_every == 0 or it + 1 == args.max_iter:
            import jax
            path = os.path.join(args.output_dir, f"detector_{it + 1}.ckpt")
            # persist the build/preprocessing convention: a later
            # extract_features --load-weights <this ckpt> must rebuild the
            # same stride placement and pixel normalization
            save_checkpoint(path, jax.device_get(trainer.params),
                            iter_id=it + 1, extra={"detector_meta": {
                                "stride_in_1x1":
                                    np.asarray(int(stride_in_1x1)),
                                "pixel_mean":
                                    np.asarray(meta["pixel_mean"],
                                               np.float32),
                                "pixel_std":
                                    np.asarray(meta["pixel_std"],
                                               np.float32),
                                # extraction/serving rebuild the trunk
                                # from this — a depth mismatch would
                                # half-transfer silently
                                "depth": np.asarray(depth)}})
            print(f"saved {path}")


if __name__ == "__main__":
    main()
