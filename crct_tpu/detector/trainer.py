"""Detector training loop (reference Detector/frcnn.py solver).

SGD + momentum at the reference schedule (BASE_LR 2.5e-4, step decay gamma
0.1 at 10k..70k, 100k iters, weight decay 1e-4; frcnn.py:167-175) over a
jitted per-image-vmapped loss. Data parallelism shards the image batch over
the device mesh exactly like the QA stage.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from crct_tpu.detector.mask_rcnn import MaskRCNN
from crct_tpu.parallel.mesh import make_mesh, replicate, shard_batch

SOLVER_STEPS = (10000, 20000, 30000, 40000, 50000, 60000, 70000)


def detector_lr_schedule(base_lr: float = 2.5e-4, gamma: float = 0.1,
                         steps=SOLVER_STEPS, warmup_iters: int = 1000,
                         warmup_factor: float = 1e-3):
    """Step decay with Detectron2's default linear warmup
    (WarmupMultiStepLR: factor 1/1000 over the first 1000 iters), which the
    reference solver config inherits."""
    bounds = {int(s): gamma for s in steps}
    decay = optax.piecewise_constant_schedule(base_lr, bounds)

    def schedule(step):
        alpha = jnp.minimum(jnp.asarray(step, jnp.float32) / warmup_iters,
                            1.0)
        warm = warmup_factor * (1.0 - alpha) + alpha
        return decay(step) * warm

    return schedule


def _param_labels(params):
    """FrozenBN statistics/affines are constants (Detectron2
    FrozenBatchNorm2d buffers): route them to set_to_zero so neither the
    SGD update nor weight decay touches them — decay alone would pull
    pretrained var toward zero."""
    import jax

    def label(path, _):
        frozen = any("bn" in getattr(k, "key", "") for k in path)
        return "frozen" if frozen else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_detector_optimizer(base_lr: float = 2.5e-4,
                            weight_decay: float = 1e-4,
                            momentum: float = 0.9):
    return optax.multi_transform(
        {"train": optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(detector_lr_schedule(base_lr), momentum=momentum)),
         "frozen": optax.set_to_zero()},
        _param_labels,
    )


def make_detector_train_step(model: MaskRCNN,
                             tx: optax.GradientTransformation):
    def loss_one(params, image, gtb, gtc, gtv, gtm, rng):
        losses = model.apply({"params": params}, image, train=True,
                             gt_boxes=gtb, gt_classes=gtc, gt_valid=gtv,
                             gt_masks28=gtm, rng=rng)
        return losses

    def train_step(params, opt_state, batch, rng):
        def batched_loss(p):
            rngs = jax.random.split(rng, batch["image"].shape[0])
            losses = jax.vmap(loss_one,
                              in_axes=(None, 0, 0, 0, 0, 0, 0))(
                p, batch["image"], batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"], batch.get("gt_masks28",
                                             jnp.zeros((batch["image"].shape[0],
                                                        1, 28, 28))), rngs)
            mean = {k: jnp.mean(v) for k, v in losses.items()}
            return mean["total"], mean

        (_, losses), grads = jax.value_and_grad(batched_loss,
                                                has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return train_step


class DetectorTrainer:
    def __init__(self, dataset, *, num_classes: int, with_mask: bool = True,
                 depth: int = 50, batch_size: int = 2, base_lr: float = 2.5e-4,
                 seed: int = 0, roi_batch: int = 256,
                 post_nms_topk: int = 512, batch_multiply: int = 1,
                 stride_in_1x1: bool = False, freeze_at: int = 0,
                 dtype=jnp.float32, fast_nms: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        # mesh size must divide the image batch
        n_dev = len(jax.devices())
        usable = max(d for d in range(1, n_dev + 1) if batch_size % d == 0)
        self.mesh = make_mesh(usable)
        self.model = MaskRCNN(num_classes=num_classes, depth=depth,
                              with_mask=with_mask, roi_batch=roi_batch,
                              post_nms_topk_train=post_nms_topk,
                              post_nms_topk_test=post_nms_topk,
                              stride_in_1x1=stride_in_1x1,
                              freeze_at=freeze_at, dtype=dtype,
                              fast_train_nms=fast_nms)
        sample = dataset[0]
        init = jax.jit(partial(self._init_fn, sample))(jax.random.key(seed))
        self.params = init
        self.tx = make_detector_optimizer(base_lr)
        if batch_multiply > 1:
            # gradient accumulation (the reference defined BigBatchTrainer
            # for this but never wired it, frcnn.py:28-71,197)
            self.tx = optax.MultiSteps(self.tx, batch_multiply)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        self.params = replicate(self.params, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)
        self.step_fn = jax.jit(make_detector_train_step(self.model, self.tx),
                               donate_argnums=(0, 1))
        self.step = 0
        self._rng = jax.random.key(seed + 1)

    def _init_fn(self, sample, rng):
        variables = self.model.init(
            rng, jnp.asarray(sample["image"]), train=True,
            gt_boxes=jnp.asarray(sample["gt_boxes"]),
            gt_classes=jnp.asarray(sample["gt_classes"]),
            gt_valid=jnp.asarray(sample["gt_valid"]),
            gt_masks28=jnp.asarray(sample.get(
                "gt_masks28", np.zeros((len(sample["gt_boxes"]), 28, 28)))),
            rng=rng)
        return variables["params"]

    def run_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        self._rng, sub = jax.random.split(self._rng)
        db = shard_batch({k: v for k, v in batch.items()
                          if isinstance(v, np.ndarray)}, self.mesh)
        self.params, self.opt_state, losses = self.step_fn(
            self.params, self.opt_state, db, sub)
        self.step += 1
        return {k: float(v) for k, v in losses.items()}


def detector_batch_iterator(dataset, batch_size: int, keys, max_iter: int,
                            *, seed: int = 0, prefetch: int = 2):
    """Background-threaded batch producer for detector training.

    __getitem__ costs ~25 ms/image at the 800px production shape (PNG
    decode + resize + mask rasterization); fetched serially that is
    host-bound against a ~150 ms train step. One producer thread builds
    the next batches while the device executes the current step (PIL
    decode/resize release the GIL). Shuffled epochs, wrap-around like the
    reference's infinite Detectron2 loader."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def produce():
        try:
            rng = np.random.default_rng(seed)
            order, pos = rng.permutation(len(dataset)), 0
            for _ in range(max_iter):
                idx = []
                for _ in range(batch_size):
                    if pos >= len(order):
                        order, pos = rng.permutation(len(dataset)), 0
                    idx.append(int(order[pos]))
                    pos += 1
                examples = [dataset[i] for i in idx]
                q.put({k: np.stack([ex[k] for ex in examples])
                       for k in keys})
            q.put(None)
        except BaseException as e:          # surface, don't hang the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def coco_evaluate(model: MaskRCNN, params, dataset, *,
                  max_images: Optional[int] = None,
                  infer_batch: int = 8) -> Dict[str, float]:
    """Run inference over a CocoDataset and compute bbox mAP
    (the reference's `--test` mode, frcnn.py:200-202). Images are vmapped
    into ``infer_batch``-sized device dispatches."""
    from crct_tpu.detector.coco import evaluate_detections

    # bbox-only evaluation (the reference's COCO bbox evaluator,
    # frcnn.py:74-83): skip the mask branch and fetch results in one
    # device_get per dispatch
    infer = jax.jit(jax.vmap(
        lambda p, im: model.apply({"params": p}, im, train=False,
                                  compute_masks=False),
        in_axes=(None, 0)))
    dets, gts = [], []
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for s in range(0, n, infer_batch):
        exs = [dataset[i] for i in range(s, min(s + infer_batch, n))]
        npad = infer_batch - len(exs)
        stack = np.stack([e["image"] for e in exs]
                         + [exs[-1]["image"]] * npad)
        outs = jax.device_get(infer(params, jnp.asarray(stack)))
        for j, ex in enumerate(exs):
            out = jax.tree.map(lambda x: x[j], outs)
            valid = out["valid"]
            dets.append({"boxes": out["boxes"][valid] / ex["scale"],
                         "scores": out["scores"][valid],
                         "classes": out["classes"][valid]})
            gv = ex["gt_valid"]
            gts.append({"boxes": ex["gt_boxes"][gv] / ex["scale"],
                        "classes": ex["gt_classes"][gv]})
    return evaluate_detections(dets, gts, model.num_classes)
