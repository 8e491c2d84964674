"""Chart-image ingestion for serving (beyond-reference).

The reference pipeline is offline: `extract_features.py` writes `.npy`
feature shards to disk, then the QA stage loads them (reference
Detector/extract_features.py:460-575, CRCT/fig_dataloader.py:119-160).
Serving wants the ONLINE composition: a chart PNG arrives over HTTP, the
detector + extraction build the feature record in-process, and the QA
model answers questions about it seconds later — no disk round trip, no
shard layout.

``FigureIngestor`` wraps the extract CLI's exact per-image pipeline
(cli/extract_features.py) behind one call:

    resize_shortest_edge -> normalize -> pad to the compiled canvas ->
    jitted detect_with_roi_features (ONE trunk pass for detections + the
    <IMG> token) -> boxes back to original coordinates ->
    inject_img_token -> build_feature_record

Text attachment per request: a caller-supplied chart annotation (the GT
oracle / Hungarian-matched oracle the reference evaluates with) or real
OCR over the predicted boxes when pytesseract is available.

The jitted detect path compiles ONCE for the configured canvas; every
ingested image pads into it, so serving never recompiles.  A lock
serializes device dispatches — ingestion runs on HTTP request threads.
"""

from __future__ import annotations

import threading
from typing import Any, Dict, Optional, Tuple

import numpy as np


class IngestError(ValueError):
    """The image could not be turned into a usable feature record
    (no text elements detected / axes missing / annotation mismatch)."""


class FigureIngestor:
    """PNG -> feature record through a compiled detector.

    ``detector`` is a MaskRCNN flax module; ``det_params`` its params.
    ``canvas`` is the compiled (H, W) input shape (multiples of 32);
    ``short_edge`` the test-time ResizeShortestEdge target (0 = only
    downscale oversized images to fit the canvas).
    """

    def __init__(self, detector, det_params, *, dataset: str = "plotqa",
                 canvas: Tuple[int, int] = (832, 1344),
                 short_edge: int = 800,
                 pixel_mean: Optional[np.ndarray] = None,
                 pixel_std: Optional[np.ndarray] = None):
        import jax
        from crct_tpu.detector.coco import PIXEL_MEAN, PIXEL_STD
        from crct_tpu.detector.extract import make_detect_one, parse_canvas

        canvas = parse_canvas(f"{int(canvas[0])},{int(canvas[1])}")
        self.detector = detector
        self.det_params = det_params
        self.dataset = dataset
        self.canvas = canvas
        self.short_edge = int(short_edge)
        self.pixel_mean = np.asarray(
            PIXEL_MEAN if pixel_mean is None else pixel_mean, np.float32)
        self.pixel_std = np.asarray(
            PIXEL_STD if pixel_std is None else pixel_std, np.float32)
        self._lock = threading.Lock()
        # the extract CLI's exact detect closure (detections + <IMG> token
        # from one trunk pass), single-image jit: serving is latency-bound
        self._detect = jax.jit(make_detect_one(detector))

    # ------------------------------------------------------------------
    @classmethod
    def from_weights(cls, weights_path: str, *, dataset: str = "plotqa",
                     num_classes: int = 228,
                     canvas: Tuple[int, int] = (832, 1344),
                     short_edge: int = 800) -> "FigureIngestor":
        """Production constructor: detector geometry + preprocessing
        conventions derived from the weights file, exactly like the
        extract CLI (cli/extract_features.py)."""
        from crct_tpu.detector.extract import detector_from_weights
        model, params, pixel_mean, pixel_std = detector_from_weights(
            weights_path, dataset=dataset, num_classes=num_classes,
            canvas=canvas)
        return cls(model, params, dataset=dataset, canvas=canvas,
                   short_edge=short_edge,
                   pixel_mean=pixel_mean, pixel_std=pixel_std)

    # ------------------------------------------------------------------
    def warmup(self) -> None:
        """Pay the detector compile before accepting traffic."""
        import jax
        import jax.numpy as jnp
        h, w = self.canvas
        with self._lock:
            out = self._detect(self.det_params,
                               jnp.zeros((h, w, 3), jnp.float32),
                               jnp.asarray([float(h), float(w)]))
            jax.block_until_ready(out)

    def ingest(self, image, image_id: int, *,
               annotation: Optional[Dict[str, Any]] = None,
               ocr_mode: Optional[str] = None) -> Dict[str, Any]:
        """Run the full extraction pipeline on one image.

        ``image``: PIL image or HxWx3 uint8/float array (RGB).
        ``annotation``: the chart's GT annotation dict (the reference's
        annotations.json entry) for 'gt'/'oracle' text attachment.
        ``ocr_mode``: 'gt' | 'oracle' | 'ocr'; defaults to 'oracle' when an
        annotation is supplied, else 'ocr' (requires pytesseract).
        Returns the feature record `.npy` shards carry; raises IngestError
        when the chart yields no usable record.
        """
        import jax.numpy as jnp
        from crct_tpu.detector.extract import (build_feature_record,
                                               get_gt_texts, get_nonvis_ids,
                                               inject_img_token,
                                               resize_shortest_edge)

        if ocr_mode is None:
            ocr_mode = "oracle" if annotation is not None else "ocr"
        if ocr_mode not in ("gt", "oracle", "ocr"):
            raise IngestError(f"unknown ocr_mode {ocr_mode!r}: expected "
                              f"'gt', 'oracle' or 'ocr'")
        if ocr_mode in ("gt", "oracle") and annotation is None:
            raise IngestError(f"ocr_mode={ocr_mode!r} needs a chart "
                              f"annotation; supply one or use real OCR")
        if ocr_mode == "ocr":
            try:
                import pytesseract  # noqa: F401
            except ImportError:
                raise IngestError(
                    "ocr_mode='ocr' needs pytesseract; it is not "
                    "installed — supply an annotation for oracle mode")

        raw = np.asarray(getattr(image, "convert", lambda _m: image)("RGB"),
                         np.float32)
        if raw.ndim != 3 or raw.shape[2] != 3:
            raise IngestError(f"expected an RGB image, got {raw.shape}")
        h0, w0 = raw.shape[:2]
        nh, nw = resize_shortest_edge(h0, w0, self.short_edge, self.canvas)
        if (nh, nw) != (h0, w0):
            from PIL import Image
            arr = np.asarray(
                Image.fromarray(raw.astype(np.uint8)).resize(
                    (nw, nh), Image.BILINEAR), np.float32)
        else:
            arr = raw
        padded = np.zeros((*self.canvas, 3), np.float32)
        padded[:nh, :nw] = (arr - self.pixel_mean) / self.pixel_std

        with self._lock:
            out, img_feat = self._detect(
                self.det_params, jnp.asarray(padded),
                jnp.asarray([float(nh), float(nw)]))
            out = {k: np.asarray(v) for k, v in out.items()}
            img_feat = np.asarray(img_feat)

        valid = out["valid"]
        feats = out["features"][valid]
        boxes = out["boxes"][valid] * np.asarray(
            [w0 / nw, h0 / nh, w0 / nw, h0 / nh], np.float32)
        classes = out["classes"][valid]
        feats, classes, boxes = inject_img_token(feats, classes, boxes,
                                                 img_feat, (h0, w0))

        gt_texts = None
        if annotation is not None and ocr_mode != "ocr":
            _, cls_dict = get_nonvis_ids(self.dataset)
            gt_texts = get_gt_texts(annotation, cls_dict, self.dataset)
        record = build_feature_record(
            int(image_id), feats, classes, boxes, (h0, w0),
            dataset=self.dataset, gt_texts=gt_texts, ocr_mode=ocr_mode,
            image=raw.astype(np.uint8) if ocr_mode == "ocr" else None)
        if record["vis_feat"] is None:
            raise IngestError(
                "chart yielded no usable record (no text elements "
                "detected or axes could not be derived)")
        return record
