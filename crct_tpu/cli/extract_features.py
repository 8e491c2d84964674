"""Feature extraction CLI (reference Detector/extract_features.py).

Usage parity:
    python -m crct_tpu.cli.extract_features --load-weights det.ckpt \
        --dir-path data/PlotQA/ --split train --output out/ \
        --batch-size 64 [--chunk a:b] [--ocr-gt | --OCR] --dataset plotqa

Per image: run the jitted detector, inject the <IMG> whole-image element,
attach text (GT oracle / Hungarian oracle / real OCR), derive axes and
normalize geometry, then append to chunked `.npy` shards with `--chunk`
range resume.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Extract chart features")
    p.add_argument('--dir-path', type=str, default="")
    p.add_argument('--load-weights', type=str, required=True)
    p.add_argument('--split', type=str, default="train")
    p.add_argument('--output', type=str, required=True)
    p.add_argument('--batch-size', type=int, required=True,
                   help="images per output shard (chunk size)")
    p.add_argument('--chunk', type=str, default=None, help="resume range a:b")
    p.add_argument('--ocr-gt', action="store_true", help="pure GT-oracle text")
    p.add_argument('--OCR', action="store_true", help="real OCR (pytesseract)")
    p.add_argument('--dataset', type=str, default='plotqa',
                   choices=['figure_qa', 'plotqa', 'dvqa'])
    p.add_argument('--num-classes', type=int, default=228)
    p.add_argument('--image-size', type=str, default="1344",
                   help="compiled canvas: one number (square) or 'H,W'. A "
                        "rectangular canvas matched to the dataset's "
                        "orientation (e.g. '832,1344' for landscape charts "
                        "at short-edge 800) cuts detector compute ~1.6x vs "
                        "the square default; dims must be multiples of 32 "
                        "(FPN strides)")
    p.add_argument('--short-edge', type=int, default=800,
                   help="test-time ResizeShortestEdge target (Detectron2 "
                        "INPUT.MIN_SIZE_TEST; the reference resizes via "
                        "predictor.aug, extract_features.py:38-44). Capped "
                        "so the image fits the --image-size canvas. 0 "
                        "disables resizing (oversized images are then "
                        "downscaled to fit rather than cropped).")
    p.add_argument('--infer-batch', type=int, default=8,
                   help="images per device dispatch (vmapped detector)")
    p.add_argument('--depth', type=int, default=0, choices=[0, 14, 50, 101],
                   help="ResNet trunk depth (default 0 = derived from the "
                        "weights file, else the dataset rule: R101 for "
                        "figure_qa, R50 otherwise); an explicit value that "
                        "contradicts the weights file is an error")
    p.add_argument('--score-thresh', type=float, default=0.5,
                   help="detection score cut (reference SCORE_THRESH_TEST "
                        "0.5, Detector/frcnn.py:133). Lower it for weakly "
                        "trained detectors whose text classes would "
                        "otherwise all fall below the cut and poison the "
                        "records with empty OCR text")
    args = p.parse_args(argv)
    if args.dataset == 'dvqa' and args.ocr_gt:
        p.error("dvqa does not support --ocr-gt: DVQA GT annotations have "
                "no class labels (the reference crashes on this path too, "
                "extract_features.py:503-510). Use oracle mode or --OCR.")
    from crct_tpu.detector.extract import parse_canvas
    try:
        canvas_h, canvas_w = parse_canvas(args.image_size)
    except ValueError as exc:
        p.error(f"--image-size: {exc}")

    import jax
    from crct_tpu.detector.extract import (build_feature_record, chunk_gen,
                                           detector_from_weights,
                                           get_gt_texts, get_nonvis_ids,
                                           inject_img_token, make_detect_one,
                                           path_to_img_id,
                                           resize_shortest_edge,
                                           sorted_image_files)

    ann_path = os.path.join(args.dir_path, args.split, "annotations.json")
    gt_ann = None
    if os.path.isfile(ann_path):
        print(f"Reading ground [{args.split}] annotations...")
        with open(ann_path) as f:
            gt_ann = json.load(f)

    # detector geometry + preprocessing conventions derived from the
    # weights layout; masks are never written to feature records, so the
    # mask branch is skipped by detect_with_roi_features
    model, params, pixel_mean, pixel_std = detector_from_weights(
        args.load_weights, dataset=args.dataset,
        num_classes=args.num_classes, canvas=(canvas_h, canvas_w),
        depth=args.depth, score_thresh=args.score_thresh)

    # batched inference: vmap over images, one device dispatch per
    # --infer-batch (the reference runs Detectron2 image-by-image;
    # batching amortizes dispatch latency and fills the chip)
    detect_batch = jax.jit(jax.vmap(make_detect_one(model),
                                    in_axes=(None, 0, 0)))

    ocr_mode = "ocr" if args.OCR else ("gt" if args.ocr_gt else "oracle")
    png_dir = os.path.join(args.dir_path, args.split, "png")
    files = sorted_image_files(png_dir)
    os.makedirs(args.output, exist_ok=True)
    n_chunks = len(range(0, len(files), args.batch_size))
    print(f"Dataset images path: {png_dir}")
    print(f"Start to calculate. Total chunks: {n_chunks}", flush=True)

    _, cls_dict = get_nonvis_ids(args.dataset)
    from PIL import Image
    start = time.time()
    IB = max(1, args.infer_batch)
    for k, (c_id, chunk_files) in enumerate(
            chunk_gen(files, args.batch_size, args.chunk)):
        records = []
        raws, sizes, resized_hw = [], [], []
        for img_path in chunk_files:
            im = Image.open(img_path).convert("RGB")
            w0, h0 = im.size
            sizes.append((h0, w0))
            # test-time ResizeShortestEdge: detection runs at the same
            # scale distribution the detector trained at (CocoDataset
            # resizes to short-edge 800); boxes are scaled back to the
            # original image afterwards, like Detectron2's _postprocess
            # (reference get_input/get_features, extract_features.py:38-70)
            nh, nw = resize_shortest_edge(h0, w0, args.short_edge,
                                          (canvas_h, canvas_w))
            resized_hw.append((nh, nw))
            if (nh, nw) != (h0, w0):
                arr = np.asarray(im.resize((nw, nh), Image.BILINEAR),
                                 np.float32)
            else:
                arr = np.asarray(im, np.float32)
            raw = np.asarray(im, np.float32)      # original scale (for OCR)
            norm = (arr - pixel_mean) / pixel_std
            padded = np.zeros((canvas_h, canvas_w, 3), np.float32)
            padded[:nh, :nw] = norm
            raws.append((padded, raw))
        from crct_tpu.detector.extract import batched_detect
        whs = [np.asarray([nh, nw], np.float32) for nh, nw in resized_hw]
        det_out = batched_detect(detect_batch, params,
                                 [p for p, _ in raws], IB, whs)
        for (img_path, (h, w), (nh, nw), (out, img_feat), (_, raw)) in zip(
                chunk_files, sizes, resized_hw, det_out, raws):
            valid = np.asarray(out["valid"])
            feats = np.asarray(out["features"])[valid]
            boxes = np.asarray(out["boxes"])[valid]
            # detector coords -> original image coords
            boxes = boxes * np.asarray([w / nw, h / nh, w / nw, h / nh],
                                       np.float32)
            classes = np.asarray(out["classes"])[valid]
            feats, classes, boxes = inject_img_token(
                feats, classes, boxes, np.asarray(img_feat), (h, w))

            image_id = path_to_img_id(img_path)
            gt_texts = None
            if gt_ann is not None and ocr_mode != "ocr":
                if args.dataset == 'dvqa':
                    ann = gt_ann[image_id - 1]
                    assert image_id == int(
                        ann['image'].split("_")[-1].split(".")[0])
                else:
                    ann = gt_ann[image_id]
                    assert image_id == ann['image_index']
                gt_texts = get_gt_texts(ann, cls_dict, args.dataset)
            records.append(build_feature_record(
                image_id, feats, classes, boxes, (h, w),
                dataset=args.dataset, gt_texts=gt_texts, ocr_mode=ocr_mode,
                image=raw.astype(np.uint8) if ocr_mode == "ocr" else None))
        np.save(os.path.join(args.output, f"{c_id}.npy"),
                np.asarray(records, dtype=object), allow_pickle=True)
        print(f"Chunk saved: {c_id}/{n_chunks}. "
              f"elapsed: {time.time() - start:.1f}s", flush=True)


if __name__ == "__main__":
    main()
