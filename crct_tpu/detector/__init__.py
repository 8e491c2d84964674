"""Detection stage: Flax Mask R-CNN + feature extraction pipeline.

TPU-native rebuild of the reference's Detectron2-based detector
(Detector/frcnn.py, Detector/extract_features.py): ResNet-FPN backbone, RPN
with fixed-k proposals, XLA RoIAlign, fixed-shape batched NMS, box/mask
heads, COCO-format data pipeline, and the offline chart-feature extractor
(<IMG> token injection, text/visual class split, OCR oracle, axes
normalization, pie geometry).
"""
