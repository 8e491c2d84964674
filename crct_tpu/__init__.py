"""CRCT-TPU: a TPU-native (JAX/XLA/Pallas) chart-question-answering framework.

A from-scratch rebuild of the capabilities of "Classification-Regression for
Chart Comprehension" (CRCT, ECCV 2022; reference implementation
levymsn/CQA-CRCT) designed TPU-first:

  * the two-stream (text/vision) co-attention QA model is pure-functional
    Flax with fixed shapes end to end (``crct_tpu.models``),
  * hot attention ops have Pallas TPU kernels (``crct_tpu.ops``),
  * data parallelism is a ``jax.sharding.Mesh`` + jit sharding instead of
    torch DDP/NCCL (``crct_tpu.parallel``),
  * the detection stage (Mask R-CNN + feature extraction) is XLA-friendly:
    static-shape RoIAlign and masked NMS (``crct_tpu.detector``),
  * the per-sample example builder mirrors the reference's answer semantics
    exactly (``crct_tpu.data``) so published behavior reproduces.
"""

__version__ = "0.1.0"
