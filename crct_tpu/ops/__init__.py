"""TPU kernels and XLA-friendly ops: fused attention, RoIAlign, batched NMS."""
