"""Training/eval stack: optimizer, jitted steps, checkpointing, eval engine."""
