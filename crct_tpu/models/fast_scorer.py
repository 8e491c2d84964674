"""Opt-in fast candidate scorer for evaluation.

The reference scores every (question, candidate) pair with a full
two-stream forward — the x120 candidate fan-out is its eval bottleneck
(CRCT/evaluation.py:243-262, fig_dataloader.py:282-291). The fast scorer
is a structural alternative (no reference equivalent): the backbone
encodes chart+question ONCE per question (answer tokens masked out of the
attention), and a light head scores all candidate answers against the
fused pooled state — one backbone pass instead of up to 120.

The head is trained separately (backbone frozen) with a listwise softmax
cross-entropy over each question's candidate set; see
crct_tpu.train.fast_scorer_train. Accuracy is NOT bit-identical to the
reference protocol — this is a throughput/accuracy trade the user opts
into with ``-fast_scorer``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from crct_tpu.models.layers import BERT_INIT, dense, gelu

NEG_INF = -1e9


class FastScorer(nn.Module):
    """Candidate-answer scorer over the fused pooled question encoding.

    cand_tokens [B, C, A] (0-padded WordPiece ids per candidate) are
    embedded, mean-pooled, MLP-projected and dot-scored against a
    projection of the fused (t_pooled * v_pooled) state."""
    vocab_size: int
    emb_dim: int = 256
    hidden: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fused_pooled: jnp.ndarray, cand_tokens: jnp.ndarray,
                 cand_valid: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.emb_dim, dtype=self.dtype,
                       embedding_init=BERT_INIT,
                       name="cand_embeddings")(cand_tokens)   # [B,C,A,E]
        tok_mask = (cand_tokens > 0).astype(self.dtype)[..., None]
        denom = jnp.maximum(tok_mask.sum(axis=2), 1.0)
        pooled = (emb * tok_mask).sum(axis=2) / denom          # [B,C,E]
        h = dense(self.hidden, self.dtype, "cand_proj1")(pooled)
        h = gelu(h)
        h = dense(self.hidden, self.dtype, "cand_proj2")(h)    # [B,C,H]
        q = dense(self.hidden, self.dtype, "question_proj")(fused_pooled)
        scores = jnp.einsum("bh,bch->bc", q, h) / jnp.sqrt(
            jnp.asarray(self.hidden, self.dtype))
        scores = scores.astype(jnp.float32)
        return jnp.where(cand_valid > 0, scores, NEG_INF)
