"""CRCT: backbone + NSP head + hybrid regressor + losses, one jittable forward.

Re-derivation of the reference's BertForMultiModalPreTraining + the
functional ``forward`` adapter (CRCT/backbone/vilbert.py:1499-1661,
CRCT/backbone/encoder_decorator.py:57-158), with every dynamic shape
eliminated:

  * the ``needs_regression`` boolean subset (vilbert.py:1588-1599) becomes a
    run-always regressor with mask-weighted losses,
  * DVQA inference clipping to the nearest legal float (vilbert.py:1619-1625)
    is a vectorized argmin over the 65-entry table,
  * the attention mask is built from sep_indices/hist_len with a broadcasted
    comparison (encoder_decorator.py:57-70,118-120).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from crct_tpu.config import CRCTModelConfig, DVQA_FLOATS
from crct_tpu.models.regressor import CERegressor, HybridRegressor
from crct_tpu.models.vilbert import PreTrainingHeads, TwoStreamEncoderModel


@struct.dataclass
class CRCTOutputs:
    """Fixed-shape per-row outputs (the reference's ``reg`` 5-tuple plus NSP).

    All vectors have batch length; regression entries are zero where
    needs_reg is False, mirroring vilbert.py:1590-1648.
    """
    nsp_logits: jnp.ndarray        # [B, 2]
    reg_output: jnp.ndarray        # [B] denormalized regression output
    reg_loss: jnp.ndarray          # [B] per-row regression loss (masked)
    reg_l1: jnp.ndarray            # [B] |pred - target| in normalized units
    reg_5_dist: jnp.ndarray        # [B] relative L1 distance
    correct_regs: jnp.ndarray      # [B] bool, within 5%
    correct_t_regs: jnp.ndarray    # [B] bool, within tolerance margin
    needs_reg: jnp.ndarray         # [B] bool
    nsp_loss: Optional[jnp.ndarray] = None   # scalar (train)
    loss: Optional[jnp.ndarray] = None       # scalar combined (train)
    cand_logits: Optional[jnp.ndarray] = None  # [B, C] fast-scorer scores


class CRCTModel(nn.Module):
    """Backbone + heads. ``train_mode`` selects SmoothL1(beta=.5) vs L1."""
    config: CRCTModelConfig
    categories: int = 228
    dataset: str = "plotqa"
    mask_prob_img: float = 0.0
    use_l1: bool = False          # -L1 flag (options.py:32)
    ce_reg: bool = False          # -CE_REG flag
    binary_answers: bool = False
    fast_scorer: bool = False     # -fast_scorer: light candidate head
    tol_margin: float = 0.01
    nsp_loss_coeff: float = 1.0
    reg_loss_coeff: float = 1.0

    @property
    def has_regressor(self) -> bool:
        # reference condition (vilbert.py:1518)
        return not self.binary_answers

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], *,
                 train: bool = False,
                 deterministic: Optional[bool] = None) -> CRCTOutputs:
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        det = (not train) if deterministic is None else deterministic

        tokens = batch["tokens"].astype(jnp.int32)
        token_types = batch["segments"].astype(jnp.int32)
        B, L = tokens.shape

        # attention mask from sep_indices/hist_len (encoder_decorator.py:118-120)
        if "attention_mask" in batch:
            attention_mask = batch["attention_mask"]
        else:
            sep_indices = batch["sep_indices"].astype(jnp.int32)
            hist_len = batch["hist_len"].astype(jnp.int32).reshape(B)
            seq_len = jnp.take_along_axis(
                sep_indices, hist_len[:, None], axis=1)[:, 0] + 1
            attention_mask = (jnp.arange(L)[None, :] < seq_len[:, None])
        attention_mask = attention_mask.astype(dtype)

        backbone = TwoStreamEncoderModel(
            cfg, self.categories, self.dataset, self.mask_prob_img, dtype,
            name="bert")
        t_seq, v_seq, t_pooled, v_pooled = backbone(
            tokens, token_types, batch["loc"], attention_mask,
            batch["image_feat"], batch["image_loc"],
            batch["image_target"].astype(jnp.int32), batch["image_mask"],
            batch.get("area"), deterministic=det)

        nsp_logits = PreTrainingHeads(cfg, dtype, name="cls")(
            t_pooled, v_pooled, deterministic=det).astype(jnp.float32)

        # ---- opt-in fast candidate scorer (one backbone pass/question) --
        cand_logits = None
        if self.fast_scorer and "cand_tokens" in batch:
            from crct_tpu.models.fast_scorer import FastScorer
            fused = (t_pooled + v_pooled if cfg.fusion_method == "sum"
                     else t_pooled * v_pooled)
            # emb_dim = hidden_size so the head can be warm-started from the
            # backbone's word embeddings (fast_scorer_train copies them in)
            cand_logits = FastScorer(cfg.vocab_size,
                                     emb_dim=cfg.hidden_size,
                                     hidden=cfg.bi_hidden_size, dtype=dtype,
                                     name="fast_scorer")(
                fused, batch["cand_tokens"].astype(jnp.int32),
                batch["cand_valid"])

        # ---- regression (always computed; masked by needs_reg) ----------
        R = batch["R"].astype(jnp.float32)            # [B, 4]
        needs_reg = R[:, 1] > 0
        zeros = jnp.zeros((B,), jnp.float32)
        reg_output = reg_loss = reg_l1 = reg_5_dist = zeros
        correct_regs = correct_t_regs = jnp.zeros((B,), bool)

        if self.has_regressor:
            hv_0 = v_seq[:, 0].astype(jnp.float32)
            hw_0 = t_seq[:, 0].astype(jnp.float32)
            if self.ce_reg:
                probs = CERegressor(cfg.hidden_size, cfg.v_hidden_size,
                                    name="regressor")(hv_0, hw_0)
                floats = jnp.asarray(DVQA_FLOATS, jnp.float32)
                targets_idx = R[:, 0].astype(jnp.int32)
                target_vals = floats[jnp.clip(targets_idx, 0, len(DVQA_FLOATS) - 1)]
                # reference feeds the softmax output to CrossEntropyLoss
                # (regressor.py:73 + vilbert.py:1521) — behavior preserved
                logp = jax.nn.log_softmax(probs, axis=-1)
                ce = -jnp.take_along_axis(logp, targets_idx[:, None],
                                          axis=-1)[:, 0]
                chosen = jnp.argmax(probs, axis=-1)
                out = floats[chosen]
                l1 = jnp.abs(out - target_vals)
                correct = chosen == targets_idx
                reg_output = jnp.where(needs_reg, out, 0.0)
                reg_loss = jnp.where(needs_reg, ce, 0.0)
                reg_l1 = jnp.where(needs_reg, l1, 0.0)
                reg_5_dist = reg_l1
                correct_regs = correct & needs_reg
                correct_t_regs = correct & needs_reg
            else:
                regression = HybridRegressor(
                    cfg.hidden_size, cfg.v_hidden_size,
                    name="regressor")(hv_0, hw_0).astype(jnp.float32)
                y_scale = jnp.where(R[:, 3] == 0, 1.0, R[:, 3])
                reg_targets = R[:, 0] / y_scale
                if self.dataset == "dvqa" and not train:
                    # clip to nearest legal float (vilbert.py:1619-1625)
                    floats = jnp.asarray(DVQA_FLOATS, jnp.float32)
                    denorm = regression * y_scale
                    nearest = floats[jnp.argmin(
                        jnp.abs(denorm[:, None] - floats[None, :]), axis=-1)]
                    regression = nearest / y_scale

                if self.use_l1 or not train:
                    per_row_loss = jnp.abs(regression - reg_targets)
                else:
                    # SmoothL1 beta=0.5 (vilbert.py:1528)
                    diff = jnp.abs(regression - reg_targets)
                    beta = 0.5
                    per_row_loss = jnp.where(diff < beta,
                                             0.5 * diff * diff / beta,
                                             diff - 0.5 * beta)
                    # zero gradients of impossible answers (vilbert.py:1639-1641)
                    per_row_loss = jnp.where(jnp.abs(reg_targets) > 1.0, 0.0,
                                             per_row_loss)
                l1 = jnp.abs(regression - reg_targets)
                # +-5% relative distance with zero special cases
                # (vilbert.py:1630-1636)
                d5 = l1 / jnp.where(reg_targets == 0, 1.0,
                                    jnp.abs(reg_targets))
                d5 = jnp.where(reg_targets == 0, 1.0, d5)
                both_zero = (regression == 0) & (reg_targets == 0)
                d5 = jnp.where(both_zero, 0.0, d5)
                correct = (d5 <= 0.05) | both_zero
                correct_t = l1 <= self.tol_margin

                reg_output = jnp.where(needs_reg, regression * y_scale, 0.0)
                reg_loss = jnp.where(needs_reg, per_row_loss, 0.0)
                reg_l1 = jnp.where(needs_reg, l1, 0.0)
                reg_5_dist = jnp.where(needs_reg, d5, 0.0)
                correct_regs = correct & needs_reg
                correct_t_regs = correct_t & needs_reg

        nsp_loss = loss = None
        if train and "next_sentence_labels" in batch:
            labels = batch["next_sentence_labels"].reshape(B).astype(jnp.int32)
            logp = jax.nn.log_softmax(nsp_logits, axis=-1)
            nsp_loss = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1))
            # combined loss: nsp + mean-over-batch reg loss
            # (encoder_decorator.py:147-153; regression[1].mean() includes
            # zeros for non-reg rows)
            loss = (self.nsp_loss_coeff * nsp_loss
                    + self.reg_loss_coeff * jnp.mean(reg_loss))

        return CRCTOutputs(nsp_logits=nsp_logits, reg_output=reg_output,
                           reg_loss=reg_loss, reg_l1=reg_l1,
                           reg_5_dist=reg_5_dist, correct_regs=correct_regs,
                           correct_t_regs=correct_t_regs, needs_reg=needs_reg,
                           nsp_loss=nsp_loss, loss=loss,
                           cand_logits=cand_logits)


def build_model(params: Dict[str, Any],
                config: Optional[CRCTModelConfig] = None) -> CRCTModel:
    """Construct a CRCTModel from a params dict (config layer glue)."""
    if config is None:
        if params.get("model_config"):
            config = CRCTModelConfig.from_json_file(params["model_config"])
        else:
            config = CRCTModelConfig()
    if params.get("bf16"):
        config.dtype = "bfloat16"
    if params.get("pallas"):
        config.use_pallas_attention = True
    return CRCTModel(
        config=config,
        categories=params.get("categories", 228) or 228,
        dataset=params.get("dataset", "plotqa"),
        mask_prob_img=params.get("mask_prob_img", 0.0),
        use_l1=params.get("L1", False),
        ce_reg=params.get("CE_REG", False),
        binary_answers=params.get("binary_answers", False),
        fast_scorer=params.get("fast_scorer", False),
        tol_margin=params.get("tol_margin", 0.01),
        nsp_loss_coeff=params.get("nsp_loss_coeff", 1.0),
        reg_loss_coeff=params.get("reg_loss_coeff", 1.0),
    )
