"""The two-stream (text/vision) co-attention encoder ("ViLBERT-style").

TPU-native re-design of the reference's BertModel stack
(CRCT/backbone/vilbert.py:297-1496): text embeddings with location and
chart-element-type embeddings, vision embeddings over detector RoI features,
interleaved self-attention / co-attention schedule driven by
(v_biattention_id, t_biattention_id), CLS poolers, fusion and the NSP
answer-ranking head. Everything is fixed-shape and jit-compatible; the
position-id and zeroing tricks of the reference are reproduced with masked
ops instead of in-place writes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from crct_tpu.config import CRCTModelConfig
from crct_tpu.models.layers import (BERT_INIT, ConnectionLayer,
                                    TransformerLayer, dense,
                                    extended_attention_mask)


class TextEmbeddings(nn.Module):
    """word + position + chart-element-type + location embeddings
    (reference BertEmbeddingLocation, vilbert.py:297-358).

    Position ids count only Q (type -1) and A (type 1) tokens, starting at 0
    from the first such token; all other positions embed as zero. Location
    embeddings are zeroed where the 4-d loc is all-zero. Type embeddings use
    slot 0 for Q tokens and are zeroed for type-0 (CLS/padding) tokens.
    """
    config: CRCTModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, loc, deterministic=True):
        cfg = self.config
        B, L = input_ids.shape
        is_qa = (token_type_ids == -1) | (token_type_ids == 1)
        positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
        # non-QA positions -> L, subtract per-row min, then zero them
        masked_pos = jnp.where(is_qa, positions, L)
        first_qa = jnp.min(masked_pos, axis=-1, keepdims=True)
        rel_pos = jnp.where(is_qa, masked_pos - first_qa, 0)

        word_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, embedding_init=BERT_INIT, name="word_embeddings")(input_ids)
        pos_emb = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype, embedding_init=BERT_INIT, name="position_embeddings")(rel_pos)
        pos_emb = jnp.where(is_qa[..., None], pos_emb, 0)

        loc_emb = dense(cfg.hidden_size, self.dtype, "txt_location_embeddings")(loc.astype(self.dtype))
        loc_emb = jnp.where(
            (jnp.sum(jnp.abs(loc), axis=-1) == 0)[..., None], 0, loc_emb)

        type_ids = jnp.where(token_type_ids == -1, 0, token_type_ids)
        type_emb = nn.Embed(cfg.plotqa_vocab_types, cfg.hidden_size, dtype=self.dtype, embedding_init=BERT_INIT, name="plotqa_type_embeddings")(type_ids)
        type_emb = jnp.where((token_type_ids == 0)[..., None], 0, type_emb)

        emb = word_emb + pos_emb + type_emb + loc_emb
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="LayerNorm")(emb)
        return nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)


class ImageEmbeddings(nn.Module):
    """Detector-feature embeddings (reference BertImageEmbeddings,
    vilbert.py:1444-1496): softmax over the 1024-d RoI feature then a linear
    projection, plus 4-d location and class ("color") embeddings; figure_qa /
    dvqa variants drop the RoI features and may add an area embedding.
    Train-time random embedding masking implements mask_prob_img.
    """
    config: CRCTModelConfig
    categories: int
    dataset: str = "plotqa"
    mask_prob_img: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feat, image_loc, image_class, areas=None,
                 deterministic=True):
        cfg = self.config
        img_emb = dense(cfg.v_hidden_size, self.dtype, "new_image_embeddings")(
            jax.nn.softmax(image_feat.astype(self.dtype), axis=-1))
        loc_emb = dense(cfg.v_hidden_size, self.dtype, "new_loc_emb")(image_loc.astype(self.dtype))
        color_emb = nn.Embed(self.categories + 1, cfg.v_hidden_size,
                             dtype=self.dtype, embedding_init=BERT_INIT,
                             name="color_emb")(image_class)
        if self.dataset in ("figure_qa", "dvqa"):
            emb = loc_emb + color_emb
        else:
            emb = img_emb + loc_emb + color_emb
        if areas is not None:
            emb = emb + dense(cfg.v_hidden_size, self.dtype, "areas_emb")(
                areas.astype(self.dtype)[..., None])
        if not deterministic and self.mask_prob_img > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.uniform(rng, emb.shape[:2]) >= self.mask_prob_img
            emb = emb * keep[..., None]
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="LayerNorm")(emb)
        return nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)


class TwoStreamEncoder(nn.Module):
    """Interleaved v/t self-attention + co-attention schedule
    (reference BertEncoder, vilbert.py:791-946).

    The schedule is static Python control flow over the config id lists, so
    XLA sees one flat graph (for plotqa: t0..t5, [c0, v0, t6, c1, v1, t7, ...,
    c5], then v5, t11).
    """
    config: CRCTModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        kw = dict(layer_norm_eps=cfg.layer_norm_eps, dtype=self.dtype,
                  use_pallas=cfg.use_pallas_attention)
        # optional rematerialization: trade recompute for activation memory
        # (jax.checkpoint over each encoder block; deterministic is static)
        TLayer = (nn.remat(TransformerLayer, static_argnums=(3,))
                  if cfg.remat else TransformerLayer)
        CLayer = (nn.remat(ConnectionLayer, static_argnums=(5,))
                  if cfg.remat else ConnectionLayer)
        t_layer = lambda i: TLayer(
            cfg.hidden_size, cfg.num_attention_heads, cfg.intermediate_size,
            cfg.hidden_act, cfg.attention_probs_dropout_prob,
            cfg.hidden_dropout_prob, name=f"t_layer_{i}", **kw)
        v_layer = lambda i: TLayer(
            cfg.v_hidden_size, cfg.v_num_attention_heads,
            cfg.v_intermediate_size, cfg.v_hidden_act,
            cfg.v_attention_probs_dropout_prob, cfg.v_hidden_dropout_prob,
            name=f"v_layer_{i}", **kw)
        c_layer = lambda i: CLayer(
            cfg.v_hidden_size, cfg.hidden_size, cfg.bi_hidden_size,
            cfg.bi_num_attention_heads, cfg.v_intermediate_size,
            cfg.intermediate_size, cfg.v_hidden_act, cfg.hidden_act,
            cfg.v_attention_probs_dropout_prob,
            cfg.attention_probs_dropout_prob, cfg.v_hidden_dropout_prob,
            cfg.hidden_dropout_prob, name=f"c_layer_{i}", **kw)
        self.t_layers = [t_layer(i) for i in range(cfg.num_hidden_layers)]
        self.v_layers = [v_layer(i) for i in range(cfg.v_num_hidden_layers)]
        self.c_layers = [c_layer(i) for i in range(len(cfg.v_biattention_id))]

    def __call__(self, t_emb, v_emb, t_mask, v_mask, deterministic=True):
        cfg = self.config
        v_start = t_start = 0
        B = t_emb.shape[0]
        for count, (v_end, t_end) in enumerate(
                zip(cfg.v_biattention_id, cfg.t_biattention_id)):
            for idx in range(v_start, v_end):
                v_emb = self.v_layers[idx](v_emb, v_mask, deterministic)
                if idx < cfg.fixed_v_layer:
                    # frozen prefix (reference no_grad, vilbert.py:860-866)
                    v_emb = jax.lax.stop_gradient(v_emb)
            for idx in range(t_start, t_end):
                t_emb = self.t_layers[idx](t_emb, t_mask, deterministic)
                if idx < cfg.fixed_t_layer:
                    t_emb = jax.lax.stop_gradient(t_emb)
            if count == 0 and cfg.in_batch_pairs:
                # batch^2 expansion: every text paired with every image
                # (reference vilbert.py:888-895)
                v_emb = jnp.tile(v_emb, (B, 1, 1))
                v_mask = jnp.tile(v_mask, (B, 1, 1, 1))
                t_emb = jnp.repeat(t_emb, B, axis=0)
                t_mask = jnp.repeat(t_mask, B, axis=0)
            if count == 0 and cfg.fast_mode:
                # broadcast one text row over the image batch
                # (reference vilbert.py:897-899)
                t_emb = jnp.broadcast_to(
                    t_emb, (v_emb.shape[0],) + t_emb.shape[1:])
                t_mask = jnp.broadcast_to(
                    t_mask, (v_emb.shape[0],) + t_mask.shape[1:])
            if cfg.with_coattention:
                v_emb, t_emb = self.c_layers[count](
                    v_emb, v_mask, t_emb, t_mask, deterministic)
            v_start, t_start = v_end, t_end
        for idx in range(v_start, cfg.v_num_hidden_layers):
            v_emb = self.v_layers[idx](v_emb, v_mask, deterministic)
        for idx in range(t_start, cfg.num_hidden_layers):
            t_emb = self.t_layers[idx](t_emb, t_mask, deterministic)
        return t_emb, v_emb


class Pooler(nn.Module):
    """CLS-state pooler: Dense(->bi_hidden) + ReLU
    (reference BertTextPooler/BertImagePooler, vilbert.py:949-976)."""
    bi_hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        first = hidden_states[:, 0]
        return nn.relu(dense(self.bi_hidden_size, self.dtype, "dense")(first))


class TwoStreamEncoderModel(nn.Module):
    """Full backbone: embeddings -> encoder -> poolers
    (reference BertModel, vilbert.py:1288-1441)."""
    config: CRCTModelConfig
    categories: int
    dataset: str = "plotqa"
    mask_prob_img: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, txt_loc, attention_mask,
                 image_feat, image_loc, image_class, image_mask, areas=None,
                 deterministic: bool = True):
        cfg = self.config
        t_mask = extended_attention_mask(attention_mask, self.dtype)
        v_mask = extended_attention_mask(image_mask, self.dtype)
        t_emb = TextEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, token_type_ids, txt_loc, deterministic)
        v_emb = ImageEmbeddings(cfg, self.categories, self.dataset,
                                self.mask_prob_img, self.dtype,
                                name="v_embeddings")(
            image_feat, image_loc, image_class, areas, deterministic)
        t_seq, v_seq = TwoStreamEncoder(cfg, self.dtype, name="encoder")(
            t_emb, v_emb, t_mask, v_mask, deterministic)
        t_pooled = Pooler(cfg.bi_hidden_size, self.dtype, name="t_pooler")(t_seq)
        v_pooled = Pooler(cfg.bi_hidden_size, self.dtype, name="v_pooler")(v_seq)
        return t_seq, v_seq, t_pooled, v_pooled


class PreTrainingHeads(nn.Module):
    """Fusion (mul/sum) + NSP answer-ranking head
    (reference BertPreTrainingHeads, vilbert.py:1038-1062)."""
    config: CRCTModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t_pooled, v_pooled, deterministic: bool = True):
        cfg = self.config
        if cfg.fusion_method == "sum":
            pooled = t_pooled + v_pooled
        elif cfg.fusion_method == "mul":
            pooled = t_pooled * v_pooled
        else:
            raise ValueError(cfg.fusion_method)
        pooled = nn.Dropout(0.1)(pooled, deterministic=deterministic)
        return dense(2, self.dtype, "bi_seq_relationship")(pooled)
