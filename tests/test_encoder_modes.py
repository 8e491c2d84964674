"""Encoder schedule options: frozen prefixes, in_batch_pairs, fast_mode,
with_coattention=False."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.models.crct import CRCTModel
from tests.helpers import tiny_model_config
from tests.test_model import make_batch


def _grads(cfg, batch):
    import functools
    model = CRCTModel(config=cfg, categories=10)
    v = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    g = jax.jit(jax.grad(lambda p: model.apply(
        {"params": p}, batch, train=True,
        rngs={"dropout": jax.random.key(2)}).loss))(v["params"])
    return v["params"], g


def test_fixed_t_layer_freezes_prefix():
    batch = make_batch(np.random.default_rng(0))
    cfg = tiny_model_config(fixed_t_layer=2)
    params, g = _grads(cfg, batch)
    enc = g["bert"]["encoder"]
    # frozen text layers get zero gradient
    for name in ("t_layer_0", "t_layer_1"):
        assert all(float(jnp.abs(x).max()) == 0
                   for x in jax.tree.leaves(enc[name])), name
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree.leaves(enc["t_layer_2"]))
    # the embeddings feed only the frozen prefix (all t-layers run before the
    # first connection in the tiny config)... position/word embeddings still
    # get grads via later layers, so just check the vision side is alive
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree.leaves(enc["v_layer_0"]))


def test_fixed_v_layer_freezes_prefix():
    batch = make_batch(np.random.default_rng(0))
    cfg = tiny_model_config(fixed_v_layer=1)
    params, g = _grads(cfg, batch)
    enc = g["bert"]["encoder"]
    assert all(float(jnp.abs(x).max()) == 0
               for x in jax.tree.leaves(enc["v_layer_0"]))
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree.leaves(enc["v_layer_1"]))


def test_no_coattention_mode():
    batch = make_batch(np.random.default_rng(0))
    cfg = tiny_model_config(with_coattention=False)
    model = CRCTModel(config=cfg, categories=10)
    v = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert np.isfinite(np.asarray(out.nsp_logits)).all()


def test_in_batch_pairs_expands_to_batch_squared():
    B = 3
    batch = make_batch(np.random.default_rng(0), B=B)
    cfg = tiny_model_config(in_batch_pairs=True)
    from crct_tpu.models.vilbert import TwoStreamEncoder
    from crct_tpu.models.layers import extended_attention_mask
    enc = TwoStreamEncoder(cfg)
    rng = np.random.default_rng(1)
    t_emb = jnp.asarray(rng.random((B, 8, cfg.hidden_size)), jnp.float32)
    v_emb = jnp.asarray(rng.random((B, 4, cfg.v_hidden_size)), jnp.float32)
    t_mask = extended_attention_mask(jnp.ones((B, 8)))
    v_mask = extended_attention_mask(jnp.ones((B, 4)))
    p = enc.init(jax.random.key(0), t_emb, v_emb, t_mask, v_mask)
    t_out, v_out = enc.apply(p, t_emb, v_emb, t_mask, v_mask)
    assert t_out.shape[0] == B * B
    assert v_out.shape[0] == B * B


def test_fast_mode_broadcasts_text():
    cfg = tiny_model_config(fast_mode=True)
    from crct_tpu.models.vilbert import TwoStreamEncoder
    from crct_tpu.models.layers import extended_attention_mask
    enc = TwoStreamEncoder(cfg)
    rng = np.random.default_rng(1)
    t_emb = jnp.asarray(rng.random((1, 8, cfg.hidden_size)), jnp.float32)
    v_emb = jnp.asarray(rng.random((5, 4, cfg.v_hidden_size)), jnp.float32)
    t_mask = extended_attention_mask(jnp.ones((1, 8)))
    v_mask = extended_attention_mask(jnp.ones((5, 4)))
    p = enc.init(jax.random.key(0), t_emb, v_emb, t_mask, v_mask)
    t_out, v_out = enc.apply(p, t_emb, v_emb, t_mask, v_mask)
    assert t_out.shape[0] == 5 and v_out.shape[0] == 5
