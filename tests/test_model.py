"""Model unit tests: shapes, schedule, masking semantics, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.models.crct import CRCTModel
from crct_tpu.models.layers import dot_product_attention, extended_attention_mask
from crct_tpu.models.regressor import CERegressor, HybridRegressor
from tests.helpers import tiny_model_config


def make_batch(rng, B=4, L=16, R=6, vocab=600, vdim=32, cats=10,
               with_labels=True):
    batch = {
        "tokens": jnp.asarray(rng.integers(0, vocab, (B, L)), jnp.int32),
        "segments": jnp.asarray(rng.integers(-1, 5, (B, L)), jnp.int32),
        "loc": jnp.asarray(rng.random((B, L, 4)), jnp.float32),
        "sep_indices": jnp.zeros((B, 50), jnp.int32).at[:, 0].set(L - 2),
        "hist_len": jnp.zeros((B, 1), jnp.int32),
        "image_feat": jnp.asarray(rng.random((B, R, vdim)), jnp.float32),
        "image_loc": jnp.asarray(rng.random((B, R, 4)), jnp.float32),
        "image_target": jnp.asarray(rng.integers(0, cats, (B, R)), jnp.int32),
        "image_mask": jnp.ones((B, R), jnp.float32),
        "R": jnp.asarray([[5.0, 1, 0.01, 10.0]] * (B // 2)
                         + [[0, 0, 0, 0]] * (B - B // 2), jnp.float32),
    }
    if with_labels:
        batch["next_sentence_labels"] = jnp.asarray(
            rng.integers(0, 2, (B,)), jnp.int32)
    return batch


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init({"params": jax.random.key(0)}, batch, train=False)
    return model, params, batch


def test_forward_shapes(model_and_params):
    model, params, batch = model_and_params
    out = model.apply(params, batch, train=False)
    B = batch["tokens"].shape[0]
    assert out.nsp_logits.shape == (B, 2)
    assert out.reg_output.shape == (B,)
    assert out.needs_reg.shape == (B,)


def test_regression_masked_by_needs_reg(model_and_params):
    model, params, batch = model_and_params
    out = model.apply(params, batch, train=False)
    needs = np.asarray(out.needs_reg)
    assert np.all(np.asarray(out.reg_output)[~needs] == 0)
    assert np.any(np.asarray(out.reg_output)[needs] != 0)
    # tanh-bounded normalized output => |denorm| <= y_scale
    y_scale = np.asarray(batch["R"])[:, 3]
    assert np.all(np.abs(np.asarray(out.reg_output)[needs])
                  <= y_scale[needs] + 1e-5)


def test_train_loss_finite_and_composed(model_and_params):
    model, params, batch = model_and_params
    out = model.apply(params, batch, train=True,
                      rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(float(out.loss))
    assert float(out.loss) == pytest.approx(
        float(out.nsp_loss) + float(np.mean(np.asarray(out.reg_loss))), rel=1e-5)


def test_attention_mask_semantics():
    """Masked key positions must not influence outputs."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((1, 2, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.random((1, 2, 6, 8)), jnp.float32)
    v = jnp.asarray(rng.random((1, 2, 6, 8)), jnp.float32)
    mask = extended_attention_mask(jnp.asarray([[1, 1, 1, 0, 0, 0]]))
    out1 = dot_product_attention(q, k, v, mask, dropout_rate=0,
                                 deterministic=True)
    k2 = k.at[:, :, 3:].set(999.0)
    v2 = v.at[:, :, 3:].set(-55.0)
    out2 = dot_product_attention(q, k2, v2, mask, dropout_rate=0,
                                 deterministic=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_padding_tokens_do_not_affect_nsp(model_and_params):
    """With the attention mask derived from sep_indices, garbage in padded
    positions must not change the NSP logits."""
    model, params, batch = model_and_params
    out1 = model.apply(params, batch, train=False)
    L = batch["tokens"].shape[1]
    seq_len = int(np.asarray(batch["sep_indices"])[0, 0]) + 1
    tampered = dict(batch)
    tampered["tokens"] = batch["tokens"].at[:, seq_len:].set(7)
    out2 = model.apply(params, tampered, train=False)
    np.testing.assert_allclose(np.asarray(out1.nsp_logits),
                               np.asarray(out2.nsp_logits), atol=1e-4)


def test_position_ids_only_for_qa_tokens():
    """Shifting where the Q tokens start must not change their position
    embeddings (positions are relative to the first Q/A token)."""
    from crct_tpu.models.vilbert import TextEmbeddings
    cfg = tiny_model_config()
    emb = TextEmbeddings(cfg)
    rng = np.random.default_rng(0)
    L = 12
    ids = jnp.asarray(rng.integers(1, 500, (1, L)), jnp.int32)
    loc = jnp.zeros((1, L, 4), jnp.float32)
    # caption tokens (type 7) then Q tokens starting at position 4
    types1 = jnp.asarray([[7, 7, 7, 7, -1, -1, -1, 1, 1, 0, 0, 0]], jnp.int32)
    # same Q tokens starting at position 6
    types2 = jnp.asarray([[7, 7, 7, 7, 7, 7, -1, -1, -1, 1, 1, 0]], jnp.int32)
    params = emb.init(jax.random.key(0), ids, types1, loc)
    e1 = emb.apply(params, ids, types1, loc)
    e2 = emb.apply(params, ids, types2, loc)
    # Q/A block embeds identically modulo the word embedding of its ids:
    # compare the position-embedding contribution by using identical ids
    ids_const = jnp.full_like(ids, 5)
    e1 = emb.apply(params, ids_const, types1, loc)
    e2 = emb.apply(params, ids_const, types2, loc)
    np.testing.assert_allclose(np.asarray(e1[0, 4:7]), np.asarray(e2[0, 6:9]),
                               atol=1e-5)


def test_regressor_shapes():
    reg = HybridRegressor(hidden_size=64, v_hidden_size=32)
    hv = jnp.ones((3, 32))
    hw = jnp.ones((3, 64))
    p = reg.init(jax.random.key(0), hv, hw)
    out = reg.apply(p, hv, hw)
    assert out.shape == (3,)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh bounded
    ce = CERegressor(hidden_size=64, v_hidden_size=32)
    p = ce.init(jax.random.key(0), hv, hw)
    out = ce.apply(p, hv, hw)
    assert out.shape == (3, 65)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_encoder_schedule_layer_count():
    """All configured layers must exist in the param tree."""
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init({"params": jax.random.key(0)}, batch, train=False)
    enc = params["params"]["bert"]["encoder"]
    t_layers = [k for k in enc if k.startswith("t_layer_")]
    v_layers = [k for k in enc if k.startswith("v_layer_")]
    c_layers = [k for k in enc if k.startswith("c_layer_")]
    assert len(t_layers) == cfg.num_hidden_layers
    assert len(v_layers) == cfg.v_num_hidden_layers
    assert len(c_layers) == len(cfg.v_biattention_id)


def test_bf16_forward(model_and_params):
    cfg = tiny_model_config(dtype="bfloat16")
    model = CRCTModel(config=cfg, categories=10)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(params, batch, train=False)
    # params stay f32; outputs cast to f32 for the heads
    assert out.nsp_logits.dtype == jnp.float32
    kernel = params["params"]["bert"]["embeddings"]["word_embeddings"]["embedding"]
    assert kernel.dtype == jnp.float32
    assert np.isfinite(np.asarray(out.nsp_logits)).all()


@pytest.mark.parametrize("cfg_name", ["vilbert", "bert_base_6layer_6conect",
                                      "bert_base_6layer_6conect_original"])
def test_shipped_model_configs_build(cfg_name):
    """Every shipped model-config JSON (the active vilbert.json + the
    reference's two legacy 6-connection variants) must construct a CRCTModel
    whose init typechecks end-to-end. eval_shape only — no FLOPs, so the
    full 12L/768 geometries stay cheap on CPU."""
    import json
    import os

    from crct_tpu.config import CRCTModelConfig

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "config", f"{cfg_name}.json")
    with open(path) as f:
        cfg = CRCTModelConfig(**json.load(f))
    assert cfg.hidden_size % cfg.num_attention_heads == 0
    assert cfg.v_hidden_size % cfg.v_num_attention_heads == 0
    assert cfg.bi_hidden_size % cfg.bi_num_attention_heads == 0
    assert len(cfg.v_biattention_id) == len(cfg.t_biattention_id)

    model = CRCTModel(config=cfg, categories=228)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=2, L=24, R=6, vocab=cfg.vocab_size,
                       vdim=cfg.v_feature_size, cats=228)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, batch,
                           train=False))
    n_params = sum(np.prod(s.shape) for s in
                   jax.tree.leaves(shapes["params"]))
    assert n_params > 1e8          # all three are full-size geometries
