"""Checkpoint-converter tests: torch-layout round trip covers every leaf."""

import jax
import numpy as np

from crct_tpu.models.crct import CRCTModel
from crct_tpu.utils.convert import convert_torch_state_dict, inverse_convert
from tests.helpers import tiny_model_config
from tests.test_model import make_batch


def _init_params(ce_reg=False):
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10, ce_reg=ce_reg)
    batch = make_batch(np.random.default_rng(0))
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    return variables["params"]


def test_round_trip_covers_all_leaves():
    params = _init_params()
    sd = inverse_convert(params)
    tree, skipped = convert_torch_state_dict(sd)
    assert not skipped, skipped

    flat_orig = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_conv = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(tree)[0]}
    assert set(flat_conv) == set(flat_orig)
    for k in flat_orig:
        np.testing.assert_array_equal(np.asarray(flat_orig[k]),
                                      np.asarray(flat_conv[k]), err_msg=k)


def test_linear_weights_transposed():
    params = _init_params()
    sd = inverse_convert(params)
    w = sd["bert_pretrained.bert.encoder.layer.0.attention.self.query.weight"]
    kernel = params["bert"]["encoder"]["t_layer_0"]["attention"]["query"]["kernel"]
    assert w.shape == kernel.T.shape
    tree, _ = convert_torch_state_dict(sd)
    np.testing.assert_array_equal(
        tree["bert"]["encoder"]["t_layer_0"]["attention"]["query"]["kernel"],
        np.asarray(kernel))


def test_legacy_keys_skipped():
    params = _init_params()
    sd = inverse_convert(params)
    h = params["cls"]["bi_seq_relationship"]["kernel"].shape[0]
    sd["bert_pretrained.cls.predictions.bias"] = np.zeros(30522)
    sd["bert_pretrained.cls.imagePredictions.decoder.weight"] = np.zeros((5, 5))
    sd["bert_pretrained.bert.encoder.c_layer.0.biOutput.q_dense1.weight"] = \
        np.zeros((4, 4))
    sd["bert_pretrained.bert.v_embeddings.type_embeddings.weight"] = \
        np.zeros((13, 4))
    tree, skipped = convert_torch_state_dict(sd)
    assert len(skipped) == 4
    # converted tree still loads via transfer_params
    from crct_tpu.utils.checkpoint import transfer_params
    merged, n = transfer_params(params, tree, verbose=False)
    assert n == len(jax.tree_util.tree_leaves(params))


def test_ce_regressor_round_trip():
    params = _init_params(ce_reg=True)
    sd = inverse_convert(params, ce_reg=True)
    assert any("ce_fusion" in k for k in sd)
    tree, skipped = convert_torch_state_dict(sd)
    assert not skipped
    flat_orig = jax.tree_util.tree_leaves(params)
    flat_conv = jax.tree_util.tree_leaves(tree)
    assert len(flat_orig) == len(flat_conv)
