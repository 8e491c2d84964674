"""Checkpoint-converter tests: torch-layout round trip covers every leaf."""

import jax
import numpy as np
import pytest

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


def test_hf_bert_import_maps_text_stream():
    """Plain HF bert-base-uncased-style keys (incl. gamma/beta) land on the
    text stream; heads/pooler/type embeddings are skipped."""
    params = _init_params()
    L = 4   # tiny config text layers
    h = params["bert"]["embeddings"]["word_embeddings"]["embedding"].shape
    rng = np.random.default_rng(0)
    sd = {}
    sd["bert.embeddings.word_embeddings.weight"] = rng.random(h)
    sd["bert.embeddings.position_embeddings.weight"] = rng.random(
        params["bert"]["embeddings"]["position_embeddings"]["embedding"].shape)
    sd["bert.embeddings.token_type_embeddings.weight"] = rng.random((2, h[1]))
    sd["bert.embeddings.LayerNorm.gamma"] = rng.random(h[1])
    sd["bert.embeddings.LayerNorm.beta"] = rng.random(h[1])
    sd["bert.embeddings.position_ids"] = np.arange(128)
    for i in range(L):
        base = f"bert.encoder.layer.{i}"
        for sub in ("attention.self.query", "attention.self.key",
                    "attention.self.value", "attention.output.dense"):
            sd[f"{base}.{sub}.weight"] = rng.random((h[1], h[1]))
            sd[f"{base}.{sub}.bias"] = rng.random(h[1])
        sd[f"{base}.attention.output.LayerNorm.gamma"] = rng.random(h[1])
        sd[f"{base}.attention.output.LayerNorm.beta"] = rng.random(h[1])
        sd[f"{base}.intermediate.dense.weight"] = rng.random((128, h[1]))
        sd[f"{base}.intermediate.dense.bias"] = rng.random(128)
        sd[f"{base}.output.dense.weight"] = rng.random((h[1], 128))
        sd[f"{base}.output.dense.bias"] = rng.random(h[1])
        sd[f"{base}.output.LayerNorm.gamma"] = rng.random(h[1])
        sd[f"{base}.output.LayerNorm.beta"] = rng.random(h[1])
    sd["bert.pooler.dense.weight"] = rng.random((h[1], h[1]))
    sd["cls.predictions.bias"] = rng.random(h[0])
    sd["cls.seq_relationship.weight"] = rng.random((2, h[1]))

    tree, skipped = convert_torch_state_dict(sd)
    assert len(skipped) == 5  # token_type, position_ids, pooler, 2x cls
    # merged into a fresh tree: text stream transferred, rest untouched
    from crct_tpu.utils.checkpoint import transfer_params
    merged, n = transfer_params(params, tree, verbose=False)
    np.testing.assert_array_equal(
        merged["bert"]["embeddings"]["word_embeddings"]["embedding"],
        sd["bert.embeddings.word_embeddings.weight"])
    np.testing.assert_array_equal(
        merged["bert"]["encoder"]["t_layer_0"]["attention"]["query"]["kernel"],
        sd["bert.encoder.layer.0.attention.self.query.weight"].T)
    np.testing.assert_array_equal(
        merged["bert"]["encoder"]["t_layer_1"]["ffn"]["out_ln"]["scale"],
        sd["bert.encoder.layer.1.output.LayerNorm.gamma"])
    # vision stream untouched
    np.testing.assert_array_equal(
        merged["bert"]["v_embeddings"]["color_emb"]["embedding"],
        params["bert"]["v_embeddings"]["color_emb"]["embedding"])


def test_tf_checkpoint_import_matches_torch_path(tmp_path):
    """import_bert's tf:<prefix> path (the reference's from_tf /
    load_tf_weights_in_bert, vilbert.py:48-108): a slash-named TF
    checkpoint converts to the SAME tree as the equivalent torch state
    dict — kernels transposed, gamma/beta renamed, optimizer slots and
    heads skipped."""
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    _rng64 = np.random.default_rng(7)
    # float32 from the start: TF stores f32, so f64 inputs would round on
    # save and break the exact comparison against the unrounded originals
    rng = type("R", (), {"random": staticmethod(
        lambda *s: _rng64.random(*s).astype(np.float32))})
    H, FF, V, P = 8, 16, 32, 24
    tf_vars = {
        "bert/embeddings/word_embeddings": rng.random((V, H)),
        "bert/embeddings/position_embeddings": rng.random((P, H)),
        "bert/embeddings/token_type_embeddings": rng.random((2, H)),
        "bert/embeddings/LayerNorm/gamma": rng.random(H),
        "bert/embeddings/LayerNorm/beta": rng.random(H),
        "bert/encoder/layer_0/attention/self/query/kernel": rng.random((H, H)),
        "bert/encoder/layer_0/attention/self/query/bias": rng.random(H),
        "bert/encoder/layer_0/attention/output/dense/kernel": rng.random((H, H)),
        "bert/encoder/layer_0/attention/output/dense/bias": rng.random(H),
        "bert/encoder/layer_0/attention/output/LayerNorm/gamma": rng.random(H),
        "bert/encoder/layer_0/attention/output/LayerNorm/beta": rng.random(H),
        "bert/encoder/layer_0/intermediate/dense/kernel": rng.random((H, FF)),
        "bert/encoder/layer_0/intermediate/dense/bias": rng.random(FF),
        "bert/encoder/layer_0/output/dense/kernel": rng.random((FF, H)),
        "bert/encoder/layer_0/output/dense/bias": rng.random(H),
        "bert/encoder/layer_0/output/LayerNorm/gamma": rng.random(H),
        "bert/encoder/layer_0/output/LayerNorm/beta": rng.random(H),
        "bert/pooler/dense/kernel": rng.random((H, H)),
        "bert/pooler/dense/bias": rng.random(H),
        "cls/seq_relationship/output_weights": rng.random((2, H)),
        "cls/seq_relationship/output_bias": rng.random(2),
        # optimizer slots the importer must skip (vilbert.py:62-66)
        "bert/embeddings/word_embeddings/adam_m": rng.random((V, H)),
        "bert/embeddings/word_embeddings/adam_v": rng.random((V, H)),
        "global_step": np.asarray(100, np.int64),
    }
    prefix = str(tmp_path / "bert_model.ckpt")
    g = tf1.Graph()
    with g.as_default():
        for name, arr in tf_vars.items():
            tf1.get_variable(name, initializer=tf.constant(
                arr, dtype=tf.int64 if arr.ndim == 0 else tf.float32))
        saver = tf1.train.Saver()
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix)

    from crct_tpu.cli.import_bert import tf_state_dict
    sd = tf_state_dict(prefix)
    assert not any("adam" in k or "global_step" in k for k in sd)
    # equivalent torch-style dict: same tensors under HF naming
    torch_sd = {}
    for name, arr in tf_vars.items():
        if "adam" in name or name == "global_step":
            continue
        key = (name.replace("/", ".").replace("layer_0", "layer.0")
               .replace("gamma", "weight").replace("beta", "bias")
               .replace("output_weights", "weight")
               .replace("output_bias", "bias"))
        if key.endswith("_embeddings"):
            key += ".weight"
        if name.endswith("kernel"):
            key, arr = key.replace(".kernel", ".weight"), arr.T
        torch_sd[key] = arr
    tf_tree, tf_skipped = convert_torch_state_dict(sd)
    torch_tree, torch_skipped = convert_torch_state_dict(torch_sd)
    assert len(tf_skipped) == len(torch_skipped)
    flat_tf = jax.tree_util.tree_leaves_with_path(tf_tree)
    flat_torch = dict(jax.tree_util.tree_leaves_with_path(torch_tree))
    assert flat_tf and len(flat_tf) == len(flat_torch)
    for path, leaf in flat_tf:
        np.testing.assert_array_equal(leaf, flat_torch[path])
    # the transposed kernel really landed as a flax [in, out] kernel
    np.testing.assert_allclose(
        tf_tree["bert"]["encoder"]["t_layer_0"]["attention"]["query"]["kernel"],
        tf_vars["bert/encoder/layer_0/attention/self/query/kernel"],
        rtol=1e-6)


def test_hf_hub_acquisition_path(monkeypatch):
    """import_bert's hf:<name> path: a transformers BertModel's state dict
    (built locally — no network) maps onto the text stream, mirroring the
    reference's bert-base-uncased download+remap (vilbert.py:1112-1285)."""
    transformers = pytest.importorskip("transformers")
    tiny = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64)
    local = transformers.BertModel(tiny)
    monkeypatch.setattr(transformers.AutoModel, "from_pretrained",
                        staticmethod(lambda name: local))
    from crct_tpu.cli.import_bert import hf_state_dict
    from crct_tpu.utils.convert import convert_torch_state_dict
    sd = hf_state_dict("bert-base-uncased")
    tree, skipped = convert_torch_state_dict(sd)
    emb = tree["bert"]["embeddings"]
    assert emb["word_embeddings"]["embedding"].shape == (128, 32)
    enc = tree["bert"]["encoder"]
    assert "t_layer_0" in enc and "t_layer_1" in enc
    assert enc["t_layer_0"]["attention"]["query"]["kernel"].shape == (32, 32)
