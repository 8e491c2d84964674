"""Golden numeric parity against the ACTUAL reference torch model.

These tests import the reference implementation from /root/reference (its
only missing dependency, ``pytorch_pretrained_bert.file_utils.cached_path``,
is stubbed), randomly initialize it in torch, map the state_dict through
``crct_tpu.utils.convert.convert_torch_state_dict``, and assert that the
flax re-derivation produces the same activations on the same batch —
per module (embeddings, BertLayer, BertConnectionLayer, regressor) and
end-to-end (NSP logits, regression outputs, 5%/tolerance correctness,
combined training loss).

This is the proof that every masked-op re-derivation (position-id trick,
loc/type zeroing, co-attention cross-wiring, run-always-masked regression)
is numerically faithful — so a converted published ``crct.ckpt`` reproduces
the reference's predictions. Reference: CRCT/backbone/vilbert.py:297-1661.
"""

from __future__ import annotations

import importlib
import math
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/CRCT/backbone"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference checkout not available")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from crct_tpu.config import CRCTModelConfig, DVQA_FLOATS  # noqa: E402
from crct_tpu.models import layers as L  # noqa: E402
from crct_tpu.models import vilbert as V  # noqa: E402
from crct_tpu.models.crct import CRCTModel  # noqa: E402
from crct_tpu.models.regressor import CERegressor, HybridRegressor  # noqa: E402
from crct_tpu.utils.convert import convert_torch_state_dict  # noqa: E402

ATOL = 3e-4
CATS = 17          # color/class vocabulary for the test
TOL_MARGIN = 0.02

TINY = dict(
    vocab_size=345, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96,
    v_feature_size=24, v_hidden_size=24, v_num_hidden_layers=2,
    v_num_attention_heads=2, v_intermediate_size=48,
    bi_hidden_size=24, bi_num_attention_heads=4,
    v_biattention_id=[0, 1], t_biattention_id=[2, 3],
    max_position_embeddings=64, plotqa_vocab_types=12,
)
# a mid-size config exercising the real interleave pattern (3 connections,
# trailing layers on both streams)
MID = dict(
    vocab_size=1024, hidden_size=128, num_hidden_layers=6,
    num_attention_heads=8, intermediate_size=256,
    v_feature_size=64, v_hidden_size=64, v_num_hidden_layers=4,
    v_num_attention_heads=4, v_intermediate_size=128,
    bi_hidden_size=64, bi_num_attention_heads=8,
    v_biattention_id=[0, 1, 2], t_biattention_id=[2, 3, 4],
    max_position_embeddings=64, plotqa_vocab_types=12,
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference backbone package with its net-fetch dep stubbed."""
    if "pytorch_pretrained_bert" not in sys.modules:
        pkg = types.ModuleType("pytorch_pretrained_bert")
        fu = types.ModuleType("pytorch_pretrained_bert.file_utils")

        def cached_path(*a, **k):
            raise RuntimeError("offline test shim")

        fu.cached_path = cached_path
        pkg.file_utils = fu
        sys.modules["pytorch_pretrained_bert"] = pkg
        sys.modules["pytorch_pretrained_bert.file_utils"] = fu
    if "_crct_reference" not in sys.modules:
        pkg = types.ModuleType("_crct_reference")
        pkg.__path__ = [REF_DIR]
        sys.modules["_crct_reference"] = pkg
    return importlib.import_module("_crct_reference.vilbert")


def ref_params(**over):
    p = dict(device=torch.device("cpu"), dataset="plotqa",
             qa_file="qa_pairs_V1.npy", binary_answers=False, CE_REG=False,
             L1=False, rank=0, rank_from=0, BOT_MODE=False, max_seq_len=20,
             max_vis_features=5, tol_margin=TOL_MARGIN,
             dvqa_floats=list(DVQA_FLOATS), categories=CATS, max_previews=4,
             mask_prob_img=0.0)
    p.update(over)
    return p


def make_batch(seed, B, Lseq, R, cfg, cats=CATS, cap_range=(3, 8),
               q_range=(2, 6)):
    g = np.random.default_rng(seed)
    tokens = g.integers(1, cfg["vocab_size"], (B, Lseq)).astype(np.int64)
    # realistic segments: CLS(0), caption types 2..11, question (-1),
    # answer (1), trailing padding (0); row 0 has no QA tokens at all.
    segments = np.zeros((B, Lseq), np.int64)
    seq_len = np.zeros((B,), np.int64)
    for i in range(B):
        n_cap = int(g.integers(*cap_range))
        n_q = 0 if i == 0 else int(g.integers(*q_range))
        n_a = 0 if i == 0 else int(g.integers(1, 3))
        segments[i, 1:1 + n_cap] = g.integers(2, 12, n_cap)
        segments[i, 1 + n_cap:1 + n_cap + n_q] = -1
        segments[i, 1 + n_cap + n_q:1 + n_cap + n_q + n_a] = 1
        seq_len[i] = 1 + n_cap + n_q + n_a
        tokens[i, seq_len[i]:] = 0
    loc = g.random((B, Lseq, 4), np.float32)
    loc[:, 0] = 0                       # CLS has no loc
    loc[:, 3] = 0                       # some all-zero loc rows
    sep_indices = np.zeros((B, 50), np.int64)
    sep_indices[:, 0] = seq_len - 1
    hist_len = np.zeros((B,), np.int64)
    image_feat = g.normal(size=(B, R, cfg["v_feature_size"])).astype(np.float32)
    image_loc = g.random((B, R, 4), np.float32)
    image_target = g.integers(0, cats + 1, (B, R)).astype(np.int64)
    image_mask = np.ones((B, R), np.float32)
    image_mask[:, -1] = 0
    Rv = np.zeros((B, 4), np.float32)
    needs = (np.arange(B) % 2).astype(np.float32)
    Rv[:, 0] = g.uniform(-8, 8, B).astype(np.float32) * needs
    Rv[:, 1] = needs
    Rv[:, 2] = TOL_MARGIN
    Rv[:, 3] = np.where(needs > 0, 10.0, 0.0)
    nsp = g.integers(0, 2, (B,)).astype(np.int64)
    return dict(tokens=tokens, segments=segments, loc=loc,
                sep_indices=sep_indices, hist_len=hist_len,
                image_feat=image_feat, image_loc=image_loc,
                image_target=image_target, image_mask=image_mask, R=Rv,
                next_sentence_labels=nsp, seq_len=seq_len)


def t(x):
    return torch.from_numpy(np.asarray(x))


def attention_mask_np(batch, Lseq):
    # encoder_decorator.py:118-120: gather(sep_indices, hist_len) + 1
    sl = np.take_along_axis(batch["sep_indices"],
                            batch["hist_len"][:, None], axis=1)[:, 0] + 1
    return (np.arange(Lseq)[None, :] < sl[:, None]).astype(np.float32)


def extended(mask):
    return ((1.0 - mask) * -10000.0)[:, None, None, :]


def convert_module_sd(module, prefix):
    sd = {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}
    tree, _ = convert_torch_state_dict(sd)
    return tree


def flat_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flat_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


# ---------------------------------------------------------------------------
# per-module parity
# ---------------------------------------------------------------------------

def test_text_embeddings_parity(ref):
    cfg = ref.BertConfig.from_dict(TINY)
    torch.manual_seed(0)
    mod = ref.BertEmbeddingLocation(cfg, ref_params()).eval()
    batch = make_batch(1, 6, 20, 5, TINY)
    with torch.no_grad():
        want = mod(t(batch["tokens"]), token_type_ids=t(batch["segments"]),
                   loc=t(batch["loc"])).numpy()
    tree = convert_module_sd(mod, "bert.embeddings.")
    mine = V.TextEmbeddings(CRCTModelConfig.from_dict(TINY)).apply(
        {"params": tree["bert"]["embeddings"]},
        jnp.asarray(batch["tokens"], jnp.int32),
        jnp.asarray(batch["segments"], jnp.int32),
        jnp.asarray(batch["loc"]), True)
    np.testing.assert_allclose(np.asarray(mine), want, atol=ATOL)


def test_image_embeddings_parity(ref):
    cfg = ref.BertConfig.from_dict(TINY)
    torch.manual_seed(1)
    mod = ref.BertImageEmbeddings(cfg, ref_params()).eval()
    batch = make_batch(2, 6, 20, 5, TINY)
    with torch.no_grad():
        want = mod(t(batch["image_feat"]), t(batch["image_loc"]),
                   t(batch["image_target"])).numpy()
    tree = convert_module_sd(mod, "bert.v_embeddings.")
    mine = V.ImageEmbeddings(CRCTModelConfig.from_dict(TINY), CATS).apply(
        {"params": tree["bert"]["v_embeddings"]},
        jnp.asarray(batch["image_feat"]), jnp.asarray(batch["image_loc"]),
        jnp.asarray(batch["image_target"], jnp.int32), None, True)
    np.testing.assert_allclose(np.asarray(mine), want, atol=ATOL)


def test_bert_layer_parity(ref):
    cfg = ref.BertConfig.from_dict(TINY)
    torch.manual_seed(2)
    mod = ref.BertLayer(cfg).eval()
    g = np.random.default_rng(3)
    x = g.normal(size=(4, 20, TINY["hidden_size"])).astype(np.float32)
    mask = np.ones((4, 20), np.float32)
    mask[:, 15:] = 0
    with torch.no_grad():
        want = mod(t(x), t(extended(mask)))[0].numpy()
    tree = convert_module_sd(mod, "bert.encoder.layer.0.")
    mine = L.TransformerLayer(
        TINY["hidden_size"], TINY["num_attention_heads"],
        TINY["intermediate_size"], "gelu", 0.1, 0.1).apply(
        {"params": tree["bert"]["encoder"]["t_layer_0"]},
        jnp.asarray(x), jnp.asarray(extended(mask)), True)
    np.testing.assert_allclose(np.asarray(mine), want, atol=ATOL)


def test_connection_layer_parity(ref):
    cfg = ref.BertConfig.from_dict(TINY)
    torch.manual_seed(4)
    mod = ref.BertConnectionLayer(cfg).eval()
    g = np.random.default_rng(5)
    v = g.normal(size=(4, 5, TINY["v_hidden_size"])).astype(np.float32)
    x = g.normal(size=(4, 20, TINY["hidden_size"])).astype(np.float32)
    v_mask = np.ones((4, 5), np.float32)
    v_mask[:, -1] = 0
    t_mask = np.ones((4, 20), np.float32)
    t_mask[:, 12:] = 0
    with torch.no_grad():
        want_v, want_t, _ = mod(t(v), t(extended(v_mask)), t(x),
                                t(extended(t_mask)))
    tree = convert_module_sd(mod, "bert.encoder.c_layer.0.")
    mine_v, mine_t = L.ConnectionLayer(
        TINY["v_hidden_size"], TINY["hidden_size"], TINY["bi_hidden_size"],
        TINY["bi_num_attention_heads"], TINY["v_intermediate_size"],
        TINY["intermediate_size"], "gelu", "gelu", 0.1, 0.1, 0.1, 0.1).apply(
        {"params": tree["bert"]["encoder"]["c_layer_0"]},
        jnp.asarray(v), jnp.asarray(extended(v_mask)),
        jnp.asarray(x), jnp.asarray(extended(t_mask)), True)
    np.testing.assert_allclose(np.asarray(mine_v), want_v.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(mine_t), want_t.numpy(), atol=ATOL)


def test_regressor_parity(ref):
    reg_mod = importlib.import_module("_crct_reference.regressor")
    cfg = ref.BertConfig.from_dict(TINY)
    torch.manual_seed(6)
    mod = reg_mod.PlotQA_Regressor_v20(cfg).eval()
    g = np.random.default_rng(7)
    hv = g.normal(size=(6, TINY["v_hidden_size"])).astype(np.float32)
    hw = g.normal(size=(6, TINY["hidden_size"])).astype(np.float32)
    with torch.no_grad():
        want = mod(hv_0=t(hv), hw_0=t(hw)).numpy()
    tree = convert_module_sd(mod, "regressor.")
    mine = HybridRegressor(TINY["hidden_size"], TINY["v_hidden_size"]).apply(
        {"params": tree["regressor"]}, jnp.asarray(hv), jnp.asarray(hw))
    np.testing.assert_allclose(np.asarray(mine), want, atol=ATOL)


def test_ce_regressor_parity(ref):
    reg_mod = importlib.import_module("_crct_reference.regressor")
    cfg = ref.BertConfig.from_dict(TINY)
    torch.manual_seed(8)
    mod = reg_mod.DVQA_Regressor_v20_CE(cfg).eval()
    g = np.random.default_rng(9)
    hv = g.normal(size=(6, TINY["v_hidden_size"])).astype(np.float32)
    hw = g.normal(size=(6, TINY["hidden_size"])).astype(np.float32)
    with torch.no_grad():
        want = mod(hv_0=t(hv), hw_0=t(hw)).numpy()
    sd = {"regressor." + k: v.detach().numpy()
          for k, v in mod.state_dict().items()}
    tree, _ = convert_torch_state_dict(sd)
    mine = CERegressor(TINY["hidden_size"], TINY["v_hidden_size"]).apply(
        {"params": tree["regressor"]}, jnp.asarray(hv), jnp.asarray(hw))
    np.testing.assert_allclose(np.asarray(mine), want, atol=ATOL)


# ---------------------------------------------------------------------------
# end-to-end parity
# ---------------------------------------------------------------------------

def _ref_full_model(ref, cfg_dict, seed=0, **params_over):
    cfg = ref.BertConfig.from_dict(cfg_dict)
    torch.manual_seed(seed)
    model = ref.BertForMultiModalPreTraining(cfg, ref_params(**params_over))
    model.eval()
    return model


def _mine_from_torch(torch_model, cfg_dict, **model_kw):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    tree, skipped = convert_torch_state_dict(sd)
    cfg = CRCTModelConfig.from_dict(cfg_dict)
    model = CRCTModel(config=cfg, categories=CATS,
                      tol_margin=TOL_MARGIN, **model_kw)
    return model, tree, skipped


def _jnp_batch(batch):
    keep = ("tokens", "segments", "loc", "sep_indices", "hist_len",
            "image_feat", "image_loc", "image_target", "image_mask", "R",
            "next_sentence_labels")
    return {k: jnp.asarray(batch[k]) for k in keep}


def _torch_eval_forward(torch_model, batch, Lseq):
    att = attention_mask_np(batch, Lseq)
    with torch.no_grad():
        out = torch_model(
            t(batch["tokens"]), t(batch["loc"]), t(batch["image_feat"]),
            t(batch["image_loc"]), sep_indices=t(batch["sep_indices"]),
            sep_len=t(batch["hist_len"] + 1),
            token_type_ids=t(batch["segments"]),
            attention_mask=t(att),
            image_attention_mask=t(batch["image_mask"]),
            image_target=t(batch["image_target"]),
            gt_reg=[t(batch["R"]), "L1"])
    # eval tuple: (pred_scores_t, None, nsp_scores, seq_t, attn, reg, legend)
    return out[2].numpy(), out[5]


@pytest.mark.parametrize("cfg_dict", [TINY, MID], ids=["tiny", "mid"])
def test_end_to_end_eval_parity(ref, cfg_dict):
    torch_model = _ref_full_model(ref, cfg_dict)
    model, tree, _ = _mine_from_torch(torch_model, cfg_dict)
    batch = make_batch(11, 6, 20, 5, cfg_dict)

    # converted tree must exactly cover the flax init structure
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           _jnp_batch(batch), train=False))
    assert flat_paths(tree) == flat_paths(
        jax.tree.map(lambda x: np.zeros(x.shape), variables["params"],
                     is_leaf=lambda x: hasattr(x, "shape")))

    want_nsp, want_reg = _torch_eval_forward(torch_model, batch, 20)
    out = model.apply({"params": tree}, _jnp_batch(batch), train=False)

    np.testing.assert_allclose(np.asarray(out.nsp_logits), want_nsp, atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.reg_output),
                               want_reg[0].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.reg_l1),
                               want_reg[2].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.reg_5_dist),
                               want_reg[4].numpy(), atol=ATOL)
    assert int(np.sum(np.asarray(out.correct_regs))) == int(want_reg[3][0])
    assert int(np.sum(np.asarray(out.correct_t_regs))) == int(want_reg[3][1])


@pytest.mark.slow
def test_flagship_scale_parity(ref):
    """Golden parity at the REAL shipped geometry (config/vilbert.json:
    12L/768/16h text, 6L/1024/16h vision, bi 1024/32h, 6 connections,
    vocab 30522) — the last controllable link in the published-weights
    proof chain. A dim-dependent bug (head-split rounding, position-table
    size, schedule tail) passes TINY/MID but fails here.
    Reference: CRCT/backbone/vilbert.py:1499-1661, CRCT/config/vilbert.json.
    """
    import json
    cfg_path = os.path.join(os.path.dirname(__file__), os.pardir,
                            "config", "vilbert.json")
    with open(cfg_path) as f:
        cfg_dict = json.load(f)
    B, Lseq, R, cats = 2, 124, 44, 228       # plotqa production geometry
    cfg = ref.BertConfig.from_dict(cfg_dict)
    torch.manual_seed(23)
    torch_model = ref.BertForMultiModalPreTraining(
        cfg, ref_params(max_seq_len=Lseq, max_vis_features=R,
                        categories=cats)).eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    tree, _ = convert_torch_state_dict(sd)
    model = CRCTModel(config=CRCTModelConfig.from_dict(cfg_dict),
                      categories=cats, tol_margin=TOL_MARGIN)
    # long sequences: captions fill most of the 124 tokens, Q/A up to 23,
    # so the position/type tables and the attention masks are exercised at
    # production occupancy, not the tiny-test ~15-token tail
    batch = make_batch(29, B, Lseq, R, cfg_dict, cats=cats,
                       cap_range=(60, 100), q_range=(8, 20))

    # converted tree must exactly cover the flax init structure at scale
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           _jnp_batch(batch), train=False))
    assert flat_paths(tree) == flat_paths(
        jax.tree.map(lambda x: np.zeros(x.shape), variables["params"],
                     is_leaf=lambda x: hasattr(x, "shape")))

    # eval-mode outputs
    want_nsp, want_reg = _torch_eval_forward(torch_model, batch, Lseq)
    out = model.apply({"params": tree}, _jnp_batch(batch), train=False)
    np.testing.assert_allclose(np.asarray(out.nsp_logits), want_nsp,
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.reg_output),
                               want_reg[0].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.reg_l1),
                               want_reg[2].numpy(), atol=ATOL)
    assert int(np.sum(np.asarray(out.correct_regs))) == int(want_reg[3][0])
    assert int(np.sum(np.asarray(out.correct_t_regs))) == int(want_reg[3][1])

    # train-mode loss
    att = attention_mask_np(batch, Lseq)
    with torch.no_grad():
        tout = torch_model(
            t(batch["tokens"]), t(batch["loc"]), t(batch["image_feat"]),
            t(batch["image_loc"]), sep_indices=t(batch["sep_indices"]),
            sep_len=t(batch["hist_len"] + 1),
            token_type_ids=t(batch["segments"]), attention_mask=t(att),
            image_attention_mask=t(batch["image_mask"]),
            image_target=t(batch["image_target"]),
            masked_lm_labels=t(np.zeros_like(batch["tokens"])),
            next_sentence_label=t(batch["next_sentence_labels"]),
            gt_reg=[t(batch["R"]), "L1_smooth"])
    want_loss = float(tout[2].numpy().sum() + tout[6][1].mean().numpy())
    mine = model.apply({"params": tree}, _jnp_batch(batch), train=True,
                       deterministic=True,
                       rngs={"dropout": jax.random.key(0)})
    np.testing.assert_allclose(float(mine.nsp_loss),
                               float(tout[2].numpy().sum()), atol=ATOL)
    np.testing.assert_allclose(float(jnp.mean(mine.reg_loss)),
                               float(tout[6][1].mean().numpy()), atol=ATOL)
    np.testing.assert_allclose(float(mine.loss), want_loss, atol=2 * ATOL)


def test_end_to_end_train_loss_parity(ref):
    torch_model = _ref_full_model(ref, TINY, seed=13)
    model, tree, _ = _mine_from_torch(torch_model, TINY)
    batch = make_batch(17, 6, 20, 5, TINY)
    att = attention_mask_np(batch, 20)
    with torch.no_grad():
        out = torch_model(
            t(batch["tokens"]), t(batch["loc"]), t(batch["image_feat"]),
            t(batch["image_loc"]), sep_indices=t(batch["sep_indices"]),
            sep_len=t(batch["hist_len"] + 1),
            token_type_ids=t(batch["segments"]), attention_mask=t(att),
            image_attention_mask=t(batch["image_mask"]),
            image_target=t(batch["image_target"]),
            masked_lm_labels=t(np.zeros_like(batch["tokens"])),
            next_sentence_label=t(batch["next_sentence_labels"]),
            gt_reg=[t(batch["R"]), "L1_smooth"])
    # train tuple: (lm, img, nsp_loss, seq_t, pred_t, nsp_scores, reg, legend)
    want_nsp_loss = out[2].numpy()
    want_reg = out[6]
    # encoder_decorator.py:147-153: loss = nsp + reg[1].mean()
    want_loss = float(want_nsp_loss.sum() + want_reg[1].mean().numpy())

    mine = model.apply({"params": tree}, _jnp_batch(batch), train=True,
                       deterministic=True,
                       rngs={"dropout": jax.random.key(0)})
    np.testing.assert_allclose(float(mine.nsp_loss),
                               float(want_nsp_loss.sum()), atol=ATOL)
    np.testing.assert_allclose(float(jnp.mean(mine.reg_loss)),
                               float(want_reg[1].mean().numpy()), atol=ATOL)
    np.testing.assert_allclose(float(mine.loss), want_loss, atol=2 * ATOL)
    np.testing.assert_allclose(np.asarray(mine.nsp_logits),
                               out[5].numpy(), atol=ATOL)
