"""Training-stack tests: optimizer partition, schedule, data-parallel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.models.crct import CRCTModel
from crct_tpu.parallel.mesh import make_mesh, shard_batch
from crct_tpu.train.optimizer import (make_optimizer,
                                      warmup_linear_min_schedule,
                                      _is_language_param, _needs_decay)
from crct_tpu.train.train_loop import Trainer, device_batch, make_train_step
from tests.helpers import synthetic_params, tiny_model_config
from tests.test_model import make_batch


def test_schedule_warmup_decay_floor():
    sched = warmup_linear_min_schedule(base_lr=2e-5, warmup_steps=100,
                                       t_total=1000, min_lr=1.3e-5)
    assert float(sched(0)) == pytest.approx(1.3e-5)   # floored at start
    assert float(sched(100)) == pytest.approx(2e-5)
    assert float(sched(50)) == pytest.approx(max(1e-5, 1.3e-5))
    # decay floors at min_lr near the end
    assert float(sched(999)) == pytest.approx(1.3e-5)
    mid = float(sched(200))  # factor 800/900 -> 1.78e-5, above the floor
    assert 1.3e-5 < mid < 2e-5


def test_optimizer_partition_labels():
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    flat = {jax.tree_util.keystr(p): ("lang" if _is_language_param(p)
                                      else "image", _needs_decay(p))
            for p, _ in jax.tree_util.tree_flatten_with_path(
                variables["params"])[0]}

    def find(substr):
        return [v for k, v in flat.items() if substr in k]

    # text layers -> lang; vision/co-attention/regressor/heads -> image
    assert all(v[0] == "lang" for v in find("t_layer_0"))
    assert all(v[0] == "image" for v in find("v_layer_0"))
    assert all(v[0] == "image" for v in find("c_layer_0"))
    assert all(v[0] == "image" for v in find("regressor"))
    assert all(v[0] == "image" for v in find("bi_seq_relationship"))
    assert all(v[0] == "lang" for v in find("word_embeddings"))
    assert all(v[0] == "image" for v in find("txt_location_embeddings"))
    # decay exclusions: biases and LayerNorm/scale excluded
    assert all(not v[1] for k, v in flat.items() if k.endswith("['bias']"))
    assert all(not v[1] for k, v in flat.items() if "_ln" in k)
    assert all(v[1] for k, v in flat.items() if k.endswith("['kernel']")
               and "_ln" not in k)


def test_opt_bf16_m_moments_dtype_and_numerics():
    """-opt_bf16_m stores AdamW first moments in bfloat16 (second moments
    stay f32) and the resulting updates track the f32 optimizer closely."""
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8)}
    grads = {"w": jnp.cos(jnp.arange(64.0)).reshape(8, 8) * 1e-2}
    pd = dict(lr=2e-5, image_lr=2e-5, min_lr=1.3e-5, warmup=0, wd=0.0)

    def run(bf16):
        tx = make_optimizer({**pd, "opt_bf16_m": bf16}, params,
                            iters_per_epoch=100)
        state = tx.init(params)
        p = params
        for _ in range(5):
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    p32, _ = run(False)
    pbf, state = run(True)
    mus = [l for l in jax.tree_util.tree_leaves(state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 leaves in the optimizer state"
    nus_f32 = [l for l in jax.tree_util.tree_leaves(state)
               if hasattr(l, "dtype") and l.dtype == jnp.float32
               and l.shape == (8, 8)]
    assert nus_f32, "second moments must stay f32"
    # bf16 mu rounds at ~0.4% relative; after 5 floored-lr (1.3e-5) steps
    # the params must still agree far below the ~6.5e-5 total update
    np.testing.assert_allclose(np.asarray(pbf["w"]), np.asarray(p32["w"]),
                               rtol=0, atol=3e-6)


def test_optimizer_partition_artifact_matches_tree():
    """The committed language_weights.json artifact must (a) be fully
    contained in the real full-size param tree and (b) agree with the
    path heuristic on every leaf — so either drifting breaks CI
    (reference artifact: CRCT/config/language_weights.json)."""
    import functools
    from crct_tpu.config import CRCTModelConfig
    from crct_tpu.train.optimizer import (_is_language_param_heuristic,
                                          _path_str, language_weight_paths)

    model = CRCTModel(config=CRCTModelConfig(), categories=228)
    rng = np.random.default_rng(0)
    B, L, R = 2, 124, 44
    batch = {
        "tokens": jnp.zeros((B, L), jnp.int32),
        "segments": jnp.zeros((B, L), jnp.int32),
        "loc": jnp.zeros((B, L, 4), jnp.float32),
        "sep_indices": jnp.zeros((B, 50), jnp.int32),
        "hist_len": jnp.zeros((B, 1), jnp.int32),
        "image_feat": jnp.zeros((B, R, 1024), jnp.float32),
        "image_loc": jnp.zeros((B, R, 4), jnp.float32),
        "image_target": jnp.zeros((B, R), jnp.int32),
        "image_mask": jnp.ones((B, R), jnp.float32),
        "R": jnp.zeros((B, 4), jnp.float32),
    }
    variables = jax.eval_shape(functools.partial(model.init, train=False),
                               {"params": jax.random.key(0)}, batch)
    leaves = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    tree_paths = {_path_str(p) for p, _ in leaves}
    artifact = language_weight_paths()
    assert artifact <= tree_paths, sorted(artifact - tree_paths)[:5]
    for p, _ in leaves:
        assert _is_language_param(p) == _is_language_param_heuristic(p), \
            _path_str(p)
    assert sum(_is_language_param(p) for p, _ in leaves) == len(artifact)


def test_train_step_decreases_loss():
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=8)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(0)}, batch, train=True)
    params_dict = dict(lr=1e-3, image_lr=1e-3, min_lr=1e-5, warmup=1,
                       wd=0.01, batch_multiply=1)
    import optax
    tx = make_optimizer(params_dict, variables["params"], iters_per_epoch=100)
    step = jax.jit(make_train_step(model, tx))
    params, opt_state = variables["params"], tx.init(variables["params"])
    losses = []
    for i in range(8):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.key(i))
        losses.append(float(metrics[0]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_data_parallel_matches_single_device():
    """The 8-device sharded step must produce the same params as 1 device."""
    assert len(jax.devices()) == 8
    cfg = tiny_model_config()
    model = CRCTModel(config=cfg, categories=10)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=8)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(0)}, batch, train=True)
    params_dict = dict(lr=1e-3, image_lr=1e-3, min_lr=1e-5, warmup=1, wd=0.01)
    tx = make_optimizer(params_dict, variables["params"], iters_per_epoch=100)
    step = jax.jit(make_train_step(model, tx))

    # single-device run
    p1, o1 = variables["params"], tx.init(variables["params"])
    p1, o1, m1 = step(p1, o1, batch, jax.random.key(7))

    # 8-device data-parallel run
    mesh = make_mesh(8)
    from crct_tpu.parallel.mesh import replicate
    p2 = replicate(variables["params"], mesh)
    o2 = replicate(tx.init(variables["params"]), mesh)
    db = shard_batch(batch, mesh)
    p2, o2, m2 = step(p2, o2, db, jax.random.key(7))

    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-4,
                               atol=1e-5)
    l1 = jax.tree.leaves(p1)
    l2 = jax.tree.leaves(p2)
    # reduction order differs between the sharded and single-device sums;
    # tolerate float32 accumulation noise
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=2e-5)


def test_trainer_end_to_end_on_synthetic_data(tmp_path):
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=4, feat_dim=32,
                              batch_size=8, num_workers=2)
    cfg = tiny_model_config(v_feature_size=32)
    ds = ChartQADataset(params, ["train"])
    ds.split = "train"
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    sample = next(iter(loader))
    from crct_tpu.models.crct import CRCTModel
    model = CRCTModel(config=cfg, categories=params["categories"])
    trainer = Trainer(params, model, sample, iters_per_epoch=len(loader))
    m = None
    for batch in loader:
        m = np.asarray(trainer.run_step(batch))
    assert m is not None and np.isfinite(m[0])
    # checkpoint round-trip
    path = trainer.save(epoch=0)
    from crct_tpu.utils.checkpoint import load_checkpoint, transfer_params
    loaded = load_checkpoint(path)
    assert "model_state_dict" in loaded
    merged, n = transfer_params(jax.device_get(trainer.params),
                                loaded["model_state_dict"], verbose=False)
    assert n == len(jax.tree.leaves(merged))


@pytest.mark.slow
def test_training_learns_retrieval_task(tmp_path):
    """End-to-end GENERALIZATION proof: the full stack (shard loading ->
    example builder -> jitted train step -> two-LR AdamW) learns a
    deterministic lexical-retrieval rule (the answer is the x-tick label
    named in the question) and the REAL all-candidate ranking eval
    (evaluate(), the reference's CRCT/evaluation.py:287-312 protocol)
    scores it well above chance on a HELD-OUT split with unseen figures.
    Complements test_training_learns_binary_answers (a memorization
    proof): this one catches wiring bugs in candidate assembly, label
    signs and the eval argmax that loss-goes-down tests miss.

    Recipe notes (tuned on this box, 2026-08-17): training runs from
    SCRATCH (the reference warm-starts from pretrained BERT), where the
    NSP logits' sensitivity to any single token is ~1e-6 at the 0.02
    truncated-normal init — 10% dropout drowns that signal entirely (loss
    pinned at ln2 for 360+ steps), so dropout is off here. More epochs
    overfit: 1500 steps memorizes the 64 train questions and val drops
    back to ~8%; 600 steps is the generalization sweet spot."""
    params = synthetic_params(tmp_path, n_images=16, division=8,
                              n_questions=4, feat_dim=32, task="retrieval",
                              batch_size=32, eval_batch_size=64,
                              max_seq_len=96,
                              lr=2e-3, image_lr=2e-3, min_lr=5e-4,
                              warmup=60, num_workers=0)
    cfg = tiny_model_config(v_feature_size=32,
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0,
                            v_hidden_dropout_prob=0.0,
                            v_attention_probs_dropout_prob=0.0)
    model = CRCTModel(config=cfg, categories=params["categories"])
    ds = ChartQADataset(params, ["train", "val"])
    ds.split = "train"
    loader = DataLoader(ds, batch_size=32, shuffle=True, drop_last=True,
                        num_workers=0)
    # materialize 6 epochs (negative candidates resample per epoch,
    # fig_dataloader.py:261 semantics) and cycle them: amortizes the host
    # build cost over the 600 steps
    batches = [b for _ in range(6) for b in loader]
    trainer = Trainer(params, model, batches[0], iters_per_epoch=30)
    losses = []
    for i in range(600):
        m = np.asarray(trainer.run_step(batches[i % len(batches)]))
        losses.append(float(m[0]))
    tail = float(np.mean(losses[-50:]))
    assert tail < 0.45, f"train loss stuck at {tail:.3f} (ln2 = no signal)"

    from crct_tpu.train.eval_loop import evaluate
    ds.split = "val"
    ds.get_all_answers = True
    val_loader = DataLoader(ds, batch_size=8, shuffle=False,
                            drop_last=False, num_workers=0)
    total, _, _ = evaluate(val_loader, ds, params, model, trainer.params,
                           csv=False, progress=False)
    nsp_acc = total[0, 0] / total[0, 1]
    ds.get_all_answers = False
    chance = 1.0 / np.mean(np.asarray(
        [ds[i]["num_ans"] for i in range(len(ds))], np.float64))
    assert total[0, 1] == len(ds)
    # measured 0.172 at this recipe vs ~0.04 chance; 0.10 leaves slack
    # for cross-version numeric drift while staying ~2.5x above chance
    assert nsp_acc >= 0.10 and nsp_acc > 2 * chance, \
        f"val ranking accuracy {nsp_acc:.3f} (chance {chance:.3f})"

    # ---- phase 2: the fast-scorer modes on a REAL learned task ----------
    # train the light candidate head on the frozen learned backbone, then
    # check the fast-only and the topk shortlist+rescore eval paths also
    # score far above chance (the synthetic-data delta in
    # test_fast_scorer.py can't speak to accuracy; this task can).
    import functools
    import jax.numpy as jnp
    from crct_tpu.train.eval_loop import build_fast_rows
    from crct_tpu.train.fast_scorer_train import train_fast_scorer
    trained = jax.device_get(trainer.params)
    model_f = CRCTModel(config=cfg, categories=params["categories"],
                        fast_scorer=True)
    ds.split = "val"
    ds.get_all_answers = True
    sample = next(iter(DataLoader(ds, batch_size=4, shuffle=False,
                                  num_workers=0)))
    rows = {k: jnp.asarray(v) for k, v in build_fast_rows(sample).items()}
    fvars = jax.jit(functools.partial(model_f.init, train=False))(
        {"params": jax.random.key(1)}, rows)
    ds.get_all_answers = False
    fparams = dict(trained)
    fparams["fast_scorer"] = jax.device_get(fvars["params"])["fast_scorer"]
    pf = dict(params)
    pf["fast_scorer"] = True
    fparams, _ = train_fast_scorer(pf, ds, model_f, fparams, steps=200,
                                   lr=1e-3, batch_questions=16,
                                   log_print=lambda s: None)

    def eval_acc(extra):
        pp = dict(params)
        pp.update(extra)
        ds.split = "val"
        ds.get_all_answers = True
        vl = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                        num_workers=0)
        t, _, _ = evaluate(vl, ds, pp, model_f, fparams, csv=False,
                           progress=False)
        ds.get_all_answers = False
        return t[0, 0] / t[0, 1]

    acc_fast = eval_acc({"fast_scorer": True})
    acc_topk = eval_acc({"fast_scorer": True, "fast_scorer_topk": 8})
    # measured at this recipe: fast-only 0.266, topk8 0.203 (topk can beat
    # the full protocol: the rescoring model sees 8 candidates, not ~25)
    assert acc_fast >= 0.10 and acc_fast > 2 * chance, \
        f"fast-scorer val accuracy {acc_fast:.3f} (chance {chance:.3f})"
    assert acc_topk >= 0.10 and acc_topk > 2 * chance, \
        f"topk8 rescore val accuracy {acc_topk:.3f} (chance {chance:.3f})"


def test_nan_guard_halts_with_diagnostic(tmp_path):
    """Failure detection (beyond-reference): a non-finite loss halts
    training with a clear error and freezes the blown state in a
    diagnostic checkpoint instead of silently training on through NaNs
    (the reference has no such guard)."""
    import glob as _glob
    import json as _json

    params = synthetic_params(tmp_path, n_images=8, division=8,
                              n_questions=2, feat_dim=32,
                              batch_size=8, num_workers=1, num_epochs=1,
                              no_eval=True)
    with open(tmp_path / "tiny.json", "w") as f:
        _json.dump(dict(tiny_model_config(v_feature_size=32).__dict__,
                        use_pallas_attention=False), f, default=str)
    params["model_config"] = str(tmp_path / "tiny.json")

    # poison every training feature record -> first-step loss is NaN
    for fpath in _glob.glob(params["figure_feat_path"] + "train/*.npy"):
        shard = np.load(fpath, allow_pickle=True)
        for rec in shard:
            rec["vis_feat"] = np.full_like(rec["vis_feat"], np.nan)
        np.save(fpath, shard, allow_pickle=True)

    import signal

    from crct_tpu.train.train_loop import run_training
    ds = ChartQADataset(params, ["train"])
    handler_before = signal.getsignal(signal.SIGTERM)
    with pytest.raises(RuntimeError, match="NaN guard"):
        run_training(params, ds)
    # the guard's raise must not leak the loop's no-op SIGTERM handler:
    # a leaked handler appends to a dead list and the process would
    # silently swallow every later SIGTERM
    assert signal.getsignal(signal.SIGTERM) is handler_before
    diags = _glob.glob(str(tmp_path / "results" / "NANDIAG_step*.ckpt"))
    assert len(diags) == 1
    from crct_tpu.utils.checkpoint import load_checkpoint
    loaded = load_checkpoint(diags[0])
    assert "model_state_dict" in loaded

    # -no_nan_guard restores the reference's train-through behavior
    params["no_nan_guard"] = True
    ds2 = ChartQADataset(params, ["train"])
    run_training(params, ds2)


def test_max_checkpoints_retention(tmp_path):
    """-max_checkpoints K keeps only the newest K epoch checkpoints
    (0/default keeps all, the reference behavior)."""
    import glob as _glob

    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=2, feat_dim=32,
                              batch_size=8, num_workers=1,
                              max_checkpoints=2)
    cfg = tiny_model_config(v_feature_size=32)
    ds = ChartQADataset(params, ["train"])
    ds.split = "train"
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1)
    sample = next(iter(loader))
    from crct_tpu.models.crct import CRCTModel
    model = CRCTModel(config=cfg, categories=params["categories"])
    trainer = Trainer(params, model, sample, iters_per_epoch=len(loader))
    for epoch in range(3):
        trainer.step += 1
        trainer.save(epoch)
    from crct_tpu.utils.checkpoint import epoch_from_name
    cks = sorted(_glob.glob(str(tmp_path / "results" /
                                "plotqa_encoder_*.ckpt")))
    assert sorted(epoch_from_name(c) for c in cks) == [1, 2]

    # a preemption save shares its epoch number with the regular epoch
    # save; recency must order by (epoch, iter) so the newer resumable
    # state is the one retention keeps
    from crct_tpu.utils.checkpoint import epoch_iter_from_name
    names = ["plotqa_encoder_2_10.ckpt", "plotqa_encoder_2_37.ckpt",
             "plotqa_encoder_1_99.ckpt"]
    assert sorted(names, key=epoch_iter_from_name) == [
        "plotqa_encoder_1_99.ckpt", "plotqa_encoder_2_10.ckpt",
        "plotqa_encoder_2_37.ckpt"]
