"""Checkpoint resume (-continue), gradient accumulation, remat tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.models.crct import CRCTModel
from crct_tpu.train.train_loop import Trainer
from crct_tpu.utils.checkpoint import checkpoint_name, epoch_from_name
from tests.helpers import synthetic_params, tiny_model_config
from tests.test_model import make_batch


def test_checkpoint_name_round_trip():
    assert checkpoint_name(3, 1200) == "plotqa_encoder_3_1200.ckpt"
    assert epoch_from_name("/x/y/plotqa_encoder_7_999.ckpt") == 7


def _make_trainer(params, tmp_path, **model_kw):
    cfg = tiny_model_config(v_feature_size=32)
    ds = ChartQADataset(params, ["train"])
    ds.split = "train"
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1)
    sample = next(iter(loader))
    model = CRCTModel(config=cfg, categories=params["categories"], **model_kw)
    return Trainer(params, model, sample, iters_per_epoch=len(loader)), loader


def test_continue_mode_restores_step_and_epoch(tmp_path):
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=2, feat_dim=32, batch_size=8)
    trainer, loader = _make_trainer(params, tmp_path)
    for batch in loader:
        trainer.run_step(batch)
    steps = trainer.step
    path = trainer.save(epoch=2)

    params2 = dict(params)
    params2["start_checkpoint"] = path
    params2["continue"] = True
    trainer2, _ = _make_trainer(params2, tmp_path)
    assert trainer2.step == steps
    assert trainer2.start_epoch == 3
    # params restored exactly
    a = jax.tree.leaves(jax.device_get(trainer.params))
    b = jax.tree.leaves(jax.device_get(trainer2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_transfer_mode_ignores_optimizer(tmp_path):
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=2, feat_dim=32, batch_size=8)
    trainer, loader = _make_trainer(params, tmp_path)
    trainer.run_step(next(iter(loader)))
    path = trainer.save(epoch=0)
    params2 = dict(params)
    params2["start_checkpoint"] = path
    params2["continue"] = False
    trainer2, _ = _make_trainer(params2, tmp_path)
    assert trainer2.step == 0 and trainer2.start_epoch == 0


def test_async_save_matches_blocking_and_is_loadable(tmp_path):
    """blocking=False writes the identical checkpoint on a background
    thread; wait_for_save() flushes it (train_loop's epoch save path)."""
    from crct_tpu.utils.checkpoint import load_checkpoint
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=2, feat_dim=32, batch_size=8)
    trainer, loader = _make_trainer(params, tmp_path)
    trainer.run_step(next(iter(loader)))
    sync_path = trainer.save(epoch=0)
    async_path = trainer.save(epoch=1, blocking=False)
    assert async_path != sync_path
    trainer.wait_for_save()
    a = load_checkpoint(sync_path)
    b = load_checkpoint(async_path)
    flat_a = jax.tree.leaves(a["model_state_dict"])
    flat_b = jax.tree.leaves(b["model_state_dict"])
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(b["iter_id"]) == trainer.step


def test_async_save_error_surfaces_at_flush(tmp_path, monkeypatch):
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=2, feat_dim=32, batch_size=8)
    trainer, loader = _make_trainer(params, tmp_path)
    trainer.run_step(next(iter(loader)))
    import crct_tpu.train.train_loop as tl

    def boom(*a, **kw):
        raise OSError("disk full")

    monkeypatch.setattr(tl, "save_checkpoint", boom)
    trainer.save(epoch=0, blocking=False)
    with pytest.raises(RuntimeError, match="background checkpoint write"):
        trainer.wait_for_save()
    # the error is consumed: a subsequent flush is clean
    trainer.wait_for_save()


def test_gradient_accumulation_multisteps(tmp_path):
    params = synthetic_params(tmp_path, n_images=8, division=4,
                              n_questions=2, feat_dim=32, batch_size=4,
                              batch_multiply=2)
    trainer, loader = _make_trainer(params, tmp_path)
    p0 = jax.device_get(jax.tree.leaves(trainer.params)[0]).copy()
    it = iter(loader)
    trainer.run_step(next(it))
    # after the first micro-step params must be unchanged (accumulating)
    p1 = jax.device_get(jax.tree.leaves(trainer.params)[0])
    np.testing.assert_array_equal(p0, p1)
    trainer.run_step(next(it))
    p2 = jax.device_get(jax.tree.leaves(trainer.params)[0])
    assert np.abs(p2 - p0).max() > 0


def test_remat_matches_baseline_gradients():
    batch = make_batch(np.random.default_rng(0))
    grads = []
    for remat in (False, True):
        cfg = tiny_model_config(remat=remat)
        model = CRCTModel(config=cfg, categories=10)
        v = model.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)}, batch, train=True)
        g = jax.jit(jax.grad(lambda p: model.apply(
            {"params": p}, batch, train=True,
            rngs={"dropout": jax.random.key(2)}).loss))(v["params"])
        grads.append(g)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
