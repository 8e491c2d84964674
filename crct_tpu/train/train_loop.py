"""Jitted training step and epoch loop (reference CRCT/train.py).

One compiled ``train_step(params, opt_state, batch, rng) ->
(params, opt_state, metrics)`` carries the whole hot path: forward, losses,
backward, AdamW update and the 9-slot metric vector. Data parallelism comes
from batch sharding over the mesh — XLA inserts the gradient all-reduce
(replacing DDP backward hooks, train.py:208) and the metric reduction
(replacing the explicit NCCL all_reduce, train.py:184-191). bf16 activations
replace CUDA AMP; no loss scaling is needed on TPU.
"""

from __future__ import annotations

import os
import time
from functools import partial
from time import gmtime, strftime
from timeit import default_timer as timer
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from crct_tpu.models.crct import CRCTModel, build_model
from crct_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from crct_tpu.train.optimizer import current_lr, make_optimizer
from crct_tpu.utils.checkpoint import (checkpoint_name, epoch_from_name,
                                       epoch_iter_from_name, load_checkpoint,
                                       save_checkpoint, transfer_params)
from crct_tpu.utils.logging import init_log_file, log_line

# device-array batch keys consumed by the jitted step
STEP_KEYS = ["tokens", "segments", "loc", "sep_indices", "hist_len",
             "image_feat", "image_loc", "image_mask", "image_target", "R",
             "next_sentence_labels", "area"]


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: batch[k] for k in STEP_KEYS if k in batch}


def make_train_step(model: CRCTModel, tx: optax.GradientTransformation):
    """Returns the jittable (params, opt_state, batch, rng) -> ... step."""

    def train_step(params, opt_state, batch, dropout_rng):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, train=True,
                              rngs={"dropout": dropout_rng})
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        needs = out.needs_reg
        num_regs = jnp.sum(needs)
        denom = jnp.maximum(num_regs, 1).astype(jnp.float32)
        reg_loss_mean = jnp.sum(out.reg_loss) / denom
        reg_5_dist_mean = jnp.sum(out.reg_5_dist) / denom
        # 9-slot metric vector (reference train.py:181-191):
        # [loss, lm_loss, nsp_loss, reg_loss, reg_5_dist, legend_loss,
        #  num_regs, reg_5_right, reg_t_right]
        metrics = jnp.stack([
            loss, jnp.zeros(()), out.nsp_loss, reg_loss_mean, reg_5_dist_mean,
            jnp.zeros(()), num_regs.astype(jnp.float32),
            jnp.sum(out.correct_regs).astype(jnp.float32),
            jnp.sum(out.correct_t_regs).astype(jnp.float32),
        ])
        return params, opt_state, metrics

    return train_step


class Trainer:
    """End-to-end trainer: mesh, optimizer, compiled step, checkpoints."""

    def __init__(self, params_dict: Dict[str, Any], model: Optional[CRCTModel],
                 sample_batch: Dict[str, Any], iters_per_epoch: float,
                 mesh=None):
        self.params_dict = params_dict
        self.model = model or build_model(params_dict)
        self.mesh = mesh or make_mesh(
            int(params_dict["mesh_shape"]) if params_dict.get("mesh_shape")
            else None)
        self.iters_per_epoch = iters_per_epoch

        rng = jax.random.key(params_dict.get("seed", 0))
        init_batch = jax.tree.map(
            lambda x: jnp.asarray(x), device_batch(sample_batch))
        # jit the init: eager flax init dispatches op-by-op, which is very
        # slow over a remote-device tunnel
        variables = jax.jit(partial(self.model.init, train=True))(
            {"params": rng, "dropout": rng}, init_batch)
        self.params = variables["params"]

        tx = make_optimizer(params_dict, self.params, iters_per_epoch)
        if params_dict.get("batch_multiply", 1) > 1:
            tx = optax.MultiSteps(tx, params_dict["batch_multiply"])
        self.tx = tx
        self.opt_state = jax.jit(tx.init)(self.params)
        self.step = 0
        self.start_epoch = 0
        self._save_thread = None     # in-flight async checkpoint writer
        self._save_error = None

        self._maybe_load_checkpoint()

        # replicate state over the mesh; jit the step
        self.params = replicate(self.params, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)
        self.train_step = jax.jit(
            make_train_step(self.model, self.tx), donate_argnums=(0, 1))
        # rbg dropout keys: threefry bit generation costs ~40% of the step
        # on TPU at this model size (measured v5e); rbg is hardware-backed
        self._rng = jax.random.key(params_dict.get("seed", 0) + 17,
                                   impl=params_dict.get("rng_impl", "rbg"))

    # ------------------------------------------------------------------
    def _maybe_load_checkpoint(self) -> None:
        pd = self.params_dict
        ckpt = pd.get("start_checkpoint")
        if not ckpt:
            return
        loaded = load_checkpoint(ckpt)
        if not pd.get("continue"):
            src = loaded.get("model_state_dict", loaded)
            self.params, _ = transfer_params(self.params, src)
        else:
            from crct_tpu.utils.checkpoint import restore_opt_state
            self.params, _ = transfer_params(
                self.params, loaded["model_state_dict"])
            if "optimizer_state_dict" in loaded:
                self.opt_state = restore_opt_state(
                    self.opt_state, loaded["optimizer_state_dict"])
            self.step = int(loaded.get("iter_id", 0))
            self.start_epoch = epoch_from_name(ckpt) + 1

    # ------------------------------------------------------------------
    def run_step(self, batch: Dict[str, Any]):
        self._rng, sub = jax.random.split(self._rng)
        db = shard_batch(device_batch(batch), self.mesh)
        self.params, self.opt_state, metrics = self.train_step(
            self.params, self.opt_state, db, sub)
        self.step += 1
        return metrics

    def save(self, epoch: int, blocking: bool = True) -> str:
        """Save an epoch checkpoint; with ``blocking=False`` the disk write
        runs on a background thread so the next epoch (and the in-train
        eval) overlap it. The device->host fetch stays synchronous either
        way: the jitted step donates the param/opt buffers, so they must be
        materialized on host before the next ``run_step`` invalidates them.
        """
        pd = self.params_dict
        os.makedirs(pd["save_path"], exist_ok=True)
        path = os.path.join(pd["save_path"], checkpoint_name(epoch, self.step))
        self.wait_for_save()              # one writer at a time
        host_params = jax.device_get(self.params)
        host_opt = jax.device_get(self.opt_state)
        step = self.step

        def _write() -> None:
            save_checkpoint(path, host_params, host_opt, step)
            self._retention_cleanup()

        if blocking:
            _write()
        else:
            import threading

            def _runner() -> None:
                try:
                    _write()
                except BaseException as e:   # surfaced at next wait_for_save
                    self._save_error = e

            self._save_thread = threading.Thread(
                target=_runner, name="ckpt-writer", daemon=True)
            self._save_thread.start()
        return path

    def wait_for_save(self) -> None:
        """Join an in-flight async checkpoint write; re-raise its error."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
        err = getattr(self, "_save_error", None)
        if err is not None:
            self._save_error = None
            raise RuntimeError(
                "background checkpoint write failed") from err

    def _retention_cleanup(self) -> None:
        keep = int(self.params_dict.get("max_checkpoints") or 0)
        if keep > 0:
            # opt-in retention: drop the oldest epoch checkpoints beyond
            # the newest `keep` (the reference keeps every epoch, which at
            # flagship scale is ~1.3 GB x 20 epochs per run)
            import glob as _glob
            import shutil
            cks = sorted(_glob.glob(os.path.join(
                self.params_dict["save_path"], "plotqa_encoder_*.ckpt")),
                key=epoch_iter_from_name)
            for old in cks[:-keep]:
                shutil.rmtree(old, ignore_errors=True)   # orbax ckpt = dir
                if os.path.isfile(old):
                    os.remove(old)


def run_training(params_dict: Dict[str, Any], dataset, eval_fn=None) -> Trainer:
    """Full multi-epoch training loop with logging, checkpoints and in-train
    eval (reference run_training_DDP, train.py:21-353)."""
    from crct_tpu.data.dataset import DataLoader

    init_log_file(params_dict)
    n_dev = len(jax.devices()) if params_dict.get("ddp") else 1
    log_line(params_dict,
             "De facto batch_size: {}*{}*{} = {}".format(
                 params_dict["batch_size"], n_dev,
                 params_dict["batch_multiply"],
                 params_dict["batch_size"] * n_dev * params_dict["batch_multiply"]))

    dataset.split = "train"
    global_batch = params_dict["batch_size"] * (n_dev if params_dict.get("ddp") else 1)
    # each process loads only its interleaved slice of the global batch
    # (DistributedSampler parity, train.py:55); shard_batch reassembles the
    # global array across hosts
    per_host_batch = global_batch // jax.process_count()
    loader = DataLoader(dataset, per_host_batch, shuffle=True,
                        seed=params_dict.get("seed", 0),
                        num_workers=params_dict.get("num_workers", 8) or 1,
                        drop_last=True, num_shards=jax.process_count(),
                        shard_index=jax.process_index())
    iters_per_epoch = max(1, len(loader) / params_dict["batch_multiply"])
    if len(loader) == 0:
        raise ValueError(
            f"empty dataloader: dataset has {len(dataset)} examples but the "
            f"global batch size is {global_batch} with drop_last — lower "
            f"-batch_size or add data")

    # param shapes are batch-size independent: init on a 2-row sample
    # instead of the global batch (a global-batch init would run a
    # batch-80-x-n-devices forward on ONE device just to derive shapes —
    # an HBM-OOM risk at flagship scale, and a slow host-side build)
    sample_batch = next(iter(DataLoader(dataset, 2, shuffle=False,
                                        num_workers=1)))
    trainer = Trainer(params_dict, None, sample_batch, iters_per_epoch)
    log_line(params_dict, f"len(dataloader)={len(loader)}")

    tb_writer = _maybe_tensorboard(params_dict)
    PRINT_EVERY = 100
    # TB scalars every 10 optimizer updates: each write forces a host fetch
    # of the metric vector (a device-queue sync); the reference writes every
    # update (train.py:217-224) but pays that sync anyway on its own fetches
    TB_EVERY = 10 * max(1, params_dict["batch_multiply"])
    from collections import deque
    loss_hist: deque = deque(maxlen=100)   # (reg, nsp) at metric-FETCH
    start_t = timer()                      # points, for the run-mean display

    profile_dir = os.path.join(params_dict["save_path"], "profile")

    # preemption-safe checkpointing (beyond-reference): SIGTERM — the
    # signal preemptible TPU VMs get — requests a graceful stop; the loop
    # saves a resumable checkpoint at the next step boundary and returns.
    # The save carries epoch_id-1 in its name so `-continue` re-runs the
    # interrupted epoch from its (deterministically reshuffled) start.
    stop_requested = []
    prev_handler = None
    try:
        import signal
        prev_handler = signal.signal(
            signal.SIGTERM, lambda *_: stop_requested.append(True))
    except ValueError:     # not the main thread (e.g. threaded tests)
        pass

    def _preempt_save(epoch_id: int) -> None:
        if jax.process_index() == 0:
            trainer.wait_for_save()   # don't race the epoch writer
            pd = params_dict
            os.makedirs(pd["save_path"], exist_ok=True)
            path = os.path.join(
                pd["save_path"], checkpoint_name(epoch_id - 1, trainer.step))
            save_checkpoint(path, jax.device_get(trainer.params),
                            jax.device_get(trainer.opt_state), trainer.step)
            log_line(pd, f"SIGTERM: saved preemption checkpoint {path}; "
                         f"resume with -continue -start_checkpoint {path}")

    def _restore_handler() -> None:
        if prev_handler is not None:
            import signal
            signal.signal(signal.SIGTERM, prev_handler)

    # track exception state explicitly instead of consulting sys.exc_info()
    # in the finally block: exc_info is also non-None when run_training is
    # *called from inside* an active except handler, which would silently
    # swallow a background checkpoint-write failure on a clean run
    clean_exit = False
    try:
        result = _run_epochs(params_dict, trainer, loader, dataset, eval_fn,
                             stop_requested, _preempt_save, tb_writer,
                             loss_hist, start_t, profile_dir, iters_per_epoch,
                             PRINT_EVERY, TB_EVERY)
        clean_exit = True
        return result
    finally:
        # the handler must not outlive this call even when the NaN guard
        # (or anything else) raises: the stop_requested list it appends to
        # is dead, so a leaked handler would silently swallow SIGTERM for
        # the rest of the process
        _restore_handler()
        # flush the async epoch-checkpoint writer; an in-flight exception
        # must fail the run — unless an original exception is already
        # propagating, in which case that one wins
        if clean_exit:
            trainer.wait_for_save()
        else:
            try:
                trainer.wait_for_save()
            except Exception:
                pass


def _run_epochs(params_dict, trainer, loader, dataset, eval_fn,
                stop_requested, _preempt_save, tb_writer, loss_hist,
                start_t, profile_dir, iters_per_epoch,
                PRINT_EVERY, TB_EVERY):
    for epoch_id in range(trainer.start_epoch, params_dict["num_epochs"]):
        loader.set_epoch(epoch_id)
        epoch_time = time.time()
        for iter_id, batch in enumerate(loader):
            if stop_requested:
                _preempt_save(epoch_id)
                return trainer
            # first-class step tracing (the reference had only ad-hoc
            # wall-clock timers, SURVEY.md §5)
            if params_dict.get("profile") and trainer.step == 10:
                jax.profiler.start_trace(profile_dir)
            device_metrics = trainer.run_step(batch)
            if params_dict.get("profile") and trainer.step == 15:
                jax.profiler.stop_trace()
                log_line(params_dict, f"profiler trace saved to {profile_dir}")
            # fetch metrics to host only when something consumes them; the
            # device queue stays async between log points
            need_tb = tb_writer is not None and iter_id % TB_EVERY == 0
            need_log = iter_id % PRINT_EVERY == 0
            if not (need_tb or need_log):
                continue
            metrics = np.asarray(device_metrics)
            (total_loss, lm_loss, nsp_loss, reg_loss, reg_5_dist, leg_loss,
             num_regs, reg_5_right, reg_t_right) = metrics
            if not params_dict.get("no_nan_guard") and \
                    not np.isfinite(total_loss):
                # failure detection (beyond-reference; the reference trains
                # on through NaNs silently): params are already polluted by
                # this update — freeze the blown state for diagnosis and
                # stop instead of burning the rest of the run
                diag = "the rank-0 host"
                if jax.process_index() == 0:
                    # one orbax writer at a time: a previous epoch's async
                    # write may still be in flight on the background thread
                    try:
                        trainer.wait_for_save()
                    except Exception:
                        pass   # the NaN diagnosis below is the primary error
                    os.makedirs(params_dict["save_path"], exist_ok=True)
                    diag = os.path.join(
                        params_dict["save_path"],
                        f"NANDIAG_step{trainer.step}.ckpt")
                    save_checkpoint(diag, jax.device_get(trainer.params),
                                    jax.device_get(trainer.opt_state),
                                    trainer.step)
                raise RuntimeError(
                    f"non-finite loss {total_loss!r} at step {trainer.step} "
                    f"(epoch {epoch_id}, iter {iter_id}): training halted "
                    f"by the NaN guard. Blown state saved to {diag} for "
                    f"diagnosis; restart from the last epoch checkpoint "
                    f"with -continue, or lower the lr. (-no_nan_guard "
                    f"disables this check.)")
            loss_hist.append((reg_loss, nsp_loss))
            if need_tb:
                tb_writer.add_scalar("Loss/Total Loss", total_loss, trainer.step)
                tb_writer.add_scalar("Loss/nsp", nsp_loss, trainer.step)
                tb_writer.add_scalar("Reg Loss/reg_MSE", reg_loss, trainer.step)
                tb_writer.add_scalar("Reg Loss/reg_5_dist", reg_5_dist, trainer.step)
                if num_regs > 0:
                    tb_writer.add_scalar("Accuracy/reg_acc",
                                         reg_5_right / num_regs, trainer.step)
                    tb_writer.add_scalar("Accuracy/reg_t_acc",
                                         reg_t_right / num_regs, trainer.step)
            if iter_id % PRINT_EVERY == 0:
                end_t = timer()
                cur_epoch = epoch_id + iter_id / max(1, len(loader))
                est = (len(loader) - iter_id) * (end_t - start_t) / PRINT_EVERY
                hist = np.asarray(loss_hist)
                log_line(params_dict,
                         "[Ep: %.2f][%s][lr: %.2e][Iter: %d][Time: %5.2fs]"
                         "[Est: %s][Loss: %.3g][NSP: %.3g][Reg: %.3g]"
                         "[Regs: %d/%d][Reg_acc: %.2g | %.2g]"
                         "[run mean r,n: (%.3g , %.3g)]" % (
                             cur_epoch, strftime("%a %X", gmtime()),
                             # the schedule advances once per optimizer
                             # UPDATE (optax.MultiSteps), not per mini-step
                             current_lr(params_dict, iters_per_epoch,
                                        trainer.step
                                        // max(1, params_dict["batch_multiply"])),
                             trainer.step, end_t - start_t,
                             strftime("%H:%M", gmtime(est)), total_loss,
                             nsp_loss, reg_loss, num_regs,
                             # metrics are global (psum); so is the row count
                             len(batch["R"]) * jax.process_count(),
                             reg_5_right / max(1, num_regs),
                             reg_t_right / max(1, num_regs),
                             hist[:, 0].mean(), hist[:, 1].mean()))
                start_t = end_t

        log_line(params_dict, "Epoch Time: "
                 + strftime("%H:%M", gmtime(time.time() - epoch_time)))
        # rank-0 save (reference train.py:287): with a shared filesystem,
        # concurrent force=True orbax saves to the SAME path from every
        # host corrupt the checkpoint
        if jax.process_index() == 0:
            # non-blocking: the ~GB-scale orbax write overlaps the in-train
            # eval and the next epoch; run_training flushes it at exit
            path = trainer.save(epoch_id, blocking=False)
            # the disk write is merely enqueued here; a failure surfaces at
            # the next wait_for_save() flush — don't log it as completed
            log_line(params_dict, f"     --> Saving model to: {path} (async)")

        if not params_dict.get("no_eval") and eval_fn is not None:
            log_line(params_dict, "Starting evaluation (on sampled val set)...")
            t0 = time.time()
            eval_fn(trainer, dataset, epoch_id)
            log_line(params_dict,
                     f"     -> Eval time: {round(time.time() - t0, 2)}")
            dataset.split = "train"
    return trainer


def _maybe_tensorboard(params_dict: Dict[str, Any]):
    from crct_tpu.utils.logging import is_rank0
    if not is_rank0(params_dict) or not params_dict.get("tensorboard"):
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir=os.path.join(
            params_dict["tensorboard"], params_dict.get("save_name", "")))
    except Exception:
        return None
