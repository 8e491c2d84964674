"""Multi-host bring-up tests.

The reference's multi-node DDP path (NCCL + file:// rendezvous,
CRCT/train.py:22-28, options.py:114-117) maps to jax.distributed +
per-host input sharding. Since no multi-host TPU exists in CI, these tests
run REAL multi-process JAX: two subprocesses with 2 virtual CPU devices
each rendezvous through ``maybe_initialize_distributed`` (gloo CPU
collectives), assemble a global sharded batch, and reduce across hosts —
exercising the exact code paths ``cli/train.py`` / ``cli/evaluate.py`` use
on a real pod.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
rank, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, {repo!r})
from crct_tpu.parallel.mesh import maybe_initialize_distributed, shard_batch
# first JAX touch in the process: the coordinator rendezvous
ok = maybe_initialize_distributed(
    {{"dist_url": f"127.0.0.1:{{port}}", "world_size": 2, "rank": rank}})
assert ok, "initialize was skipped"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank
# idempotent second call must be a no-op
assert maybe_initialize_distributed(
    {{"dist_url": f"127.0.0.1:{{port}}", "world_size": 2, "rank": rank}}) is False

import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
mesh = Mesh(np.asarray(jax.devices()), ("data",))
assert len(jax.devices()) == 4                      # 2 local x 2 processes
# each host holds its slice of the global batch (DataLoader shard split);
# shard_batch assembles the global array (train_loop.py multihost branch)
local = {{"x": np.arange(8, dtype=np.float32).reshape(8, 1)[rank*4:(rank+1)*4]}}
batch = shard_batch(local, mesh)
assert batch["x"].shape == (8, 1)                   # global shape
total = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
assert float(total) == 28.0, float(total)

# end-of-eval accumulator reduction (eval_loop.global_sum)
from crct_tpu.train.eval_loop import global_sum
g = global_sum(np.asarray([float(rank + 1)]))
assert float(g[0]) == 3.0, g
# single-arg print = one atomic write (stderr shares the pipe; multi-arg
# prints interleave with gloo's log lines)
print(f"CHILD_OK_{{rank}}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=REPO))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [subprocess.Popen([sys.executable, str(script), str(r), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=str(tmp_path))
             for r in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"CHILD_OK_{r}" in out


def test_eval_log_per_rank_csvs(tmp_path):
    """Each rank writes its own CSV + snapshots; resume excludes the union
    of done ids from every rank (reference evaluation.py:69-126)."""
    from crct_tpu.train.eval_loop import EvaluationLog, get_prev_done_ids

    params = {"save_path": str(tmp_path), "eval_set": "test",
              "start_checkpoint": "ck.ckpt"}
    log0 = EvaluationLog(params, cont_eval=False, rank=0)
    log1 = EvaluationLog(params, cont_eval=False, rank=1)
    assert log0.fp != log1.fp
    assert set(log0.snapshot_paths.values()).isdisjoint(
        set(log1.snapshot_paths.values()))

    def row(i):
        return np.asarray([[i, 1, 1, 0.0, 0.0, 0.0, 0.0, 0.0]], object)

    log0.append(row(7))
    log0.append(row(9))
    log1.append(row(12))
    done = get_prev_done_ids(params)
    assert done is not None and sorted(done.tolist()) == [7, 9, 12]

    log0.save_tensors(np.ones((5, 4, 3, 3)), np.ones((6, 2)), np.ones(13))
    # rank 1 never snapshotted; its resume starts clean
    import pytest
    with pytest.raises(FileNotFoundError):
        log1.load_tensors()
    b, t, h = log0.load_tensors()
    assert b.shape == (5, 4, 3, 3) and t.shape == (6, 2) and h.shape == (13,)
