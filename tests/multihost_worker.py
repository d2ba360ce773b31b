"""Subprocess worker for the 2-process multi-host data-path test.

Each process holds only its DistributedSampler shard of the global batch;
``mesh.shard_batch`` assembles the global array via
``jax.make_array_from_process_local_data`` and a jitted loss/grad over the
global batch must match the single-process full-batch values computed by
the parent test (the reference's DDP+sampler contract,
reference runner_base.py:533-544).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

from myriad_tpu.datasets.loaders import DistributedSampler  # noqa: E402
from myriad_tpu.parallel import mesh as mesh_lib  # noqa: E402


class _Range:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


N, D = 16, 4
rng = np.random.default_rng(0)  # identical on every process
X = rng.normal(size=(N, D)).astype(np.float32)
Y = rng.normal(size=(N,)).astype(np.float32)
W = rng.normal(size=(D,)).astype(np.float32)

# per-process rows via the sampler keyed off the process index
sampler = DistributedSampler(_Range(N), jax.process_count(), jax.process_index(),
                             shuffle=False)
local_idx = np.asarray(list(iter(sampler)))
local = {"x": X[local_idx], "y": Y[local_idx]}

mesh = mesh_lib.make_mesh(n_model=1)
batch = mesh_lib.shard_batch(local, mesh)
w = mesh_lib.put_sharded(W, mesh_lib.replicated(mesh))


def loss_fn(w, b):
    return ((b["x"] @ w - b["y"]) ** 2).mean()


loss, grad = jax.jit(jax.value_and_grad(loss_fn))(w, batch)
print(f"RESULT {float(loss):.8f} " + " ".join(f"{g:.8f}" for g in np.asarray(grad)),
      flush=True)
