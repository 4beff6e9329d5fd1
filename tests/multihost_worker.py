"""Worker process for the simulated multi-host (DCN) input-path test.

Launched by tests/test_multihost.py as 2 local processes x 4 CPU devices
(JAX distributed runtime + Gloo CPU collectives).  Exercises the exact
primitives the train loop uses on real multi-host pods
(train_loop.py:376-383):

  * ``jax.distributed.initialize`` (coordinator = process 0)
  * a global ``make_mesh`` spanning both processes' devices
  * ``data/sampler.py::shard_batch_indices`` — per-host batch shard
  * ``parallel/mesh.py::shard_batch`` -> ``make_array_from_process_local_data``
  * a jitted grad whose data-parallel all-reduce crosses processes (GSPMD)

The reference has no distributed backend at all (SURVEY.md §2.10 — no
torch.distributed anywhere); this validates our DCN story in simulation.

Prints ``MULTIHOST_OK grad=<float>`` on success; the parent asserts both
workers print the same value and that it equals the single-process result.
"""

import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=4 '
                           + os.environ.get('XLA_FLAGS', ''))
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')
jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from superconductor_vae_tpu.data.sampler import shard_batch_indices  # noqa: E402
from superconductor_vae_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, replicate, shard_batch)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

mesh = make_mesh()          # (data=8, model=1) across both processes
GLOBAL_BATCH = 16
FEAT = 8

# every host draws the same seeded stream, keeps its contiguous shard —
# identical to the train loop's multi-host branch
rng = np.random.default_rng(0)
global_idx = rng.permutation(64)[:GLOBAL_BATCH]
local_idx = shard_batch_indices(global_idx, jax.process_index(),
                                jax.process_count())
assert len(local_idx) == GLOBAL_BATCH // nproc

table = (np.arange(64, dtype=np.float32)[:, None]
         * np.linspace(1.0, 2.0, FEAT)[None, :])        # deterministic "dataset"
batch = shard_batch({'x': table[local_idx]}, mesh)      # global sharded array
assert batch['x'].shape == (GLOBAL_BATCH, FEAT)         # global shape

w = jax.device_put(jnp.ones((FEAT,), jnp.float32), replicate(mesh))


@jax.jit
def grad_fn(w, x):
    # loss = mean over the GLOBAL batch; GSPMD inserts the cross-process
    # all-reduce for the replicated-param gradient
    return jax.grad(lambda w: jnp.mean(x @ w))(w)


g = np.asarray(jax.device_get(grad_fn(w, batch['x'])))
expected = table[global_idx].mean(axis=0)               # single-process answer
np.testing.assert_allclose(g, expected, rtol=1e-5)

print(f'MULTIHOST_OK grad={g.sum():.6f}', flush=True)
