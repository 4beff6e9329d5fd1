"""Device mesh + sharding rules.

The reference is single-GPU with no distributed backend
(reference: SURVEY.md §2.10 — no torch.distributed anywhere); scale-up is
first-class here instead: a ``jax.sharding.Mesh`` with a ``data`` axis (DP
over ICI) and an optional ``model`` axis reserved for tensor sharding.  The
train step is jitted with NamedSharding annotations — batch arrays sharded on
``data``, parameters replicated — and GSPMD inserts the gradient
``psum``/reduce-scatter collectives over ICI automatically.

At 108M params, replicated parameters + DP is the roofline-optimal layout on
a v5e-8 (params are ~0.2 GB bf16; per-chip HBM traffic is dominated by
activations).  The ``model`` axis exists so larger variants can shard d_model
without API changes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, axis_names=('data', 'model'))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data'))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Transfer a host batch, splitting the leading axis across ``data``.

    Single-host: a sharded device_put.  Multi-host: each host holds its own
    shard of the global batch (data/sampler.py::shard_batch_indices draws
    it) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — no cross-host data motion.
    """
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
