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

import re
from typing import Any, Dict, Optional, Sequence

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


# ---------------------------------------------------------------------------
# Tensor parallelism (Megatron-style GSPMD annotations)
#
# The reference has no model parallelism at all; here TP is a first-class
# layout on the mesh's ``model`` axis.  We annotate the weight shardings and
# let GSPMD insert the collectives (the scaling-book recipe):
#
#   column-parallel (shard the OUTPUT feature dim + bias):
#     attention q/k/v projections, first FFN / head hidden layers
#   row-parallel (shard the INPUT feature dim, bias replicated):
#     attention output projections, second FFN layers, the vocab logits
#     projection (partial products psum'd by GSPMD)
#   vocab-sharded: the token embedding table's vocab dim
#
# A column→row pair needs exactly one all-reduce per pair and keeps the
# sharded activations on-device between them.  Anything unmatched (LayerNorm,
# small heads, odd dims) stays replicated — TP output is numerically
# equivalent to the replicated run up to floating-point reduction order
# (sharded matmuls/psums reorder the sums, hence the dryrun's rtol/atol=2e-4
# rather than exact equality).
# ---------------------------------------------------------------------------

_TP_COL = re.compile(r'(self|cross)_[qkv]$|^ff1$|^out_d1$')
_TP_ROW = re.compile(r'(self|cross)_o$|^ff2$|^out_d2$')


def _tp_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one param leaf under n_model-way tensor parallelism."""
    if n_model <= 1:
        return P()
    names = [getattr(k, 'key', getattr(k, 'name', '')) for k in path]
    leafname = names[-1] if names else ''
    module = names[-2] if len(names) >= 2 else ''
    # vocab-shard ONLY the decoder's token embedding table; other Embed
    # tables (e.g. the encoder's 119-row element_embed) are small and their
    # row counts are not tied to a shardable vocab dim
    if (leafname == 'embedding' and leaf.ndim == 2
            and 'token_embedding' in names
            and leaf.shape[0] % n_model == 0):
        return P('model', None)
    col = _TP_COL.search(str(module))
    row = _TP_ROW.search(str(module))
    if leafname == 'kernel' and leaf.ndim == 2:
        if col and leaf.shape[1] % n_model == 0:
            return P(None, 'model')
        if row and leaf.shape[0] % n_model == 0:
            return P('model', None)
    if leafname == 'bias' and leaf.ndim == 1 and col \
            and leaf.shape[0] % n_model == 0:
        return P('model')
    return P()


def tp_param_specs(params: Any, n_model: int) -> Any:
    """Pytree of PartitionSpecs mirroring ``params`` (for tests/inspection)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _tp_spec(p, x, n_model), params)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """device_put a param pytree with Megatron-style TP shardings.

    With ``mesh.shape['model'] == 1`` this is plain replication (the DP
    layout).  Optimizer moments inherit the layout via GSPMD propagation
    from the sharded gradients, so sharding the params is sufficient.
    """
    n_model = int(mesh.shape.get('model', 1))

    def put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, _tp_spec(path, leaf, n_model)))

    return jax.tree_util.tree_map_with_path(put, params)
