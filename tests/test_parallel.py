"""Unit tests for the TP sharding rules (parallel/mesh.py).

The dryrun driver (__graft_entry__.py) exercises shard_params_tp end to
end; these tests pin the per-leaf PartitionSpec logic on CPU so a regex or
path-key regression is caught by the suite, not only by the driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from superconductor_vae_tpu.models import FormulaDecoder, MaterialsEncoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.parallel import make_mesh, shard_params_tp
from superconductor_vae_tpu.parallel.mesh import tp_param_specs


@pytest.fixture(scope='module')
def dec_params():
    mcfg = tiny_test_config()
    dec = FormulaDecoder(mcfg)
    rng = jax.random.PRNGKey(0)
    b = 2
    return mcfg, dec.init(
        rng, jnp.zeros((b, mcfg.latent_dim)),
        jnp.zeros((b, mcfg.max_len), jnp.int32),
        jnp.zeros((b, mcfg.stoich_input_dim)),
        jnp.zeros((b, mcfg.heads_input_dim)))


def _flatten_with_names(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        names = tuple(getattr(k, 'key', getattr(k, 'name', ''))
                      for k in path)
        out['/'.join(str(n) for n in names)] = leaf
    return out


def test_tp_specs_expected_layouts(dec_params):
    mcfg, params = dec_params
    n_model = 2
    specs = _flatten_with_names(tp_param_specs(params, n_model))
    leaves = _flatten_with_names(params)

    def spec_for(substr, leafname):
        hits = [k for k in specs
                if substr in k and k.endswith('/' + leafname)]
        assert hits, f'no leaf matching {substr}/{leafname}'
        return hits[0], specs[hits[0]]

    # column-parallel: self-attention q kernel shards its OUTPUT dim
    k, s = spec_for('self_q', 'kernel')
    assert s == P(None, 'model'), (k, s)
    # ...and its bias shards too
    k, s = spec_for('self_q', 'bias')
    assert s == P('model'), (k, s)
    # row-parallel: second FFN kernel shards its INPUT dim, bias replicated
    k, s = spec_for('ff2', 'kernel')
    assert s == P('model', None), (k, s)
    k, s = spec_for('ff2', 'bias')
    assert s == P(), (k, s)
    # vocab-sharded token embedding (vocab is even)
    k, s = spec_for('token_embedding', 'embedding')
    if leaves[k].shape[0] % n_model == 0:
        assert s == P('model', None), (k, s)
    # LayerNorm scale/bias stay replicated
    ln = [k for k in specs if 'LayerNorm' in k or 'norm' in k.lower()]
    assert ln, 'no LayerNorm leaves found'
    for k in ln:
        assert specs[k] == P(), (k, specs[k])
    # the guard the dryrun relies on: at least one sharded leaf
    n_sharded = sum(1 for s in specs.values()
                    if any(a is not None for a in s))
    assert n_sharded >= 4


def test_tp_specs_element_embed_not_sharded():
    """The encoder's element_embed table must stay replicated even if its
    row count were divisible (the rule is restricted to token_embedding)."""
    mcfg = tiny_test_config()
    enc = MaterialsEncoder(mcfg)
    rng = jax.random.PRNGKey(0)
    b = 2
    params = enc.init(
        rng, jnp.zeros((b, mcfg.max_elements), jnp.int32),
        jnp.zeros((b, mcfg.max_elements)),
        jnp.zeros((b, mcfg.max_elements), bool),
        jnp.zeros((b, mcfg.magpie_dim)), jnp.zeros((b,)))
    specs = _flatten_with_names(tp_param_specs(params, 2))
    hits = {k: s for k, s in specs.items()
            if 'element_embed' in k and k.endswith('embedding')}
    assert hits
    for k, s in hits.items():
        assert s == P(), (k, s)


def test_shard_params_tp_n1_replicates(dec_params):
    _, params = dec_params
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    sharded = shard_params_tp(params, mesh)
    leaf = jax.tree.leaves(sharded)[0]
    assert leaf.sharding.spec == P()
