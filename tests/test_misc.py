"""Aux components: legacy models, materials API, topology, profiling, env."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestLegacyModels:
    def test_bidirectional_vae(self):
        from superconductor_vae_tpu.models.legacy import BidirectionalVAE
        m = BidirectionalVAE(feature_dim=16, hidden_dims=(32, 16),
                             latent_dim=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        params = m.init(jax.random.PRNGKey(1), x, rng=jax.random.PRNGKey(2))
        out = m.apply(params, x, rng=jax.random.PRNGKey(3))
        assert out['recon'].shape == (4, 16)
        assert out['z'].shape == (4, 8)
        losses = BidirectionalVAE.loss(out, x, jnp.zeros(4))
        for v in losses.values():
            assert np.isfinite(float(v))
        # deterministic mode reproducible
        o1 = m.apply(params, x, sample=False)
        o2 = m.apply(params, x, sample=False)
        np.testing.assert_array_equal(np.asarray(o1['z']), np.asarray(o2['z']))

    def test_pointer_generator(self):
        from superconductor_vae_tpu.models.legacy import PointerGeneratorDecoder
        m = PointerGeneratorDecoder(vocab_size=150, d_model=32, nhead=4)
        src = jnp.asarray([[10, 20, 30, 0]], jnp.int32)
        src_mask = src > 0
        tgt = jnp.asarray([[1, 10, 20]], jnp.int32)
        params = m.init(jax.random.PRNGKey(0), src, src_mask, tgt)
        out = m.apply(params, src, src_mask, tgt)
        assert out['log_probs'].shape == (1, 3, 150)
        # mixture is a valid distribution
        probs = np.exp(np.asarray(out['log_probs']))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
        assert ((np.asarray(out['p_gen']) >= 0)
                & (np.asarray(out['p_gen']) <= 1)).all()


def test_materials_api_fallback():
    from superconductor_vae_tpu.utils.materials_api import MaterialsProjectClient
    client = MaterialsProjectClient(api_key=None)
    rows = client.fetch_non_sc(40)
    assert len(rows) == 40
    assert all(r['category'].startswith('Non-SC') for r in rows)
    from superconductor_vae_tpu.data import parse_formula_composition
    assert all(parse_formula_composition(r['formula']) for r in rows)


def test_topology_analyzer(tmp_path):
    from superconductor_vae_tpu.analysis import TopologyAnalyzer
    rng = np.random.default_rng(0)
    # 3D manifold embedded in 32D
    z = rng.normal(size=(300, 3)) @ rng.normal(size=(3, 32))
    is_sc = (rng.random(300) < 0.5).astype(np.int32)
    tc = np.abs(rng.normal(30, 20, 300))
    out = TopologyAnalyzer(n_clusters=4, output_dir=tmp_path).analyze(
        z, is_sc=is_sc, tc_kelvin=tc, epoch=1)
    assert 1.5 < out['intrinsic_dim_mle'] < 6.0   # ~3D manifold
    assert out['pca_effective_rank'] < 8
    assert 'sc_boundary_ratio' in out
    assert len(out['cluster_sizes']) == 4
    assert (tmp_path / 'topology_summary.jsonl').exists()


def test_phase_timer():
    import time
    from superconductor_vae_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase('a'):
        time.sleep(0.01)
    with t.phase('b', sync=jnp.ones(4)):
        pass
    assert t.totals['a'] >= 0.01
    assert 'a' in t.summary() and 'b' in t.summary()
    t.reset()
    assert not t.totals


def test_env_detection():
    from superconductor_vae_tpu.utils.env_config import detect_environment
    env = detect_environment()
    assert env.platform in ('cpu', 'tpu', 'gpu')
    assert env.n_devices >= 1
    assert env.suggested_batch_size > 0
    assert env.as_overrides()['n_samples_rloo'] >= 2


def test_theory_config_citation():
    # bcs cap should be a sane Allen-Dynes number (tens of K)
    from superconductor_vae_tpu.ops.theory import TheoryConfig, _bcs_tc_cap
    cap = _bcs_tc_cap(TheoryConfig())
    assert 10 < cap < 100


def test_topology_hdbscan_and_boundary(tmp_path):
    """HDBSCAN natural clustering, kNN boundary detection, per-cluster
    quality and the full-tier per-sample dump
    (reference: analysis/hdbscan_topology.py, boundary_detector.py)."""
    from superconductor_vae_tpu.analysis import TopologyAnalyzer
    from superconductor_vae_tpu.analysis.topology import (boundary_metrics,
                                                          hdbscan_metrics)
    rng = np.random.default_rng(1)
    # two well-separated SC blobs + a non-SC blob between them
    blob1 = rng.normal(0, 0.3, size=(150, 16))
    blob2 = rng.normal(0, 0.3, size=(150, 16)) + 6.0
    # non-SC blob OVERLAPS blob1 so kNN neighborhoods mix labels there
    nonsc = rng.normal(0.2, 0.3, size=(100, 16))
    z = np.concatenate([blob1, blob2, nonsc])
    is_sc = np.array([1] * 300 + [0] * 100)
    tc = np.concatenate([np.full(150, 20.0), np.full(150, 80.0),
                         np.zeros(100)])

    h = hdbscan_metrics(z[is_sc == 1], tc[is_sc == 1], min_cluster_size=30)
    assert h['hdbscan_n_clusters'] == 2
    assert h['hdbscan_noise_fraction'] < 0.2
    assert h['hdbscan_silhouette'] > 0.5
    assert len(h['hdbscan_clusters']) == 2
    assert all('tc_mean' in c for c in h['hdbscan_clusters'])
    assert h['labels'].shape == (300,)

    b = boundary_metrics(z, is_sc, k=10)
    assert b['boundary_n_samples'] > 0          # blob edges touch non-SC
    assert b['heterogeneity'].shape == (400,)

    out = TopologyAnalyzer(n_clusters=2, output_dir=tmp_path).analyze(
        z, is_sc=is_sc, tc_kelvin=tc, epoch=2, full=True)
    assert out['hdbscan_n_clusters'] >= 2
    assert 'boundary_thickness' in out
    assert 'inter_cluster_distance_mean' in out
    assert 'pairwise_skewness' in out
    full = np.load(tmp_path / 'topology_full_2.npz')
    assert 'hdbscan_labels' in full and 'boundary_heterogeneity' in full
    # summary line is valid JSON
    import json as _json
    lines = (tmp_path / 'topology_summary.jsonl').read_text().splitlines()
    assert _json.loads(lines[-1])['epoch'] == 2


def test_debug_sanitizers():
    """utils/debug: checkify_fn localizes the first NaN op on-device;
    enable_nan_debugging flips the global first-NaN config (SURVEY 5.2)."""
    import jax
    import jax.numpy as jnp
    from superconductor_vae_tpu.utils.debug import (
        checkify_fn, enable_nan_debugging,
    )

    def loss(x):
        return jnp.sum(jnp.log(x))        # NaN for negative entries

    checked = jax.jit(checkify_fn(loss))
    err, out = checked(jnp.array([1.0, 2.0]))
    err.throw()                           # clean input: no error
    assert np.isfinite(float(out))

    err, out = checked(jnp.array([-1.0, 2.0]))
    with pytest.raises(Exception, match='nan'):
        err.throw()

    prev = jax.config.jax_debug_nans
    try:
        enable_nan_debugging()
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(loss)(jnp.array([-1.0]))
    finally:
        jax.config.update('jax_debug_nans', prev)


def test_resilient_metrics_path():
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        'train_resilient',
        Path(__file__).resolve().parents[1] / 'scripts' / 'train_resilient.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._metrics_path(['--output', 'outputs/x']) == \
        Path('outputs/x/training_metrics.csv')
    assert mod._metrics_path(['--output=o2']) == Path('o2/training_metrics.csv')
    assert mod._metrics_path([]) == Path('outputs/training_metrics.csv')


def _load_script(name):
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        name, Path(__file__).resolve().parents[1] / 'scripts' / f'{name}.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_holdout_summarize_dedup():
    """Rerun records can only improve the summary: exact beats any
    similarity, else highest similarity wins (the all-or-nothing shard
    JSONs this replaced once lost an EXACT to a timeout)."""
    mod = _load_script('holdout_summarize')
    records = [
        {'index': 0, 'target': 'A', 'exact': False, 'best_similarity': 0.998},
        {'index': 0, 'target': 'A', 'exact': True, 'best_similarity': 1.0},
        {'index': 1, 'target': 'B', 'exact': False, 'best_similarity': 0.97},
        # rerun of 1 with LOWER sim must not replace the earlier record
        {'index': 1, 'target': 'B', 'exact': False, 'best_similarity': 0.90},
        # exact with sim 1.0 preferred over non-exact even if non-exact
        # floats slightly higher on a different fuzzy scale
        {'index': 2, 'target': 'C', 'exact': True, 'best_similarity': 0.999},
        {'index': 2, 'target': 'C', 'exact': False, 'best_similarity': 0.9995},
    ]
    out = mod.summarize(records)
    assert out['targets_completed'] == 3
    assert out['exact'] == 2
    assert out['exact_targets'] == ['A', 'C']
    per = {r['index']: r for r in out['per_target']}
    assert per[0]['exact'] and per[0]['best_similarity'] == 1.0
    assert per[1]['best_similarity'] == 0.97
    assert per[2]['exact']
    assert out['ge_0.95'] == 3 and out['ge_0.99'] == 2
    assert mod.summarize([])['targets_completed'] == 0


def test_holdout_rerun_pick_misses(tmp_path):
    """Rerun queue: non-exact only, nearest-miss first, honors cap."""
    import json
    mod = _load_script('holdout_rerun_misses')
    stream = tmp_path / 's.jsonl'
    recs = [
        {'index': 0, 'target': 'A', 'exact': True, 'best_similarity': 1.0},
        {'index': 1, 'target': 'B', 'exact': False, 'best_similarity': 0.95},
        {'index': 2, 'target': 'C', 'exact': False, 'best_similarity': 0.999},
        {'index': 3, 'target': 'D', 'exact': False, 'best_similarity': 0.97},
        # a rerun already flipped 3 to exact — must drop out of the queue
        {'index': 3, 'target': 'D', 'exact': True, 'best_similarity': 1.0},
    ]
    stream.write_text('\n'.join(json.dumps(r) for r in recs) + '\n')
    misses = mod.pick_misses(str(stream), None)
    assert [m['index'] for m in misses] == [2, 1]
    assert [m['index'] for m in mod.pick_misses(str(stream), 1)] == [2]


def test_holdout_chunked_next_chunk(tmp_path):
    """OOM-resilient campaign driver: chunks start at the first missing
    index, stay contiguous, cap at the chunk size, and self-heal gaps
    left by a killed subprocess."""
    import json
    mod = _load_script('holdout_chunked')
    assert mod.next_chunk(set(), 45, 5) == (0, 5)
    assert mod.next_chunk(set(range(23)), 45, 5) == (23, 5)
    # gap left by an OOM-killed chunk is retried first, and the chunk
    # stops at the next already-done index
    assert mod.next_chunk({0, 1, 3, 4}, 45, 5) == (2, 1)
    assert mod.next_chunk({0, 1, 4}, 45, 5) == (2, 2)
    # tail shorter than the chunk
    assert mod.next_chunk(set(range(43)), 45, 5) == (43, 2)
    assert mod.next_chunk(set(range(45)), 45, 5) is None
    # done_indices tolerates blank/garbage lines
    s = tmp_path / 's.jsonl'
    s.write_text(json.dumps({'index': 7}) + '\n\nnot json\n'
                 + json.dumps({'no_index': 1}) + '\n')
    assert mod.done_indices(s) == {7}
    assert mod.done_indices(tmp_path / 'absent.jsonl') == set()
