"""Phase-2 self-supervised loop, coverage tracker, mastery sampler, curriculum,
and the in-jit round-trip loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.data import synthetic_dataset
from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.tokenizer import default_tokenizer
from superconductor_vae_tpu.training.coverage_tracker import CoverageTracker
from superconductor_vae_tpu.training.mastery_sampler import (
    CurriculumScheduler, MasteryTracker,
)
from superconductor_vae_tpu.training.self_supervised import (
    NovelDiscoveryTracker, Phase2Config, SelfSupervisedEpoch,
)
from superconductor_vae_tpu.training.train_step import build_luts


def test_coverage_tracker():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(200, 16))
    ct = CoverageTracker(k=8)
    ct.fit(z)
    assert ct.centers.shape == (8, 16)
    w0 = ct.sampling_weights()
    np.testing.assert_allclose(w0.sum(), 1.0)
    # visiting one region lowers its weight
    target = ct.centers[0][None].repeat(50, axis=0)
    ct.record_visits(target)
    w1 = ct.sampling_weights()
    assert w1[0] < w0[0]
    assert ct.stats()['visited_fraction'] > 0


def test_coverage_quality_weighting():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(200, 16))
    ct = CoverageTracker(k=4, quality_alpha=1.0)
    ct.fit(z)
    # equal visits to clusters 0 and 1, but cluster 0 yields garbage
    v0 = ct.centers[0][None].repeat(20, axis=0)
    v1 = ct.centers[1][None].repeat(20, axis=0)
    ct.record_visits(np.concatenate([v0, v1]),
                     quality=np.concatenate([np.zeros(20), np.ones(20)]))
    w = ct.sampling_weights()
    assert w[1] > w[0]                     # productive cluster favored
    # unseen clusters keep the neutral prior, above the zero-quality one
    assert w[2] > w[0]
    # alpha=0 recovers pure coverage weighting
    ct.quality_alpha = 0.0
    w_cov = ct.sampling_weights()
    np.testing.assert_allclose(w_cov[0], w_cov[1], rtol=1e-9)


def test_coverage_hdbscan_fit():
    rng = np.random.default_rng(1)
    # two well-separated blobs -> HDBSCAN should find ~2 natural clusters,
    # or fall back to k-means centers; either way state must be usable
    z = np.concatenate([rng.normal(0, 0.3, size=(80, 8)),
                        rng.normal(6, 0.3, size=(80, 8))])
    ct = CoverageTracker(k=8)
    ct.fit(z, method='hdbscan')
    assert ct.centers is not None and len(ct.centers) >= 2
    assert ct.visits.shape == (len(ct.centers),)
    ct.record_visits(z[:10], quality=np.full(10, 0.9))
    assert ct.sampling_weights().shape == (len(ct.centers),)


def test_mastery_tracker():
    mt = MasteryTracker(10)
    idx = np.arange(5)
    for _ in range(5):
        mt.update(idx, np.ones(5))            # first 5 mastered
    w = mt.weights()
    assert w[:5].mean() < w[5:].mean()        # unseen get more weight
    # regression: mastered sample starts failing -> boosted
    for _ in range(5):
        mt.update(np.array([0]), np.array([0.0]))
    assert mt.regressed()[0]
    w2 = mt.weights()
    assert w2[0] > w[0]


def test_curriculum_scheduler():
    lengths = np.array([4, 5, 9, 9, 14, 20, 30])
    cs = CurriculumScheduler(lengths, bucket_edges=[3, 7, 11, 16, 24],
                             advance_patience=2)
    w = cs.get_sample_weights()
    assert w[0] == cs.active_boost            # active bucket = shortest
    # report two passing epochs -> advance
    exact = np.ones(len(lengths))
    cs.report_ar_exact(exact, np.arange(len(lengths)))
    cs.report_ar_exact(exact, np.arange(len(lengths)))
    assert cs.active == 1
    state = cs.state_dict()
    cs2 = CurriculumScheduler(lengths, bucket_edges=[3, 7, 11, 16, 24])
    cs2.load_state_dict(state)
    assert cs2.active == 1


def test_novel_discovery_tracker(tmp_path):
    t = NovelDiscoveryTracker({'MgB2'}, holdout={'YBa2Cu3O7'},
                              log_path=tmp_path / 'd.jsonl')
    assert not t.record('MgB2')               # known
    assert t.record('Nb3Sn')                  # novel
    assert t.record('YBa2Cu3O7')              # holdout hit
    assert t.holdout_hits == ['YBa2Cu3O7']
    assert (tmp_path / 'd.jsonl').read_text().count('\n') == 2


def test_round_trip_composition():
    from superconductor_vae_tpu.ops.round_trip import tokens_to_composition
    tok = default_tokenizer(max_len=16)
    tokens = jnp.asarray(tok.encode_batch(['YBa2Cu3O7'])[:, 1:], jnp.int32)
    mask = (tokens != 0).astype(jnp.float32)
    luts = build_luts(tok)
    e_idx, e_frac, e_mask = tokens_to_composition(
        tokens, mask, luts['token_to_z'], luts['token_value_table'])
    idx = np.asarray(e_idx[0])
    frac = np.asarray(e_frac[0])
    comp = {int(z): float(f) for z, f in zip(idx, frac) if f > 0}
    assert comp[8] == pytest.approx(7 / 13)   # O
    assert comp[29] == pytest.approx(3 / 13)  # Cu
    assert comp[39] == pytest.approx(1 / 13)  # Y


def test_phase2_epoch():
    cfg = tiny_test_config()
    ds = synthetic_dataset(n=48, max_len=cfg.max_len, magpie_dim=cfg.magpie_dim)
    tok = default_tokenizer(max_len=cfg.max_len)
    rng = jax.random.PRNGKey(0)
    enc = MaterialsEncoder(cfg)
    eparams = enc.init(rng, jnp.asarray(ds.element_indices[:2]),
                       jnp.asarray(ds.element_fractions[:2]),
                       jnp.asarray(ds.element_mask[:2]),
                       jnp.asarray(ds.magpie[:2]), jnp.asarray(ds.tc[:2]))
    dec = FormulaDecoder(cfg)
    dparams = dec.init(rng, jnp.zeros((2, cfg.latent_dim)),
                       jnp.asarray(ds.tokens[:2]),
                       jnp.zeros((2, cfg.stoich_input_dim)),
                       jnp.zeros((2, cfg.heads_input_dim)))
    luts = build_luts(tok)
    p2 = SelfSupervisedEpoch(enc, dec, tok, ds, luts,
                             cfg=Phase2Config(n_samples=16, coverage_k=4))
    z_cache = np.random.default_rng(0).normal(size=(48, cfg.latent_dim)) \
        .astype(np.float32)
    out = p2.run(eparams, dparams, z_cache, jax.random.PRNGKey(1))
    m = out['metrics']
    assert m['n_sampled'] == 16
    assert 0 <= m['unique_rate'] <= 1
    assert 'n_novel' in m
    # params returned either updated or unchanged, always a valid pytree
    assert jax.tree.structure(out['enc_params']) == jax.tree.structure(eparams)


def test_phase2_four_losses_update_both_models():
    """With permissive validators the update path runs: all four reference
    losses are reported and BOTH encoder and decoder params move
    (reference: self_supervised.py:976-1050 Phase2LossComputer)."""
    cfg = tiny_test_config()
    ds = synthetic_dataset(n=48, max_len=cfg.max_len, magpie_dim=cfg.magpie_dim)
    tok = default_tokenizer(max_len=cfg.max_len)
    rng = jax.random.PRNGKey(0)
    enc = MaterialsEncoder(cfg)
    eparams = enc.init(rng, jnp.asarray(ds.element_indices[:2]),
                       jnp.asarray(ds.element_fractions[:2]),
                       jnp.asarray(ds.element_mask[:2]),
                       jnp.asarray(ds.magpie[:2]), jnp.asarray(ds.tc[:2]))
    dec = FormulaDecoder(cfg)
    dparams = dec.init(rng, jnp.zeros((2, cfg.latent_dim)),
                       jnp.asarray(ds.tokens[:2]),
                       jnp.zeros((2, cfg.stoich_input_dim)),
                       jnp.zeros((2, cfg.heads_input_dim)))
    luts = build_luts(tok)
    p2 = SelfSupervisedEpoch(enc, dec, tok, ds, luts,
                             cfg=Phase2Config(n_samples=16, coverage_k=4))

    class _Accept:
        def validate(self, f):
            class R:
                is_valid = True
                score = 1.0
                is_plausible = True
            return R()
    p2.validator = _Accept()
    p2.physics = _Accept()

    z_cache = np.random.default_rng(0).normal(size=(48, cfg.latent_dim)) \
        .astype(np.float32)
    out = p2.run(eparams, dparams, z_cache, jax.random.PRNGKey(1),
                 phase2_weight=0.1, current_exact=0.9)
    m = out['metrics']
    if m['n_accepted'] == 0:
        pytest.skip('tiny model emitted only empty strings')
    for k in ('loss1_round_trip', 'loss2_consistency', 'loss3_physics',
              'loss4_reinforce'):
        assert np.isfinite(m[k]), k
    # both models updated
    diff_e = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(out['enc_params']),
                                 jax.tree.leaves(eparams)))
    diff_d = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(out['dec_params']),
                                 jax.tree.leaves(dparams)))
    assert diff_e > 0
    assert diff_d > 0


def test_phase2_collapse_intervention():
    """Mode collapse triggers the temperature/round-trip intervention for
    collapse_duration sub-epochs instead of skipping updates
    (reference: self_supervised.py:1494-1500, 1609-1616)."""
    cfg = tiny_test_config()
    ds = synthetic_dataset(n=48, max_len=cfg.max_len, magpie_dim=cfg.magpie_dim)
    tok = default_tokenizer(max_len=cfg.max_len)
    rng = jax.random.PRNGKey(0)
    enc = MaterialsEncoder(cfg)
    eparams = enc.init(rng, jnp.asarray(ds.element_indices[:2]),
                       jnp.asarray(ds.element_fractions[:2]),
                       jnp.asarray(ds.element_mask[:2]),
                       jnp.asarray(ds.magpie[:2]), jnp.asarray(ds.tc[:2]))
    dec = FormulaDecoder(cfg)
    dparams = dec.init(rng, jnp.zeros((2, cfg.latent_dim)),
                       jnp.asarray(ds.tokens[:2]),
                       jnp.zeros((2, cfg.stoich_input_dim)),
                       jnp.zeros((2, cfg.heads_input_dim)))
    luts = build_luts(tok)
    p2 = SelfSupervisedEpoch(enc, dec, tok, ds, luts,
                             cfg=Phase2Config(n_samples=16, coverage_k=4))

    class _Accept:
        def validate(self, f):
            class R:
                is_valid = True
                score = 1.0
                is_plausible = True
            return R()
    p2.validator = _Accept()
    p2.physics = _Accept()

    z_cache = np.random.default_rng(0).normal(size=(48, cfg.latent_dim)) \
        .astype(np.float32)
    # an untrained tiny model decodes near-identical formulas -> collapse
    out = p2.run(eparams, dparams, z_cache, jax.random.PRNGKey(1),
                 phase2_weight=0.1)
    m = out['metrics']
    if m['n_accepted'] == 0:
        pytest.skip('tiny model emitted only empty strings')
    if m['mode_collapsed']:
        # next sub-epoch runs with the boosted exploration temperature
        out2 = p2.run(out['enc_params'], out['dec_params'], z_cache,
                      jax.random.PRNGKey(2), phase2_weight=0.1)
        assert out2['metrics']['explore_temp'] == pytest.approx(
            p2.cfg.collapse_temp_boost)
    # exact-drop safety halves the weight
    p2._exact_hist = [0.9, 0.9, 0.9, 0.9]
    assert p2._safety_weight(0.1, 0.5) == pytest.approx(0.05)
