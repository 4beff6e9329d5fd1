"""Contrastive-era legacy components: feature groups + KL annealing.

Reference: encoders/feature_groups.py:99-494, training/kl_annealing.py:27-272.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.models.feature_groups import (
    DEFAULT_GROUP_DIMS, AttentiveExpert, ContrastiveFeatureEncoder,
    ExpertAttentionHead, GroupedFeatureEncoder,
)
from superconductor_vae_tpu.training.kl_annealing import (
    CyclicalKLScheduler, KLLossWithAnnealing, kl_loss, kl_loss_free_bits,
)


class TestGroupedFeatureEncoder:
    def _groups(self, b=4):
        rng = np.random.default_rng(0)
        return {name: jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
                for name, d in DEFAULT_GROUP_DIMS.items()}

    def test_output_shape(self):
        enc = GroupedFeatureEncoder(DEFAULT_GROUP_DIMS, hidden_dim=32,
                                    n_heads=4)
        g = self._groups()
        params = enc.init(jax.random.PRNGKey(0), g)
        out = enc.apply(params, g)
        assert out.shape == (4, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_missing_group_zeros(self):
        dims = dict(DEFAULT_GROUP_DIMS, structure=12)
        enc = GroupedFeatureEncoder(dims, hidden_dim=16, n_heads=2)
        g = self._groups()
        g['structure'] = None  # optional group absent
        params = enc.init(jax.random.PRNGKey(0), g)
        out = enc.apply(params, g)
        assert out.shape == (4, 16)

    def test_return_attention(self):
        enc = GroupedFeatureEncoder(DEFAULT_GROUP_DIMS, hidden_dim=16,
                                    n_heads=2)
        g = self._groups()
        params = enc.init(jax.random.PRNGKey(0), g)
        out, attn = enc.apply(params, g, return_attention=True)
        assert attn.shape == (4, 2, 2)
        np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)

    def test_jit(self):
        enc = GroupedFeatureEncoder(DEFAULT_GROUP_DIMS, hidden_dim=16,
                                    n_heads=2)
        g = self._groups()
        params = enc.init(jax.random.PRNGKey(0), g)
        out = jax.jit(enc.apply)(params, g)
        assert out.shape == (4, 16)


class TestExpertAttention:
    def test_weights_sum_to_one(self):
        head = ExpertAttentionHead(hidden_dim=16)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3, 16)),
                        jnp.float32)
        params = head.init(jax.random.PRNGKey(0), x)
        w = head.apply(params, x)
        assert w.shape == (4, 3)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)

    def test_attentive_expert(self):
        exp = AttentiveExpert(hidden_dim=16, output_dim=1)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3, 16)),
                        jnp.float32)
        params = exp.init(jax.random.PRNGKey(0), x)
        out, w = exp.apply(params, x)
        assert out.shape == (4, 1)
        assert w.shape == (4, 3)


class TestContrastiveEncoder:
    def test_encode_and_project(self):
        enc = ContrastiveFeatureEncoder(input_dim=22, latent_dim=8,
                                        hidden_dims=(32,))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 22)),
                        jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x,
                          method=ContrastiveFeatureEncoder.encode_project)
        z = enc.apply(params, x)
        assert z.shape == (6, 8)
        p = enc.apply(params, z, method=ContrastiveFeatureEncoder.project)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(p, axis=-1)),
                                   1.0, rtol=1e-5)

    def test_contrastive_loss_separates(self):
        # clustered SC rows vs far negatives must score a LOWER loss than
        # an interleaved configuration
        enc = ContrastiveFeatureEncoder(input_dim=4, latent_dim=4,
                                        hidden_dims=(8,))
        x = jnp.zeros((2, 4))
        params = enc.init(jax.random.PRNGKey(0), x,
                          method=ContrastiveFeatureEncoder.encode_project)

        def loss(z_sc, z_neg):
            return float(enc.apply(
                params, jnp.asarray(z_sc, jnp.float32),
                jnp.asarray(z_neg, jnp.float32),
                method=ContrastiveFeatureEncoder.contrastive_loss))

        rng = np.random.default_rng(2)
        base = rng.normal(size=(1, 4))
        sc = np.concatenate([base + 0.01 * rng.normal(size=(1, 4))
                             for _ in range(4)])
        neg_far = -5.0 * np.abs(base) + rng.normal(size=(4, 4)) * 0.01
        l_sep = loss(sc, neg_far)
        l_mixed = loss(sc, sc + 0.01)  # negatives identical to positives
        assert l_sep < l_mixed


class TestKLAnnealing:
    def test_constant(self):
        s = CyclicalKLScheduler(schedule_type='constant', max_beta=0.7)
        assert s.get_beta(0) == 0.7
        assert s.get_beta(299) == 0.7

    def test_warmup_zero(self):
        s = CyclicalKLScheduler(warmup_epochs=10, min_beta=0.0)
        assert s.get_beta(5) == 0.0

    def test_monotonic_ramp_then_hold(self):
        s = CyclicalKLScheduler(n_epochs=110, warmup_epochs=10,
                                schedule_type='monotonic', cycle_ratio=0.5)
        assert s.get_beta(10) == pytest.approx(0.0)
        assert s.get_beta(35) == pytest.approx(0.5)
        assert s.get_beta(60) == pytest.approx(1.0)
        assert s.get_beta(109) == pytest.approx(1.0)

    def test_cyclical_repeats(self):
        s = CyclicalKLScheduler(n_epochs=90, warmup_epochs=10, n_cycles=4,
                                cycle_ratio=0.5)
        # cycle length 20: ramp 0..10, plateau 10..20 — repeated
        assert s.get_beta(10) == pytest.approx(0.0)
        assert s.get_beta(25) == pytest.approx(1.0)
        assert s.get_beta(30) == pytest.approx(0.0)  # next cycle restarts
        assert s.get_beta(45) == pytest.approx(1.0)

    def test_unknown_schedule_raises(self):
        with pytest.raises(ValueError):
            CyclicalKLScheduler(schedule_type='zigzag').get_beta(50)

    def test_kl_loss_standard_normal_is_zero(self):
        mu = jnp.zeros((4, 8))
        logvar = jnp.zeros((4, 8))
        assert float(kl_loss(mu, logvar)) == pytest.approx(0.0, abs=1e-6)

    def test_kl_loss_positive_off_prior(self):
        mu = jnp.ones((4, 8))
        logvar = jnp.zeros((4, 8))
        assert float(kl_loss(mu, logvar)) == pytest.approx(4.0)  # 0.5*1*8

    def test_free_bits_floor(self):
        mu = jnp.zeros((4, 8))
        logvar = jnp.zeros((4, 8))
        # exact posterior==prior but every dim still pays the 0.5-nat floor
        assert float(kl_loss_free_bits(mu, logvar, 0.5)) == pytest.approx(4.0)

    def test_combined_callable(self):
        m = KLLossWithAnnealing(n_epochs=100, warmup_epochs=10,
                                schedule_type='monotonic')
        mu = jnp.ones((2, 4))
        logvar = jnp.zeros((2, 4))
        weighted, raw, beta = m(mu, logvar, epoch=5)
        assert beta == 0.0 and float(weighted) == 0.0 and float(raw) > 0
        weighted, raw, beta = m(mu, logvar, epoch=99)
        assert beta == pytest.approx(1.0)
        assert float(weighted) == pytest.approx(float(raw))
