"""Golden-value tests for the aux representation losses (SupCon contrastive,
self/bidirectional consistency) against an independent torch rendering of the
reference math (reference: src/superconductor/losses/contrastive.py:33-88,
consistency_losses.py:38-200)."""

import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.ops.aux_losses import (
    bidirectional_consistency_loss, self_consistency_loss, supcon_loss,
)


def _torch_supcon(z, labels, temperature=0.07, base_temperature=0.07):
    """Independent torch implementation of SupCon (Khosla et al. 2020 eq. 2)
    following the reference's conventions: all non-self pairs as contrast
    set, row-max stabilization, +1e-8 inside the log, zero loss for rows
    with no in-batch positive."""
    import torch
    import torch.nn.functional as F
    z = torch.tensor(z, dtype=torch.float64)
    labels = torch.tensor(labels)
    b = z.shape[0]
    zn = F.normalize(z, dim=1)
    sim = zn @ zn.T / temperature
    eye = torch.eye(b, dtype=torch.bool)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    sim = sim - sim.max(dim=1, keepdim=True).values
    exp_sim = sim.exp().masked_fill(eye, 0.0)
    log_prob = sim - (exp_sim.sum(dim=1, keepdim=True) + 1e-8).log()
    cnt = pos.sum(dim=1)
    mean_lp = (pos * log_prob).sum(dim=1) / cnt.clamp(min=1)
    mean_lp = mean_lp * (cnt > 0)
    return float((-(temperature / base_temperature) * mean_lp).mean())


class TestSupCon:
    def test_matches_torch_reference_math(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(16, 32))
        labels = rng.integers(0, 4, 16)
        got = float(supcon_loss(jnp.asarray(z, jnp.float32),
                                jnp.asarray(labels)))
        want = _torch_supcon(z, labels)
        assert got == pytest.approx(want, rel=1e-4)

    def test_separated_clusters_beat_mixed(self):
        # two tight, far-apart clusters with matching labels → near-minimal
        # loss; shuffled labels on the same geometry → much larger loss
        rng = np.random.default_rng(1)
        a = rng.normal(size=(8, 16)) * 0.01 + np.r_[[10.0], np.zeros(15)]
        b = rng.normal(size=(8, 16)) * 0.01 - np.r_[[10.0], np.zeros(15)]
        z = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        good = np.r_[np.zeros(8, int), np.ones(8, int)]
        bad = good.copy()
        rng.shuffle(bad)
        assert float(supcon_loss(z, jnp.asarray(good))) < \
            float(supcon_loss(z, jnp.asarray(bad))) - 1.0

    def test_no_positive_rows_contribute_zero(self):
        # all-distinct labels: every row has zero positives → loss exactly 0
        z = jnp.asarray(np.random.default_rng(2).normal(size=(4, 8)),
                        jnp.float32)
        assert float(supcon_loss(z, jnp.arange(4))) == 0.0

    def test_batch_of_one_is_zero(self):
        assert float(supcon_loss(jnp.ones((1, 8)), jnp.zeros(1, int))) == 0.0


class TestConsistency:
    def test_self_consistency_golden(self):
        rng = np.random.default_rng(3)
        o_tc, r_tc = rng.normal(size=8), rng.normal(size=8)
        o_m, r_m = rng.normal(size=(8, 5)), rng.normal(size=(8, 5))
        out = self_consistency_loss(
            jnp.asarray(o_tc, jnp.float32), jnp.asarray(r_tc, jnp.float32),
            jnp.asarray(o_m, jnp.float32), jnp.asarray(r_m, jnp.float32))
        want_tc = np.mean((r_tc - o_tc) ** 2)
        on = o_m / np.linalg.norm(o_m, axis=-1, keepdims=True)
        rn = r_m / np.linalg.norm(r_m, axis=-1, keepdims=True)
        want_m = 0.1 * np.mean((rn - on) ** 2)
        assert float(out['tc_consistency']) == pytest.approx(want_tc, rel=1e-5)
        assert float(out['magpie_consistency']) == pytest.approx(
            want_m, rel=1e-5)
        assert float(out['total']) == pytest.approx(want_tc + want_m, rel=1e-5)

    def test_self_consistency_huber(self):
        o = jnp.asarray([0.0, 0.0], jnp.float32)
        r = jnp.asarray([0.5, 3.0], jnp.float32)   # one inside, one outside δ
        out = self_consistency_loss(o, r, huber_delta=1.0)
        want = np.mean([0.5 * 0.5 ** 2, 1.0 * (3.0 - 0.5)])
        assert float(out['tc_consistency']) == pytest.approx(want, rel=1e-6)

    def test_bidirectional_golden(self):
        rng = np.random.default_rng(4)
        o, p = rng.normal(size=8), rng.normal(size=8)
        out = bidirectional_consistency_loss(
            jnp.asarray(o, jnp.float32), jnp.asarray(p, jnp.float32))
        err = np.abs(o - p)
        assert float(out['bidirectional_consistency']) == pytest.approx(
            np.mean((p - o) ** 2), rel=1e-5)
        assert float(out['tc_error_mean']) == pytest.approx(
            err.mean(), rel=1e-5)
        assert float(out['tc_error_std']) == pytest.approx(
            err.std(ddof=1), rel=1e-4)

    def test_jit_compatible(self):
        import jax
        f = jax.jit(lambda z, l: supcon_loss(z, l))
        g = jax.jit(lambda o, r: self_consistency_loss(o, r)['total'])
        z = jnp.ones((4, 8)) + jnp.arange(4)[:, None]
        assert np.isfinite(float(f(z, jnp.asarray([0, 0, 1, 1]))))
        assert np.isfinite(float(g(jnp.ones(4), jnp.zeros(4))))
