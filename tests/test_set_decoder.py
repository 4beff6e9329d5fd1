"""Set decoder + exact in-jit Hungarian matching tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from superconductor_vae_tpu.models.set_decoder import SetFormulaDecoder
from superconductor_vae_tpu.ops.hungarian import (
    hungarian_assignment, batched_hungarian, hungarian_matching_loss,
)


def test_hungarian_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        cost = rng.random((12, 12)).astype(np.float32)
        perm, total = jax.jit(hungarian_assignment)(jnp.asarray(cost))
        rows, cols = linear_sum_assignment(cost)
        expected = cost[rows, cols].sum()
        assert float(total) == pytest.approx(expected, abs=1e-5)
        # permutation validity
        p = np.asarray(perm)
        assert sorted(p.tolist()) == list(range(12))
        assert cost[np.arange(12), p].sum() == pytest.approx(expected, abs=1e-5)


def test_hungarian_batched():
    rng = np.random.default_rng(1)
    cost = rng.random((5, 8, 8)).astype(np.float32)
    # pad to square 8x8, run batched
    perms, totals = jax.jit(batched_hungarian)(jnp.asarray(cost))
    for i in range(5):
        r, c = linear_sum_assignment(cost[i])
        assert float(totals[i]) == pytest.approx(cost[i][r, c].sum(), abs=1e-5)


def test_set_decoder_shapes():
    dec = SetFormulaDecoder(latent_dim=64, d_model=32, nhead=4,
                            num_layers=2, dim_feedforward=64)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
    params = dec.init(jax.random.PRNGKey(1), z)
    out = dec.apply(params, z)
    assert out['element_logits'].shape == (4, 12, 119)
    assert out['fraction_pred'].shape == (4, 12)
    assert out['presence_logits'].shape == (4, 12)
    assert (np.asarray(out['fraction_pred']) >= 0).all()  # softplus


def test_matching_loss_perfect_prediction():
    """If the decoder nails elements/fractions/presence, loss ~ 0 and
    set_exact = 1."""
    b, s = 2, 12
    gt_elements = np.zeros((b, s), np.int32)
    gt_fractions = np.zeros((b, s), np.float32)
    gt_mask = np.zeros((b, s), bool)
    gt_elements[0, :4] = [39, 56, 29, 8]       # YBCO
    gt_fractions[0, :4] = [1, 2, 3, 7]
    gt_mask[0, :4] = True
    gt_elements[1, :2] = [12, 5]               # MgB2
    gt_fractions[1, :2] = [1, 2]
    gt_mask[1, :2] = True

    # construct ideal predictions, shuffled slot order
    order = np.roll(np.arange(s), 3)
    el_logits = np.full((b, s, 119), -10.0, np.float32)
    frac = np.zeros((b, s), np.float32)
    pres = np.full((b, s), -10.0, np.float32)
    for bi in range(b):
        for slot, col in enumerate(order):
            e = gt_elements[bi, col] if gt_mask[bi, col] else 0
            el_logits[bi, slot, e] = 10.0
            if gt_mask[bi, col]:
                frac[bi, slot] = gt_fractions[bi, col]
                pres[bi, slot] = 10.0

    out = jax.jit(hungarian_matching_loss)(
        jnp.asarray(el_logits), jnp.asarray(frac), jnp.asarray(pres),
        jnp.asarray(gt_elements), jnp.asarray(gt_fractions),
        jnp.asarray(gt_mask))
    assert float(out['element_accuracy']) == 1.0
    assert float(out['set_exact']) == 1.0
    assert float(out['fraction_loss']) < 1e-6
    assert float(out['total']) < 0.1


def test_matching_loss_grads():
    dec = SetFormulaDecoder(latent_dim=32, d_model=32, nhead=4, num_layers=1,
                            dim_feedforward=32)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    params = dec.init(jax.random.PRNGKey(1), z)
    gt_e = jnp.asarray([[29, 8] + [0] * 10, [12, 5] + [0] * 10], jnp.int32)
    gt_f = jnp.asarray([[1, 1] + [0] * 10, [1, 2] + [0] * 10], jnp.float32)
    gt_m = gt_e > 0

    def loss_fn(p):
        out = dec.apply(p, z)
        return hungarian_matching_loss(
            out['element_logits'], out['fraction_pred'],
            out['presence_logits'], gt_e, gt_f, gt_m)['total']

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
