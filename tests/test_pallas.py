"""Pallas fused-attention kernel correctness (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.ops.attention import causal_mask, mha_attention
from superconductor_vae_tpu.ops.pallas_attention import (
    fused_attention, pallas_attention,
)


@pytest.mark.parametrize('t,dh', [(128, 64), (256, 72), (128, 128)])
def test_pallas_matches_einsum_causal(t, dh):
    rng = np.random.default_rng(0)
    b, h = 2, 2
    q = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)

    ref = mha_attention(q, k, v, causal_mask(t))
    got = pallas_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_padded_seq():
    """Non-multiple-of-block sequence lengths pad correctly."""
    rng = np.random.default_rng(1)
    b, t, h, dh = 1, 100, 2, 72
    q = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    ref = mha_attention(q, k, v, causal_mask(t))
    got = pallas_attention(q, k, v, causal=True, interpret=True,
                           block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_small_uses_xla():
    """Short sequences route to the XLA path (identical results trivially)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 16, 2, 32)), jnp.float32)
    k, v = q + 1.0, q - 1.0
    out = fused_attention(q, k, v, causal=True)
    ref = mha_attention(q, k, v, causal_mask(16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
