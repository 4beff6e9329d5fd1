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


def test_decode_step_attention_interpret():
    """Fused decode-step kernel vs the XLA reference, interpreter mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from superconductor_vae_tpu.ops.pallas_decode import (
        decode_step_attention, decode_step_attention_xla)

    rng = np.random.default_rng(0)
    B, H, T, Dh = 8, 4, 12, 16
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
    for pos in (0, 5, T - 1):
        o1, k1, v1 = decode_step_attention(q, kn, vn, kc, vc,
                                           jnp.int32(pos), block_b=4,
                                           interpret=True)
        o2, k2, v2 = decode_step_attention_xla(q, kn, vn, kc, vc, pos)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-5, err_msg=f'pos={pos}')
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
