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


def test_generation_scan_pallas_path_matches_xla():
    """The in-scan Pallas decode path (ModelConfig.pallas_decode=True,
    kernel-layout KV cache) must produce token-identical greedy rollouts
    to the default XLA path from the same params."""
    import dataclasses

    from superconductor_vae_tpu.generation import (
        GenerationConfig, generate_with_kv_cache,
    )
    from superconductor_vae_tpu.models import FormulaDecoder
    from superconductor_vae_tpu.models.config import tiny_test_config

    mcfg = tiny_test_config()
    dec_xla = FormulaDecoder(mcfg)
    dec_pal = FormulaDecoder(dataclasses.replace(mcfg, pallas_decode=True))

    rng = jax.random.PRNGKey(0)
    b = 8
    z = jax.random.normal(rng, (b, mcfg.latent_dim))
    stoich = jax.random.normal(jax.random.fold_in(rng, 1),
                               (b, mcfg.stoich_input_dim))
    hv = jax.random.normal(jax.random.fold_in(rng, 2),
                           (b, mcfg.heads_input_dim))
    params = dec_xla.init(rng, z, jnp.zeros((b, mcfg.max_len), jnp.int32),
                          stoich, hv)
    gcfg = GenerationConfig(max_len=mcfg.max_len, temperature=0.0,
                            stop_boost=10.0, hard_stop_threshold=0.8)
    out_x = generate_with_kv_cache(dec_xla, params, z, stoich, hv,
                                   jax.random.PRNGKey(3), gcfg)['tokens']
    out_p = generate_with_kv_cache(dec_pal, params, z, stoich, hv,
                                   jax.random.PRNGKey(3), gcfg)['tokens']
    np.testing.assert_array_equal(np.asarray(out_x), np.asarray(out_p))
