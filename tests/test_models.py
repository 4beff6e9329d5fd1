"""Encoder/decoder model tests on the tiny config.

The KV-cache consistency test is the critical invariant: greedy cached decode
must reproduce the parallel teacher-forced forward given the same prefix
(this is what the reference validates implicitly via its KV-cache rewrite,
reference: autoregressive_decoder.py:1160-1319).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.generation import (
    GenerationConfig, generate_with_kv_cache, sequence_mask,
)
from superconductor_vae_tpu.tokenizer import BOS_ID, EOS_ID, PAD_ID

CFG = tiny_test_config()
B = 4


@pytest.fixture(scope='module')
def encoder_and_params():
    enc = MaterialsEncoder(CFG)
    rng = jax.random.PRNGKey(0)
    batch = _fake_batch(rng)
    params = enc.init(rng, *batch)
    return enc, params, batch


def _fake_batch(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    elem_idx = jnp.array(np.random.default_rng(0).integers(1, 119, (B, CFG.max_elements)), jnp.int32)
    elem_frac = jax.random.uniform(k1, (B, CFG.max_elements))
    elem_mask = jnp.ones((B, CFG.max_elements), bool).at[:, 6:].set(False)
    magpie = jax.random.normal(k2, (B, CFG.magpie_dim))
    tc = jax.random.normal(k3, (B,))
    return elem_idx, elem_frac, elem_mask, magpie, tc


@pytest.fixture(scope='module')
def decoder_and_params():
    dec = FormulaDecoder(CFG)
    rng = jax.random.PRNGKey(1)
    z = jax.random.normal(rng, (B, CFG.latent_dim))
    stoich = jax.random.normal(rng, (B, CFG.stoich_input_dim))
    heads_vec = jax.random.normal(rng, (B, CFG.heads_input_dim))
    tokens = jnp.full((B, CFG.max_len), PAD_ID, jnp.int32)
    tokens = tokens.at[:, 0].set(BOS_ID).at[:, 5].set(EOS_ID)
    tokens = tokens.at[:, 1:5].set(
        np.random.default_rng(1).integers(5, 123, (B, 4)))
    params = dec.init(rng, z, tokens, stoich, heads_vec)
    return dec, params, (z, stoich, heads_vec, tokens)


def test_encoder_output_shapes(encoder_and_params):
    enc, params, batch = encoder_and_params
    out = enc.apply(params, *batch)
    assert out['z'].shape == (B, CFG.latent_dim)
    assert out['tc_pred'].shape == (B,)
    assert out['magpie_pred'].shape == (B, CFG.magpie_dim)
    assert out['fraction_pred'].shape == (B, CFG.max_elements)
    assert out['hp_pred'].shape == (B,)
    assert out['sc_pred'].shape == (B,)
    assert out['tc_class_logits'].shape == (B, 5)
    assert out['family_composed_14'].shape == (B, 14)
    assert out['attention_weights'].shape == (B, CFG.max_elements)
    assert np.isfinite(np.asarray(out['z'])).all()
    # composed family probs sum to 1
    np.testing.assert_allclose(
        np.asarray(out['family_composed_14'].sum(-1)), 1.0, atol=1e-5)
    # competence is a probability
    comp = np.asarray(out['competence'])
    assert ((comp >= 0) & (comp <= 1)).all()


def test_heads_vec_assembly(encoder_and_params):
    enc, params, batch = encoder_and_params
    out = enc.apply(params, *batch)
    vec = enc.apply(params, out, method=MaterialsEncoder.heads_pred_for_decoder)
    assert vec.shape == (B, 24)


def test_decoder_tf_shapes(decoder_and_params):
    dec, params, (z, stoich, heads_vec, tokens) = decoder_and_params
    out = dec.apply(params, z, tokens, stoich, heads_vec)
    t = CFG.max_len - 1
    assert out['logits'].shape == (B, t, CFG.vocab_size)
    assert out['stop_logits'].shape == (B, t)
    assert out['type_logits'].shape == (B, t, 5)
    assert out['site_dup_logits'].shape == (B, t)
    assert out['memory'].shape == (B, CFG.n_total_memory_tokens, CFG.d_model)
    assert np.isfinite(np.asarray(out['logits'])).all()


def test_kv_cache_matches_parallel(decoder_and_params):
    """Greedy cached decode logits == TF parallel logits on the same prefix."""
    dec, params, (z, stoich, heads_vec, tokens) = decoder_and_params
    tf_out = dec.apply(params, z, tokens, stoich, heads_vec)

    memory = dec.apply(params, z, stoich, heads_vec,
                       method=FormulaDecoder.build_memory)
    mem_kvs = dec.apply(params, memory, method=FormulaDecoder.memory_kv)
    kc, vc = dec.apply(params, B, method=FormulaDecoder.init_cache)

    # feed the same teacher tokens step by step through the cached path
    step_logits = []
    for pos in range(CFG.max_len - 1):
        heads, kc, vc = dec.apply(
            params, tokens[:, pos], jnp.int32(pos), kc, vc, mem_kvs,
            method=FormulaDecoder.decode_step)
        step_logits.append(heads['logits'])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(tf_out['logits']),
                               rtol=2e-4, atol=2e-4)


def test_generation(decoder_and_params):
    dec, params, (z, stoich, heads_vec, _) = decoder_and_params
    gcfg = GenerationConfig(max_len=CFG.max_len, temperature=0.0)
    out = generate_with_kv_cache(dec, params, z, stoich, heads_vec,
                                 jax.random.PRNGKey(0), gcfg)
    assert out['tokens'].shape == (B, CFG.max_len - 1)
    assert out['mask'].shape == (B, CFG.max_len - 1)
    # greedy is deterministic
    out2 = generate_with_kv_cache(dec, params, z, stoich, heads_vec,
                                  jax.random.PRNGKey(7), gcfg)
    np.testing.assert_array_equal(np.asarray(out['tokens']),
                                  np.asarray(out2['tokens']))


def test_generation_sampled_jits(decoder_and_params):
    dec, params, (z, stoich, heads_vec, _) = decoder_and_params
    gcfg = GenerationConfig(max_len=CFG.max_len, temperature=1.0,
                            top_k=20, top_p=0.9, stop_boost=4.0,
                            hard_stop_threshold=0.8, site_dup_threshold=0.5)
    import superconductor_vae_tpu.tokenizer as T
    masks = jnp.asarray(T.default_tokenizer(max_len=CFG.max_len).type_masks)

    @jax.jit
    def run(rng):
        g = GenerationConfig(max_len=CFG.max_len, temperature=1.0,
                             top_k=20, top_p=0.9, stop_boost=4.0,
                             hard_stop_threshold=0.8, site_dup_threshold=0.5,
                             use_type_masking=True)
        return generate_with_kv_cache(dec, params, z, stoich, heads_vec,
                                      rng, g, type_masks=masks)
    out = run(jax.random.PRNGKey(0))
    toks = np.asarray(out['tokens'])
    assert toks.shape == (B, CFG.max_len - 1)
    assert (toks >= 0).all() and (toks < CFG.vocab_size).all()
    assert np.isfinite(np.asarray(out['log_probs'])).all()
    assert np.isfinite(np.asarray(out['entropy'])).all()


def test_sequence_mask():
    toks = jnp.array([[5, 6, EOS_ID, 9, 9],
                      [5, 6, 7, 8, 9]])
    m = np.asarray(sequence_mask(toks))
    np.testing.assert_array_equal(m[0], [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(m[1], [1, 1, 1, 1, 1])


def test_param_count_full_size():
    """Full-size config lands in the reference's ~108M ballpark
    (reference: docs/COMPUTATIONAL_EFFICIENCY.md:17-19)."""
    from superconductor_vae_tpu.models.config import ModelConfig
    cfg = ModelConfig()
    dec = FormulaDecoder(cfg)
    z = jnp.zeros((1, cfg.latent_dim))
    tokens = jnp.zeros((1, cfg.max_len), jnp.int32)
    stoich = jnp.zeros((1, cfg.stoich_input_dim))
    heads_vec = jnp.zeros((1, cfg.heads_input_dim))
    params = jax.eval_shape(
        lambda: dec.init(jax.random.PRNGKey(0), z, tokens, stoich, heads_vec))
    n_dec = sum(np.prod(x.shape) for x in jax.tree.leaves(params))

    enc = MaterialsEncoder(cfg)
    eb = (jnp.zeros((1, cfg.max_elements), jnp.int32),
          jnp.zeros((1, cfg.max_elements)),
          jnp.zeros((1, cfg.max_elements), bool),
          jnp.zeros((1, cfg.magpie_dim)), jnp.zeros((1,)))
    eparams = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), *eb))
    n_enc = sum(np.prod(x.shape) for x in jax.tree.leaves(eparams))
    total = (n_enc + n_dec) / 1e6
    assert 80 < total < 140, f'total params {total:.1f}M out of range'


def test_predict_tc_mc():
    """MC-dropout Tc: N stochastic decodes -> (mean, std); std is positive
    when dropout is active and zero samples-variance when n=identical keys
    is impossible, so just check shape/finiteness and that dropout actually
    perturbs (reference: attention_vae.py:824-856)."""
    import dataclasses as dc
    from superconductor_vae_tpu.models.config import tiny_test_config
    from superconductor_vae_tpu.models.encoder import (MaterialsEncoder,
                                                       predict_tc_mc)
    cfg = dc.replace(tiny_test_config(), dropout=0.3)
    enc = MaterialsEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    B = 3
    params = enc.init(
        rng, jnp.zeros((B, cfg.max_elements), jnp.int32),
        jnp.zeros((B, cfg.max_elements)), jnp.zeros((B, cfg.max_elements)),
        jnp.zeros((B, cfg.magpie_dim)), jnp.zeros((B,)))
    z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.latent_dim))
    mean, std = predict_tc_mc(enc, params, z, jax.random.PRNGKey(2),
                              n_samples=8)
    assert mean.shape == (B,) and std.shape == (B,)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(std) > 0).all()   # dropout perturbs the decode path


def test_generation_early_exit_token_identical(decoder_and_params):
    """early_exit while_loop == fixed scan, token-for-token up to each
    row's first EOS (dead post-EOS positions are 0 instead of garbage)."""
    import dataclasses as dc
    from superconductor_vae_tpu.generation import sequence_mask
    dec, params, (z, stoich, heads_vec, _) = decoder_and_params
    for kwargs in (dict(temperature=0.0, stop_boost=8.0,
                        hard_stop_threshold=0.5),
                   dict(temperature=1.2, stop_boost=8.0,
                        hard_stop_threshold=0.5)):
        gcfg = GenerationConfig(max_len=CFG.max_len, **kwargs)
        scan = generate_with_kv_cache(dec, params, z, stoich, heads_vec,
                                      jax.random.PRNGKey(3), gcfg)
        ee = generate_with_kv_cache(dec, params, z, stoich, heads_vec,
                                    jax.random.PRNGKey(3),
                                    dc.replace(gcfg, early_exit=True))
        m = np.asarray(sequence_mask(scan['tokens'])).astype(bool)
        np.testing.assert_array_equal(np.asarray(scan['tokens'])[m],
                                      np.asarray(ee['tokens'])[m])
        np.testing.assert_array_equal(np.asarray(scan['mask']),
                                      np.asarray(ee['mask']))
        np.testing.assert_allclose(np.asarray(scan['log_probs'])[m],
                                   np.asarray(ee['log_probs'])[m],
                                   rtol=1e-6, atol=1e-6)
