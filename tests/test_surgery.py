"""Model surgery: function-preservation invariants + theory loss routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.models import FormulaDecoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.models.surgery import (
    deepen_decoder, expand_decoder_vocab, expand_vocab_rows,
    isotope_parent_map, widen_dense_pair,
)
from superconductor_vae_tpu.tokenizer import default_tokenizer, BOS_ID, EOS_ID, PAD_ID


def test_widen_dense_pair_preserves_function():
    rng = np.random.default_rng(0)
    k1 = rng.standard_normal((8, 6)).astype(np.float32)
    b1 = rng.standard_normal(6).astype(np.float32)
    k2 = rng.standard_normal((6, 4)).astype(np.float32)
    x = rng.standard_normal((5, 8)).astype(np.float32)

    # linear-linear composition must be exactly preserved (noise=0)
    k1n, b1n, k2n, mapping = widen_dense_pair(k1, b1, k2, 10, rng, noise=0.0)
    before = (x @ k1 + b1) @ k2
    after = (x @ k1n + b1n) @ k2n
    np.testing.assert_allclose(after, before, rtol=1e-5, atol=1e-5)
    assert k1n.shape == (8, 10) and k2n.shape == (10, 4)
    assert (mapping[:6] == np.arange(6)).all()


def test_expand_vocab_rows_with_parents():
    emb = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = expand_vocab_rows(emb, 6, parent_map={4: 1, 5: 2}, init_scale=0.0)
    np.testing.assert_array_equal(out[4], emb[1])
    np.testing.assert_array_equal(out[5], emb[2])
    np.testing.assert_array_equal(out[:4], emb)


def test_isotope_parent_map():
    tok = default_tokenizer(max_len=16)
    pmap = isotope_parent_map(tok)
    assert len(pmap) == 291
    iso_18o = tok.token_id('18O')
    assert pmap[iso_18o] == tok.token_id('O')


class TestDecoderSurgery:
    def _setup(self):
        cfg = tiny_test_config()
        dec = FormulaDecoder(cfg)
        rng = jax.random.PRNGKey(0)
        z = jax.random.normal(rng, (2, cfg.latent_dim))
        stoich = jax.random.normal(rng, (2, cfg.stoich_input_dim))
        hv = jax.random.normal(rng, (2, cfg.heads_input_dim))
        tokens = jnp.full((2, cfg.max_len), PAD_ID, jnp.int32)
        tokens = tokens.at[:, 0].set(BOS_ID).at[:, 1].set(10) \
            .at[:, 2].set(EOS_ID)
        params = dec.init(rng, z, tokens, stoich, hv)
        return cfg, dec, params, (z, tokens, stoich, hv)

    def test_deepen_preserves_function(self):
        import dataclasses
        cfg, dec, params, args = self._setup()
        out_before = dec.apply(params, *args[:2], *args[2:])
        new_params = deepen_decoder(params, 2)
        cfg2 = dataclasses.replace(cfg, num_layers=cfg.num_layers + 2)
        dec2 = FormulaDecoder(cfg2)
        out_after = dec2.apply(new_params, *args[:2], *args[2:])
        np.testing.assert_allclose(
            np.asarray(out_after['logits']), np.asarray(out_before['logits']),
            rtol=1e-5, atol=1e-5)

    def test_vocab_expansion_preserves_old_logits(self):
        import dataclasses
        cfg, dec, params, args = self._setup()
        out_before = dec.apply(params, *args[:2], *args[2:])
        new_v = cfg.vocab_size + 10
        new_params = expand_decoder_vocab(params, new_v)
        cfg2 = dataclasses.replace(cfg, vocab_size=new_v)
        dec2 = FormulaDecoder(cfg2)
        out_after = dec2.apply(new_params, *args[:2], *args[2:])
        np.testing.assert_allclose(
            np.asarray(out_after['logits'][..., :cfg.vocab_size]),
            np.asarray(out_before['logits']), rtol=1e-5, atol=1e-5)
        # new tokens start suppressed
        assert (np.asarray(out_after['logits'][..., cfg.vocab_size:]) < 0).all()


def test_theory_loss_routing():
    from superconductor_vae_tpu.ops.theory import theory_loss
    fam = jnp.asarray([1, 2, 8, 11, 12, 0])
    tc = jnp.asarray([500.0, 200.0, 100.0, 50.0, 50.0, 1000.0])
    e_idx = jnp.zeros((6, 12), jnp.int32)
    e_frac = jnp.zeros((6, 12))
    e_mask = jnp.zeros((6, 12), bool)
    out = theory_loss(tc, fam, e_frac, e_idx, e_mask)
    # every family with an out-of-theory Tc contributes
    assert float(out['bcs']) > 0          # 500K BCS violates Allen-Dynes cap
    assert float(out['cuprate']) > 0      # 200K cuprate above dome
    assert float(out['heavy_fermion']) > 0
    assert float(out['organic']) > 0
    # NOT_SC (fam 0) at 1000K contributes nothing
    ok = theory_loss(jnp.asarray([5.0]), jnp.asarray([1]),
                     e_frac[:1], e_idx[:1], e_mask[:1])
    assert float(ok['total']) == pytest.approx(0.0, abs=1e-6)


def test_expand_decoder_width_exact():
    """Whole-decoder widen (reference: net2net_expansion.py:636-950).
    At an integer widening factor the expansion must be EXACTLY
    function-preserving — through LayerNorm statistics, the attention
    score scale, and the positional table (widened_config pins pos_dim so
    the wide model keeps a channel-duplicated copy of the original
    sinusoidal table instead of recomputing O(1)-magnitude sinusoids at
    the new width, which would re-randomize the stream)."""
    import jax
    import jax.numpy as jnp
    from superconductor_vae_tpu.models import FormulaDecoder
    from superconductor_vae_tpu.models.config import tiny_test_config
    from superconductor_vae_tpu.models.surgery import (
        expand_decoder_width, widened_config)

    cfg = tiny_test_config()
    dec = FormulaDecoder(cfg)
    rng = jax.random.PRNGKey(0)
    B = 3
    z = jax.random.normal(rng, (B, cfg.latent_dim))
    st = jax.random.normal(jax.random.fold_in(rng, 1),
                           (B, cfg.stoich_input_dim))
    hv = jax.random.normal(jax.random.fold_in(rng, 2),
                           (B, cfg.heads_input_dim))
    toks = jax.random.randint(jax.random.fold_in(rng, 3),
                              (B, cfg.max_len), 4, 200)
    params = dec.init(rng, z, toks, st, hv)
    ref = dec.apply(params, z, toks, st, hv)

    cfg2 = widened_config(cfg, 64, 128)
    assert cfg2.pos_dim == cfg.d_model
    params2 = expand_decoder_width(params, cfg, 64, 128)
    dec2 = FormulaDecoder(cfg2)
    # shape check against a fresh init of the wide config
    fresh = jax.eval_shape(lambda r: dec2.init(r, z, toks, st, hv), rng)
    jax.tree.map(lambda a, b: None if a.shape == jnp.shape(b) else
                 (_ for _ in ()).throw(AssertionError((a.shape, jnp.shape(b)))),
                 fresh, params2)
    out = dec2.apply(params2, z, toks, st, hv)
    np.testing.assert_allclose(np.asarray(out['logits']),
                               np.asarray(ref['logits']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['stop_logits']),
                               np.asarray(ref['stop_logits']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['type_logits']),
                               np.asarray(ref['type_logits']), atol=1e-4)


def test_expand_decoder_width_rejects_noninteger_ratio():
    """Uneven duplication changes LayerNorm statistics and destroys the
    function (0% argmax agreement measured at 1.5x), so non-integer
    widening factors must raise instead of silently corrupting."""
    import jax
    from superconductor_vae_tpu.models import FormulaDecoder
    from superconductor_vae_tpu.models.config import tiny_test_config
    from superconductor_vae_tpu.models.surgery import expand_decoder_width

    cfg = tiny_test_config()
    dec = FormulaDecoder(cfg)
    rng = jax.random.PRNGKey(4)
    z = jax.random.normal(rng, (2, cfg.latent_dim))
    st = jnp.zeros((2, cfg.stoich_input_dim))
    hv = jnp.zeros((2, cfg.heads_input_dim))
    toks = jax.random.randint(rng, (2, cfg.max_len), 4, 200)
    params = dec.init(rng, z, toks, st, hv)
    with pytest.raises(ValueError, match='integer widening'):
        expand_decoder_width(params, cfg, 48, 96)


def test_expand_decoder_width_chains():
    """Two successive 2x widenings compose exactly: pos_dim stays pinned
    to the original width and the uniform duplication maps compose."""
    import jax
    from superconductor_vae_tpu.models import FormulaDecoder
    from superconductor_vae_tpu.models.config import tiny_test_config
    from superconductor_vae_tpu.models.surgery import (
        expand_decoder_width, widened_config)

    cfg = tiny_test_config()
    dec = FormulaDecoder(cfg)
    rng = jax.random.PRNGKey(11)
    B = 2
    z = jax.random.normal(rng, (B, cfg.latent_dim))
    st = jnp.zeros((B, cfg.stoich_input_dim))
    hv = jnp.zeros((B, cfg.heads_input_dim))
    toks = jax.random.randint(rng, (B, cfg.max_len), 4, 200)
    params = dec.init(rng, z, toks, st, hv)
    ref = dec.apply(params, z, toks, st, hv)

    cfg2 = widened_config(cfg, 64, 128)
    params2 = expand_decoder_width(params, cfg, 64, 128)
    cfg3 = widened_config(cfg2, 128, 256)
    assert cfg3.pos_dim == cfg.d_model
    params3 = expand_decoder_width(params2, cfg2, 128, 256)
    out = FormulaDecoder(cfg3).apply(params3, z, toks, st, hv)
    np.testing.assert_allclose(np.asarray(out['logits']),
                               np.asarray(ref['logits']), atol=2e-4)


def test_expand_encoder_widths_exact():
    """Whole-encoder widen (reference: net2net_expansion.py:954-1368).
    Every fixed-dim output (z and all head predictions) must be exactly
    preserved; the width-carrying attended_input becomes its own channel
    duplication."""
    import jax
    from superconductor_vae_tpu.models.encoder import MaterialsEncoder
    from superconductor_vae_tpu.models.config import tiny_test_config
    from superconductor_vae_tpu.models.surgery import (
        expand_encoder_widths, widened_encoder_config)

    cfg = tiny_test_config()
    enc = MaterialsEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    B = 3
    ei = jax.random.randint(rng, (B, cfg.max_elements), 0, cfg.n_elements)
    ef = jax.nn.softmax(jax.random.normal(
        jax.random.fold_in(rng, 1), (B, cfg.max_elements)))
    em = jnp.ones((B, cfg.max_elements), bool)
    mg = jax.random.normal(jax.random.fold_in(rng, 2), (B, cfg.magpie_dim))
    tc = jax.random.normal(jax.random.fold_in(rng, 3), (B,))
    params = enc.init(rng, ei, ef, em, mg, tc)
    ref = enc.apply(params, ei, ef, em, mg, tc)

    cfg2 = widened_encoder_config(cfg, 64, (96, 64), (64, 96))
    params2 = expand_encoder_widths(params, cfg, 64, (96, 64), (64, 96))
    enc2 = MaterialsEncoder(cfg2)
    fresh = jax.eval_shape(lambda r: enc2.init(r, ei, ef, em, mg, tc), rng)
    jax.tree.map(lambda a, b: None if a.shape == jnp.shape(b) else
                 (_ for _ in ()).throw(AssertionError((a.shape, jnp.shape(b)))),
                 fresh, params2)
    out = enc2.apply(params2, ei, ef, em, mg, tc)
    for k in ('z', 'tc_pred', 'sc_pred', 'fraction_pred',
              'element_count_pred', 'hp_pred', 'competence',
              'tc_class_logits', 'magpie_pred', 'family_composed_14',
              'family_coarse_logits'):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-4, err_msg=k)
    att = np.asarray(ref['attended_input'])
    att2 = np.asarray(out['attended_input'])
    m = np.sort(np.tile(np.arange(att.shape[-1]), 2))
    np.testing.assert_allclose(att2, att[..., m], atol=2e-4)


def test_expand_encoder_widths_rejects_bad_factors():
    from superconductor_vae_tpu.models.surgery import expand_encoder_widths
    from superconductor_vae_tpu.models.config import tiny_test_config
    cfg = tiny_test_config()
    with pytest.raises(ValueError, match='integer widening'):
        expand_encoder_widths({'params': {}}, cfg, 48, (96, 64), (64, 96))
