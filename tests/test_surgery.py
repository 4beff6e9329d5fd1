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
