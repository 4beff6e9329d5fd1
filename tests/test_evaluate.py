"""Tests for the batched AR evaluator: vectorized exact match semantics and
the double-buffered (async-dispatch) eval loop."""

import dataclasses

import jax
import numpy as np
import pytest

from superconductor_vae_tpu.data import synthetic_dataset
from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.tokenizer import default_tokenizer, EOS_ID, PAD_ID
from superconductor_vae_tpu.training import TrainConfig
from superconductor_vae_tpu.training.evaluate import (
    _exact_match, evaluate_autoregressive,
)
from superconductor_vae_tpu.training.train_step import build_luts


def _loop_exact_match(generated, targets):
    """The historical per-row implementation, kept as the semantics oracle."""
    b, t = targets.shape
    out = np.zeros(b, bool)
    for i in range(b):
        tgt = targets[i]
        end = np.where(tgt == EOS_ID)[0]
        end = int(end[0]) if len(end) else t
        g = (generated[i][:end + 1] if generated.shape[1] > end
             else generated[i])
        out[i] = (len(g) >= end + 1) and (g[:end + 1] == tgt[:end + 1]).all()
    return out


class TestExactMatch:
    def test_matches_loop_semantics_random(self):
        rng = np.random.default_rng(0)
        for trial in range(20):
            b, t = 8, 12
            targets = rng.integers(0, 6, (b, t))
            # plant EOS at random positions in most rows, none in some
            for i in range(b):
                if rng.random() < 0.8:
                    targets[i, rng.integers(0, t)] = EOS_ID
            targets[targets == EOS_ID] = EOS_ID
            generated = targets.copy()
            # corrupt half the rows at a random position
            for i in range(0, b, 2):
                generated[i, rng.integers(0, t)] += 1
            np.testing.assert_array_equal(
                _exact_match(generated, targets),
                _loop_exact_match(generated, targets))

    def test_mismatch_after_eos_ignored(self):
        t = 6
        targets = np.array([[3, 4, EOS_ID, PAD_ID, PAD_ID, PAD_ID]])
        generated = np.array([[3, 4, EOS_ID, 9, 9, 9]])
        assert _exact_match(generated, targets)[0]

    def test_no_eos_target_never_exact(self):
        targets = np.array([[3, 4, 5, 6]])
        generated = targets.copy()
        assert not _exact_match(generated, targets)[0]
        assert not _loop_exact_match(generated, targets)[0]

    def test_narrow_generated_padded(self):
        targets = np.array([[3, 4, EOS_ID, PAD_ID]])
        generated = np.array([[3, 4]])  # narrower than target: EOS missing
        assert not _exact_match(generated, targets)[0]


class TestEvaluatorLoop:
    def test_double_buffered_eval_runs_and_counts(self):
        """End-to-end double-buffered eval on the tiny config: covers the
        async dispatch path, padding of the ragged final batch, and result
        bookkeeping (n_evaluated, per-sample index alignment)."""
        mcfg = tiny_test_config()
        ds = synthetic_dataset(n=10, max_len=mcfg.max_len,
                               magpie_dim=mcfg.magpie_dim)
        tcfg = TrainConfig(max_formula_len=mcfg.max_len)
        tokenizer = default_tokenizer(max_len=mcfg.max_len)
        luts = build_luts(tokenizer)
        encoder = MaterialsEncoder(mcfg)
        decoder = FormulaDecoder(mcfg)
        rng = jax.random.PRNGKey(0)
        import jax.numpy as jnp
        b0 = {k: jnp.asarray(v) for k, v in ds.batch(np.arange(4)).items()}
        enc_params = encoder.init(rng, b0['element_indices'],
                                  b0['element_fractions'], b0['element_mask'],
                                  b0['magpie'], b0['tc'])
        from superconductor_vae_tpu.training.train_step import (
            stoich_conditioning,
        )
        dec_params = decoder.init(
            rng, jnp.zeros((4, mcfg.latent_dim)), b0['tokens'],
            jnp.zeros((4, mcfg.stoich_input_dim)),
            jnp.zeros((4, mcfg.heads_input_dim)))
        out = evaluate_autoregressive(
            encoder, decoder, enc_params, dec_params, ds, tcfg, luts,
            tokenizer=tokenizer, batch_size=4)  # 10 rows -> 3 batches, ragged
        assert out['n_evaluated'] == 10
        assert len(out['per_sample_ar_exact']) == 10
        np.testing.assert_array_equal(out['sample_indices'], np.arange(10))
        assert 0.0 <= out['ar_exact'] <= 1.0
