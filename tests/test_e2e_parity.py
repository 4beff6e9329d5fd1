"""End-to-end reference parity on the shipped sample corpus.

The full-pipeline analogue of tests/test_torch_parity.py (which pins
module-level parity at small dims): instantiate the REFERENCE torch
modules at PRODUCTION dims (108M params; the reference ships no weights,
so seeded random weights stand in), convert with
checkpoint/torch_convert.py, run the reference's shipped 1,810-row sample
corpus (/root/reference/data/processed/new_sc_datasets.csv, 145 native
Magpie columns) through OUR data pipeline, and assert on the same rows:

- encoder outputs (z + every head) match torch,
- teacher-forced decoder logits match torch,
- greedy KV-cache generation agrees formula-for-formula with the
  reference's own generate_with_kv_cache loop
  (reference: models/autoregressive_decoder.py:1321-1557).

Slow (full-size torch on CPU) — a small row subset keeps it CI-runnable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference/src')

import jax.numpy as jnp

from superconductor_vae_tpu.checkpoint.torch_convert import (
    convert_decoder_state, convert_encoder_state,
)
from superconductor_vae_tpu.data import load_dataset
from superconductor_vae_tpu.models import FormulaDecoder, MaterialsEncoder
from superconductor_vae_tpu.models.config import ModelConfig
from superconductor_vae_tpu.tokenizer import default_tokenizer

CSV = '/root/reference/data/processed/new_sc_datasets.csv'
N_ROWS = 48      # TF-parity subset
N_GEN = 12       # greedy-generation subset (torch KV loop is slow on CPU)


@pytest.fixture(scope='module')
def dataset():
    return load_dataset(CSV, max_len=30,
                        tokenizer=default_tokenizer(max_len=30),
                        cache_dir=None, limit=600)


@pytest.fixture(scope='module')
def mcfg(dataset):
    # production dims (2048 / 576x12 / 4752); magpie dim follows the sample
    # corpus's numeric feature columns (145 Magpie + 6 p-norm cols = 151)
    import dataclasses
    return dataclasses.replace(ModelConfig(), magpie_dim=dataset.magpie_dim)


@pytest.fixture(scope='module')
def torch_models(mcfg):
    from superconductor.models.attention_vae import FullMaterialsVAE
    from superconductor.models.autoregressive_decoder import (
        EnhancedTransformerDecoder,
    )
    torch.manual_seed(7)
    enc = FullMaterialsVAE(
        latent_dim=mcfg.latent_dim, fusion_dim=mcfg.fusion_dim,
        magpie_dim=mcfg.magpie_dim,
        encoder_hidden=list(mcfg.encoder_hidden),
        decoder_hidden=list(mcfg.decoder_hidden),
        element_embed_dim=mcfg.element_embed_dim,
        n_attention_heads=mcfg.n_attention_heads,
    ).eval()
    dec = EnhancedTransformerDecoder(
        latent_dim=mcfg.latent_dim, d_model=mcfg.d_model, nhead=mcfg.nhead,
        num_layers=mcfg.num_layers, dim_feedforward=mcfg.dim_feedforward,
        max_len=mcfg.max_len, n_memory_tokens=mcfg.n_memory_tokens,
        use_skip_connection=False, n_stoich_tokens=mcfg.n_stoich_tokens,
        vocab_size=mcfg.vocab_size, stoich_input_dim=mcfg.stoich_input_dim,
        memory_bottleneck_dim=0,
    ).eval()
    return enc, dec


@pytest.fixture(scope='module')
def flax_params(torch_models, mcfg):
    t_enc, t_dec = torch_models
    return (convert_encoder_state(t_enc.state_dict(), mcfg),
            convert_decoder_state(t_dec.state_dict(), mcfg))


def _np_batch(ds, n):
    b = ds.batch(np.arange(n))
    return b


def test_e2e_encoder_and_tf_logits(dataset, torch_models, flax_params, mcfg):
    t_enc, t_dec = torch_models
    enc_params, dec_params = flax_params
    b = _np_batch(dataset, N_ROWS)

    with torch.no_grad():
        ref = t_enc(
            torch.from_numpy(b['element_indices'].astype(np.int64)),
            torch.from_numpy(b['element_fractions']),
            torch.from_numpy(np.asarray(b['element_mask'])),
            torch.from_numpy(b['magpie']),
            torch.from_numpy(b['tc']),
        )

    enc = MaterialsEncoder(mcfg)
    out = enc.apply(
        enc_params, jnp.asarray(b['element_indices'], jnp.int32),
        jnp.asarray(b['element_fractions']),
        jnp.asarray(np.asarray(b['element_mask'])),
        jnp.asarray(b['magpie']), jnp.asarray(b['tc']))

    for key, tol in (('z', 5e-4), ('tc_pred', 1e-3), ('magpie_pred', 1e-3),
                     ('sc_pred', 1e-3), ('fraction_pred', 1e-3),
                     ('family_composed_14', 1e-3)):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref[key].numpy(), atol=tol, rtol=1e-2,
            err_msg=f'encoder head {key} diverges on real corpus rows')

    # teacher-forced decoder logits on the same rows
    from superconductor_vae_tpu.training.train_step import stoich_conditioning
    heads_vec = enc.apply(enc_params, out,
                          method=MaterialsEncoder.heads_pred_for_decoder)
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    stoich = stoich_conditioning(jb)

    t_heads = {
        'tc_pred': ref['tc_pred'], 'sc_pred': ref['sc_pred'],
        'hp_pred': ref['hp_pred'], 'tc_class_logits': ref['tc_class_logits'],
        'competence': ref['competence'],
        'element_count_pred': ref['element_count_pred'],
        'family_composed_14': ref['family_composed_14'],
    }
    with torch.no_grad():
        logits, generated, stop_logits, type_logits, dup_logits = t_dec(
            ref['z'], torch.from_numpy(b['tokens'].astype(np.int64)),
            stoich_pred=torch.from_numpy(np.asarray(stoich)),
            teacher_forcing_ratio=1.0, heads_pred=t_heads)

    dec = FormulaDecoder(mcfg)
    d_out = dec.apply(dec_params, out['z'],
                      jnp.asarray(b['tokens'], jnp.int32), stoich, heads_vec)
    # compare at NON-PAD target positions only: the torch reference applies
    # a tgt_key_padding_mask, so pad-position rows (whose logits are
    # loss-masked in both frameworks and never decoded) legitimately differ
    from superconductor_vae_tpu.tokenizer import PAD_ID
    valid = (b['tokens'][:, 1:] != PAD_ID)           # [B, T-1]
    ours_l = np.asarray(d_out['logits'])[valid]
    ref_l = logits.numpy()[valid]
    np.testing.assert_allclose(ours_l, ref_l, atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(d_out['stop_logits'])[valid],
                               stop_logits.numpy()[valid],
                               atol=5e-3, rtol=1e-2)
    # TF-argmax agreement == greedy parity at teacher-forced inputs
    agree = (ours_l.argmax(-1) == ref_l.argmax(-1)).mean()
    assert agree > 0.99, f'TF argmax agreement {agree:.4f}'


def test_e2e_greedy_generation_parity(dataset, torch_models, flax_params,
                                      mcfg):
    """Greedy KV-cache generation: our lax.while_loop scan vs the
    reference's python KV loop must produce the same token streams from
    the same (z, stoich, heads) on real corpus rows."""
    t_enc, t_dec = torch_models
    enc_params, dec_params = flax_params
    b = _np_batch(dataset, N_GEN)

    enc = MaterialsEncoder(mcfg)
    out = enc.apply(
        enc_params, jnp.asarray(b['element_indices'], jnp.int32),
        jnp.asarray(b['element_fractions']),
        jnp.asarray(np.asarray(b['element_mask'])),
        jnp.asarray(b['magpie']), jnp.asarray(b['tc']))
    heads_vec = enc.apply(enc_params, out,
                          method=MaterialsEncoder.heads_pred_for_decoder)
    from superconductor_vae_tpu.training.train_step import stoich_conditioning
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    stoich = stoich_conditioning(jb)

    with torch.no_grad():
        ref_enc = t_enc(
            torch.from_numpy(b['element_indices'].astype(np.int64)),
            torch.from_numpy(b['element_fractions']),
            torch.from_numpy(np.asarray(b['element_mask'])),
            torch.from_numpy(b['magpie']),
            torch.from_numpy(b['tc']),
        )
        t_heads = {
            'tc_pred': ref_enc['tc_pred'], 'sc_pred': ref_enc['sc_pred'],
            'hp_pred': ref_enc['hp_pred'],
            'tc_class_logits': ref_enc['tc_class_logits'],
            'competence': ref_enc['competence'],
            'element_count_pred': ref_enc['element_count_pred'],
            'family_composed_14': ref_enc['family_composed_14'],
        }
        # temperature=0.001, NOT 0.0: the reference divides logits by
        # temperature BEFORE its <0.01 greedy branch
        # (autoregressive_decoder.py:1484-1507), so exact 0.0 infs the
        # logits; its own callers always pass a small nonzero
        t_out = t_dec.generate_with_kv_cache(
            ref_enc['z'], max_len=mcfg.max_len, temperature=0.001,
            stoich_pred=torch.from_numpy(np.asarray(stoich)),
            heads_pred=t_heads)
        t_tokens = t_out[0].numpy()

    import jax
    from superconductor_vae_tpu.generation import (
        GenerationConfig, generate_with_kv_cache,
    )
    dec = FormulaDecoder(mcfg)
    gcfg = GenerationConfig(max_len=mcfg.max_len, temperature=0.0,
                            stop_boost=0.0, hard_stop_threshold=1.1,
                            use_type_masking=False)
    ours = generate_with_kv_cache(
        dec, dec_params, out['z'], stoich, heads_vec,
        jax.random.PRNGKey(0), gcfg)['tokens']
    ours = np.asarray(ours)

    from superconductor_vae_tpu.tokenizer import EOS_ID

    def pre_eos(row):
        row = list(row)
        return row[:row.index(EOS_ID)] if EOS_ID in row else row

    n_match = 0
    tok_agree = []
    for i in range(N_GEN):
        a, r = pre_eos(ours[i]), pre_eos(t_tokens[i])
        n_match += int(a == r)
        m = min(len(a), len(r))
        if m:
            tok_agree.append(np.mean(np.asarray(a[:m]) == np.asarray(r[:m])))
    # random-weight models emit near-uniform logits where argmax ties are
    # fp-order-sensitive; demand strong but not bit-perfect agreement
    assert np.mean(tok_agree) > 0.95, f'token agreement {np.mean(tok_agree)}'
    assert n_match >= int(0.75 * N_GEN), f'{n_match}/{N_GEN} streams match'
