"""Numerical parity vs the PyTorch reference via checkpoint conversion.

The required integration test (SURVEY.md §4 / BASELINE.json north star):
instantiate the REFERENCE torch modules, convert their state dicts with
checkpoint/torch_convert.py, and assert our Flax forward reproduces the
reference outputs to tolerance on a fixed batch.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference/src')

import jax
import jax.numpy as jnp

from superconductor_vae_tpu.checkpoint.torch_convert import (
    convert_decoder_state, convert_encoder_state, model_config_from_torch,
)
from superconductor_vae_tpu.models import FormulaDecoder, MaterialsEncoder
from superconductor_vae_tpu.models.config import ModelConfig

# small-but-real dims (fast on CPU, exercises every code path)
DIMS = dict(latent_dim=64, fusion_dim=32, magpie_dim=16,
            element_embed_dim=16)
B = 4
VOCAB = 150
MAX_LEN = 12


@pytest.fixture(scope='module')
def torch_models():
    from superconductor.models.attention_vae import FullMaterialsVAE
    from superconductor.models.autoregressive_decoder import (
        EnhancedTransformerDecoder,
    )
    torch.manual_seed(0)
    enc = FullMaterialsVAE(
        latent_dim=DIMS['latent_dim'], fusion_dim=DIMS['fusion_dim'],
        magpie_dim=DIMS['magpie_dim'],
        encoder_hidden=[48, 32], decoder_hidden=[32, 48],
        element_embed_dim=DIMS['element_embed_dim'], n_attention_heads=4,
    ).eval()
    dec = EnhancedTransformerDecoder(
        latent_dim=DIMS['latent_dim'], d_model=32, nhead=4, num_layers=2,
        dim_feedforward=64, max_len=MAX_LEN, n_memory_tokens=4,
        use_skip_connection=False, n_stoich_tokens=2, vocab_size=VOCAB,
        stoich_input_dim=13, memory_bottleneck_dim=0,
    ).eval()
    return enc, dec


@pytest.fixture(scope='module')
def mcfg():
    return ModelConfig(
        latent_dim=64, fusion_dim=32, magpie_dim=16,
        encoder_hidden=(48, 32), decoder_hidden=(32, 48),
        element_embed_dim=16, n_attention_heads=4,
        vocab_size=VOCAB, d_model=32, nhead=4, num_layers=2,
        dim_feedforward=64, max_len=MAX_LEN, n_memory_tokens=4,
        n_stoich_tokens=2, n_heads_tokens=4, memory_bottleneck_dim=0,
    )


@pytest.fixture(scope='module')
def batch():
    rng = np.random.default_rng(0)
    return {
        'element_indices': rng.integers(1, 119, (B, 12)).astype(np.int64),
        'element_fractions': rng.random((B, 12)).astype(np.float32),
        'element_mask': np.concatenate(
            [np.ones((B, 5), bool), np.zeros((B, 7), bool)], axis=1),
        'magpie': rng.standard_normal((B, 16)).astype(np.float32),
        'tc': rng.standard_normal((B,)).astype(np.float32),
        'tokens': rng.integers(5, VOCAB, (B, MAX_LEN)).astype(np.int64),
    }


def test_encoder_parity(torch_models, mcfg, batch):
    t_enc, _ = torch_models
    with torch.no_grad():
        ref = t_enc(
            torch.from_numpy(batch['element_indices']),
            torch.from_numpy(batch['element_fractions']),
            torch.from_numpy(batch['element_mask']),
            torch.from_numpy(batch['magpie']),
            torch.from_numpy(batch['tc']),
        )

    params = convert_encoder_state(t_enc.state_dict(), mcfg)
    enc = MaterialsEncoder(mcfg)
    out = enc.apply(
        params, jnp.asarray(batch['element_indices'], jnp.int32),
        jnp.asarray(batch['element_fractions']),
        jnp.asarray(batch['element_mask']),
        jnp.asarray(batch['magpie']), jnp.asarray(batch['tc']))

    for key, tol in (('z', 2e-5), ('tc_pred', 1e-4), ('magpie_pred', 1e-4),
                     ('hp_pred', 1e-4), ('sc_pred', 1e-4),
                     ('fraction_pred', 1e-4), ('element_count_pred', 1e-4),
                     ('competence', 1e-5), ('tc_class_logits', 1e-4),
                     ('family_composed_14', 1e-5), ('attended_input', 1e-4)):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref[key].numpy(), atol=tol, rtol=1e-3,
            err_msg=key)


def test_decoder_parity(torch_models, mcfg, batch):
    _, t_dec = torch_models
    rng = np.random.default_rng(1)
    z = rng.standard_normal((B, 64)).astype(np.float32)
    stoich = rng.standard_normal((B, 13)).astype(np.float32)
    heads_pred = {
        'tc_pred': rng.standard_normal(B).astype(np.float32),
        'sc_pred': rng.standard_normal(B).astype(np.float32),
        'hp_pred': rng.standard_normal(B).astype(np.float32),
        'tc_class_logits': rng.standard_normal((B, 5)).astype(np.float32),
        'competence': rng.random(B).astype(np.float32),
        'element_count_pred': rng.random(B).astype(np.float32),
        'family_composed_14': rng.random((B, 14)).astype(np.float32),
    }
    with torch.no_grad():
        t_heads = {k: torch.from_numpy(v) for k, v in heads_pred.items()}
        logits, generated, stop_logits, type_logits, dup_logits = t_dec(
            torch.from_numpy(z), torch.from_numpy(batch['tokens']),
            stoich_pred=torch.from_numpy(stoich),
            teacher_forcing_ratio=1.0, heads_pred=t_heads)

    params = convert_decoder_state(t_dec.state_dict(), mcfg)
    dec = FormulaDecoder(mcfg)
    heads_vec = jnp.asarray(np.concatenate([
        heads_pred['tc_pred'][:, None], heads_pred['sc_pred'][:, None],
        heads_pred['hp_pred'][:, None], heads_pred['tc_class_logits'],
        heads_pred['competence'][:, None],
        heads_pred['element_count_pred'][:, None],
        heads_pred['family_composed_14']], axis=1))
    out = dec.apply(params, jnp.asarray(z),
                    jnp.asarray(batch['tokens'], jnp.int32),
                    jnp.asarray(stoich), heads_vec)

    np.testing.assert_allclose(np.asarray(out['logits']), logits.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out['stop_logits']),
                               stop_logits.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out['type_logits']),
                               type_logits.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out['site_dup_logits']),
                               dup_logits.numpy(), atol=2e-4, rtol=1e-3)
    # argmax agreement implies greedy-decode parity at TF inputs
    assert (np.asarray(out['generated']) == generated.numpy()).mean() > 0.99


def test_config_autodetection(torch_models):
    t_enc, t_dec = torch_models
    ckpt = {'encoder_state_dict': t_enc.state_dict(),
            'decoder_state_dict': t_dec.state_dict()}
    cfg = model_config_from_torch(ckpt)
    assert cfg.latent_dim == 64
    assert cfg.d_model == 32
    assert cfg.num_layers == 2
    assert cfg.vocab_size == VOCAB
    assert cfg.dim_feedforward == 64
    assert cfg.fusion_dim == 32
    assert cfg.magpie_dim == 16
