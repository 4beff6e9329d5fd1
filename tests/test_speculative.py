"""Speculative decoding: exact equivalence with plain greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.generation import GenerationConfig, generate_with_kv_cache
from superconductor_vae_tpu.generation.speculative import speculative_generate
from superconductor_vae_tpu.models import FormulaDecoder
from superconductor_vae_tpu.models.config import tiny_test_config
from superconductor_vae_tpu.models.draft import build_bigram_draft, load_draft, save_draft
from superconductor_vae_tpu.tokenizer import default_tokenizer, EOS_ID

CFG = tiny_test_config()
B = 4


@pytest.fixture(scope='module')
def setup():
    dec = FormulaDecoder(CFG)
    rng = jax.random.PRNGKey(3)
    z = jax.random.normal(rng, (B, CFG.latent_dim))
    stoich = jax.random.normal(rng, (B, CFG.stoich_input_dim))
    hv = jax.random.normal(rng, (B, CFG.heads_input_dim))
    tokens = jnp.zeros((B, CFG.max_len), jnp.int32)
    params = dec.init(rng, z, tokens, stoich, hv)
    return dec, params, z, stoich, hv


def test_bigram_draft_build():
    tok = default_tokenizer(max_len=16)
    tokens = tok.encode_batch(['YBa2Cu3O7', 'YBa2Cu4O8', 'YBa2Cu3O6'])
    table = build_bigram_draft(tokens, tok)
    # after Ba the corpus always has "2"
    assert table[tok.token_id('Ba')] == tok.token_id('2')
    # after Y always Ba
    assert table[tok.token_id('Y')] == tok.token_id('Ba')
    # grammar: integer cannot follow integer even if corpus said so
    assert table.shape == (tok.vocab_size,)


def test_draft_save_load(tmp_path):
    tok = default_tokenizer(max_len=16)
    tokens = tok.encode_batch(['MgB2'])
    table = build_bigram_draft(tokens, tok)
    save_draft(tmp_path / 'draft.npz', table)
    loaded = load_draft(tmp_path / 'draft.npz')
    np.testing.assert_array_equal(loaded, table)
    assert load_draft(tmp_path / 'missing.npz') is None


def test_chunk_forward_matches_parallel(setup):
    """decode_chunk (speculative verification) must reproduce the parallel
    TF forward on the same token stream."""
    from superconductor_vae_tpu.models.decoder import FormulaDecoder as FD
    dec, params, z, stoich, hv = setup
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(5, 123, (B, CFG.max_len)), jnp.int32)
    tf_out = dec.apply(params, z, tokens, stoich, hv)

    memory = dec.apply(params, z, stoich, hv, method=FD.build_memory)
    mem_kvs = dec.apply(params, memory, method=FD.memory_kv)
    kc, vc = dec.apply(params, B, method=FD.init_cache)
    k = 5
    chunks = []
    for pos in range(0, CFG.max_len - 1, k):
        width = min(k, CFG.max_len - 1 - pos)
        chunk = tokens[:, pos:pos + k]
        if chunk.shape[1] < k:
            chunk = jnp.pad(chunk, ((0, 0), (0, k - chunk.shape[1])))
        heads, kc, vc = dec.apply(params, chunk, jnp.int32(pos), kc, vc,
                                  mem_kvs, method=FD.decode_chunk)
        chunks.append(np.asarray(heads['logits'])[:, :width])
    got = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(got, np.asarray(tf_out['logits']),
                               rtol=3e-4, atol=3e-4)


def _assert_greedy_equivalent(dec, params, z, stoich, hv, got, ref):
    """Sequences must agree except where the TF logits are numerically tied
    (argmax tie-flips from differing reduction order are legitimate)."""
    mism = np.where(got != ref)
    if len(mism[0]) == 0:
        return
    # evaluate TF logits on the reference stream and check tie-ness
    toks = jnp.concatenate(
        [jnp.ones((ref.shape[0], 1), jnp.int32), jnp.asarray(ref)], axis=1)
    logits = np.asarray(dec.apply(params, z, toks, stoich, hv)['logits'])
    assert len(mism[0]) <= 0.15 * got.size, 'too many mismatches for ties'
    for b, t in zip(*mism):
        a, c = ref[b, t], got[b, t]
        if a == 0 or c == 0:
            continue  # past-EOS padding differences
        gap = abs(float(logits[b, t, a]) - float(logits[b, t, c]))
        assert gap < 1e-2, f'non-tie divergence at ({b},{t}): gap={gap}'


def test_speculative_equals_greedy(setup):
    """Speculative output must match plain greedy (no gates) up to argmax
    ties, for both a garbage and a self-consistent draft table."""
    dec, params, z, stoich, hv = setup
    gcfg = GenerationConfig(max_len=CFG.max_len, temperature=0.0)
    ref = generate_with_kv_cache(dec, params, z, stoich, hv,
                                 jax.random.PRNGKey(0), gcfg)
    ref_tokens = np.asarray(ref['tokens'])
    ref_masked = ref_tokens * np.asarray(ref['mask']).astype(np.int32)

    v = CFG.vocab_size
    # garbage draft: constant token — acceptance ~0, output still greedy
    garbage = jnp.full((v,), 7, jnp.int32)
    out = jax.jit(lambda p: speculative_generate(
        dec, p, z, stoich, hv, garbage, k=3))(params)
    got = np.asarray(out['tokens']) * np.asarray(out['mask']).astype(np.int32)
    _assert_greedy_equivalent(dec, params, z, stoich, hv, got, ref_masked)

    # self-consistent draft built from the model's own greedy bigrams
    tok_stream = np.concatenate(
        [np.full((B, 1), 1, np.int64), ref_tokens.astype(np.int64)], axis=1)
    tokenizer = default_tokenizer(max_len=CFG.max_len)
    table = build_bigram_draft(tok_stream, tokenizer,
                               grammar_constrained=False)
    out2 = jax.jit(lambda p: speculative_generate(
        dec, p, z, stoich, hv, jnp.asarray(table), k=3))(params)
    got2 = np.asarray(out2['tokens']) * np.asarray(out2['mask']).astype(np.int32)
    _assert_greedy_equivalent(dec, params, z, stoich, hv, got2, ref_masked)
    # the self-consistent draft should get accepted at a decent rate
    assert float(out2['acceptance_rate']) >= float(out['acceptance_rate'])


def test_ngram_draft_build():
    """Trigram context must disambiguate successors the bigram collapses."""
    from superconductor_vae_tpu.models.draft import build_ngram_draft
    tok = default_tokenizer(max_len=16)
    # after "Cu3" -> O7, after "Cu4" -> O8; bigram on Cu alone can't separate
    corpus = ['YBa2Cu3O7'] * 3 + ['LaBa2Cu4O8'] * 3
    tokens = tok.encode_batch(corpus)
    d = build_ngram_draft(tokens, tok)
    assert d['trigram'].shape == (tok.vocab_size, tok.vocab_size)
    assert d['trigram'].dtype == np.int16
    cu, o = tok.token_id('Cu'), tok.token_id('O')
    t3, t4 = tok.token_id('3'), tok.token_id('4')
    assert int(d['trigram'][cu, t3]) == o
    assert int(d['trigram'][cu, t4]) == o
    # unseen context backs off
    assert int(d['trigram'][o, o]) == -1


def test_ngram_draft_save_load(tmp_path):
    from superconductor_vae_tpu.models.draft import build_ngram_draft
    tok = default_tokenizer(max_len=16)
    d = build_ngram_draft(tok.encode_batch(['MgB2', 'YBa2Cu3O7']), tok)
    save_draft(tmp_path / 'ng.npz', d)
    loaded = load_draft(tmp_path / 'ng.npz')
    np.testing.assert_array_equal(loaded['bigram'], d['bigram'])
    np.testing.assert_array_equal(loaded['trigram'], d['trigram'])


def test_speculative_perrow_early_exit(setup):
    """With a self-consistent n-gram draft, the while_loop must finish in
    fewer iterations than the token count (per-row advance actually
    advances), and still match greedy."""
    from superconductor_vae_tpu.models.draft import build_ngram_draft
    dec, params, z, stoich, hv = setup
    gcfg = GenerationConfig(max_len=CFG.max_len, temperature=0.0)
    ref = generate_with_kv_cache(dec, params, z, stoich, hv,
                                 jax.random.PRNGKey(0), gcfg)
    ref_tokens = np.asarray(ref['tokens'])
    ref_masked = ref_tokens * np.asarray(ref['mask']).astype(np.int32)

    tok_stream = np.concatenate(
        [np.full((B, 1), 1, np.int64), ref_tokens.astype(np.int64)], axis=1)
    tokenizer = default_tokenizer(max_len=CFG.max_len)
    d = build_ngram_draft(tok_stream, tokenizer, grammar_constrained=False)
    out = jax.jit(lambda p: speculative_generate(
        dec, p, z, stoich, hv,
        {'bigram': jnp.asarray(d['bigram']),
         'trigram': jnp.asarray(d['trigram'])}, k=3))(params)
    got = np.asarray(out['tokens']) * np.asarray(out['mask']).astype(np.int32)
    _assert_greedy_equivalent(dec, params, z, stoich, hv, got, ref_masked)
    steps = CFG.max_len - 1
    assert int(out['n_iterations']) < steps
    assert float(out['acceptance_rate']) > 0.3
