"""Tokenizer tests: vocab layout parity, round-trip invariants, LUT exports.

Round-trip corpus mirrors the reference's embedded verifiers
(reference: models/autoregressive_decoder.py:420-491).
"""

import numpy as np
import pytest

from superconductor_vae_tpu.tokenizer import (
    FractionAwareTokenizer, default_tokenizer,
    PAD_ID, BOS_ID, EOS_ID, UNK_ID, FRAC_UNK_ID,
    ELEMENT_TOKEN_START, INTEGER_TOKEN_START, FRACTION_TOKEN_START,
    TOKEN_TYPE_ELEMENT, TOKEN_TYPE_INTEGER, TOKEN_TYPE_FRACTION,
    TOKEN_TYPE_SPECIAL, TOKEN_TYPE_EOS,
)

ROUND_TRIP_FORMULAS = [
    'YBa2Cu3O7',
    'La(17/20)Sr(3/20)CuO4',
    'MgB2',
    'Nb3Sn',
    'Ba(3/5)CuOY(2/5)',
    'Hg1Ba2Ca2Cu3O8',
    'Fe1Se1',
    'H3S1',
    'Bi2Sr2CaCu2O8',
    'K(2/5)Ba(3/5)Fe2As2',
]


def test_vocab_layout(tokenizer):
    # 5 special + 118 elements + 20 integers + 4317 fractions + ISO_UNK + 291 iso
    assert tokenizer.vocab_size == 4752
    assert tokenizer.n_fraction_tokens == 4317
    assert tokenizer.n_isotope_tokens == 291
    assert tokenizer.fraction_token_start == 143
    assert tokenizer.iso_unk_id == 143 + 4317
    assert tokenizer.isotope_token_start == 143 + 4317 + 1
    # spot-check known IDs: H=5, Og=122, "1"=123, "20"=142
    assert tokenizer.token_id('H') == 5
    assert tokenizer.token_id('Og') == 122
    assert tokenizer.token_id('1') == 123
    assert tokenizer.token_id('20') == 142
    # first fraction in shipped vocab is 1/2
    assert tokenizer.token_name(143) == 'FRAC:1/2'
    assert tokenizer.token_name(tokenizer.isotope_token_start) == 'ISO:1H'


@pytest.mark.parametrize('formula', ROUND_TRIP_FORMULAS)
def test_round_trip(tokenizer, formula):
    ids = tokenizer.encode(formula)
    assert len(ids) == tokenizer.max_len
    assert ids[0] == BOS_ID and EOS_ID in ids
    assert tokenizer.decode(ids) == formula


def test_gcd_canonicalization(tokenizer):
    a = tokenizer.encode('La(6/10)Sr(4/10)CuO4', add_bos_eos=False, pad=False)
    b = tokenizer.encode('La(3/5)Sr(2/5)CuO4', add_bos_eos=False, pad=False)
    assert a == b


def test_isotope_encoding(tokenizer):
    ids = tokenizer.encode('Y1Ba2Cu3{18}O7', add_bos_eos=False, pad=False)
    assert any(tokenizer.is_isotope_token(t) for t in ids)
    assert tokenizer.decode(ids) == 'Y1Ba2Cu3{18}O7'
    # unknown isotope -> ISO_UNK
    ids2 = tokenizer.encode('{999}O', add_bos_eos=False, pad=False)
    assert ids2 == [tokenizer.iso_unk_id]


def test_unknowns(tokenizer):
    # integer > 20 -> UNK; unknown fraction -> FRAC_UNK
    assert tokenizer.encode('O21', add_bos_eos=False, pad=False)[-1] == UNK_ID
    ids = tokenizer.encode('O(1019948/99999)', add_bos_eos=False, pad=False)
    assert ids == [tokenizer.token_id('O'), FRAC_UNK_ID]


def test_truncation(tokenizer):
    long_formula = 'CuO' * 60
    ids = tokenizer.encode(long_formula)
    assert len(ids) == tokenizer.max_len
    assert ids[-1] == EOS_ID


def test_type_luts(tokenizer):
    t = tokenizer.token_type_table
    assert t[PAD_ID] == TOKEN_TYPE_SPECIAL
    assert t[EOS_ID] == TOKEN_TYPE_EOS
    assert t[ELEMENT_TOKEN_START] == TOKEN_TYPE_ELEMENT
    assert t[INTEGER_TOKEN_START] == TOKEN_TYPE_INTEGER
    assert t[FRACTION_TOKEN_START] == TOKEN_TYPE_FRACTION
    assert t[tokenizer.iso_unk_id] == TOKEN_TYPE_SPECIAL
    assert t[tokenizer.isotope_token_start] == TOKEN_TYPE_SPECIAL
    # masks partition the vocab
    assert tokenizer.type_masks.sum() == tokenizer.vocab_size
    assert (tokenizer.type_masks.sum(axis=0) == 1).all()


def test_value_luts(tokenizer):
    v = tokenizer.fraction_value_table
    assert v[143] == pytest.approx(0.5)  # FRAC:1/2
    assert v[tokenizer.token_id('Cu')] == 0.0
    qty = tokenizer.token_value_table
    assert qty[tokenizer.token_id('7')] == 7.0
    z = tokenizer.token_to_element_z
    assert z[tokenizer.token_id('Cu')] == 29
    assert z[tokenizer.token_id('O')] == 8
    # isotope maps to parent element Z
    iso_18o = tokenizer.token_id('18O')
    assert tokenizer.is_isotope_token(iso_18o)
    assert z[iso_18o] == 8


def test_save_load(tokenizer, tmp_path):
    path = tmp_path / 'tok.json'
    tokenizer.save(path)
    loaded = FractionAwareTokenizer.load(path)
    assert loaded.vocab_size == tokenizer.vocab_size
    f = 'La(17/20)Sr(3/20)CuO4'
    assert loaded.encode(f) == tokenizer.encode(f)


def test_type_targets_vectorized(tokenizer):
    ids = np.array(tokenizer.encode('YBa2Cu3O7'))
    types = tokenizer.token_type_targets(ids)
    assert types[0] == TOKEN_TYPE_SPECIAL  # BOS
    assert types[1] == TOKEN_TYPE_ELEMENT  # Y
    assert types[2] == TOKEN_TYPE_ELEMENT  # Ba
    assert types[3] == TOKEN_TYPE_INTEGER  # 2
