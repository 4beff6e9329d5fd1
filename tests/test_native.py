"""Native C++ tokenizer/parser: exact parity with the Python implementation
on the REAL dataset, plus a speed sanity check."""

import time

import numpy as np
import pytest

from superconductor_vae_tpu import native
from superconductor_vae_tpu.data import parse_formula_composition
from superconductor_vae_tpu.tokenizer import default_tokenizer
from superconductor_vae_tpu.chem.elements import SYMBOL_TO_Z

REAL_CSV = '/root/reference/data/processed/new_sc_datasets.csv'


@pytest.fixture(scope='module')
def formulas():
    import pandas as pd
    return pd.read_csv(REAL_CSV)['formula'].astype(str).tolist()


@pytest.fixture(scope='module')
def tok():
    return default_tokenizer(max_len=30)


def test_native_builds():
    assert native.build(), 'g++ compile of libsc_native.so failed'
    assert native.available()


def test_tokenize_parity_real_data(formulas, tok):
    got = native.tokenize_batch(formulas, tok)
    assert got is not None
    ref = tok.encode_batch(formulas)
    mismatch = np.where((got != ref).any(axis=1))[0]
    assert len(mismatch) == 0, (
        f'{len(mismatch)} mismatches, first: {formulas[mismatch[0]]!r} '
        f'native={got[mismatch[0]].tolist()} py={ref[mismatch[0]].tolist()}')


def test_tokenize_parity_edge_cases(tok):
    cases = ['', '???', 'Y1Ba2Cu3{18}O7', '{999}O', 'O21', 'Cu(0/0)',
             'La(6/10)Sr(4/10)CuO4', 'CuO' * 60, 'xyzCu', 'H(1019949/100000)']
    got = native.tokenize_batch(cases, tok)
    ref = tok.encode_batch(cases)
    np.testing.assert_array_equal(got, ref)


def test_parse_parity_real_data(formulas, tok):
    out = native.parse_compositions(formulas, tok)
    assert out is not None
    idx, frac, mask = out
    for i, f in enumerate(formulas[:500]):
        comp = parse_formula_composition(f)
        total = sum(comp.values()) or 1.0
        expect = [(SYMBOL_TO_Z[el], amt / total)
                  for el, amt in list(comp.items())[:12]]
        n = int(mask[i].sum())
        assert n == len(expect), f
        for j, (z, fr) in enumerate(expect):
            assert idx[i, j] == z, (f, j)
            assert abs(frac[i, j] - fr) < 1e-6, (f, j)


def test_parse_parity_decimal_formulas(tok):
    """Raw-source decimal subscripts (Ba0.2La1.8CuO4) must parse identically
    in C++ and Python — the native path is preferred by load_dataset, so a
    divergence silently corrupts element_fractions."""
    cases = ['Ba0.2La1.8CuO4', 'La1.85Sr0.15CuO4', 'Y0.6Ca0.4Ba2Cu3O7',
             'Mg0.5B2', 'Fe1.01Se0.99', 'Nb3Sn', 'H.5O', 'C0.125Mo6Se8']
    out = native.parse_compositions(cases, tok)
    assert out is not None
    idx, frac, mask = out
    for i, f in enumerate(cases):
        comp = parse_formula_composition(f)
        total = sum(comp.values()) or 1.0
        expect = [(SYMBOL_TO_Z[el], amt / total)
                  for el, amt in list(comp.items())[:12]]
        n = int(mask[i].sum())
        assert n == len(expect), f
        for j, (z, fr) in enumerate(expect):
            assert idx[i, j] == z, (f, j)
            assert abs(frac[i, j] - fr) < 1e-6, (f, j, frac[i, j], fr)


def test_native_speed(formulas, tok):
    """Native encode should beat Python by a wide margin."""
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        native.tokenize_batch(formulas, tok)
    t_native = (time.perf_counter() - t0) / n_rep
    t0 = time.perf_counter()
    tok.encode_batch(formulas)
    t_py = time.perf_counter() - t0
    speedup = t_py / max(t_native, 1e-9)
    print(f'native {t_native*1e3:.1f}ms vs python {t_py*1e3:.1f}ms '
          f'({speedup:.0f}x)')
    assert speedup > 5
