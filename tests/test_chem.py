import numpy as np

from superconductor_vae_tpu.chem import (
    ELEMENT_SYMBOLS, SYMBOL_TO_Z, N_ELEMENTS,
    element_property_matrix, get_atomic_number, get_oxidation_states,
    primary_oxidation_state_table, ISOTOPES, isotope_feature_matrix,
    estimate_isotope_effect,
)


def test_symbols():
    assert len(ELEMENT_SYMBOLS) == N_ELEMENTS + 1
    assert get_atomic_number('Cu') == 29
    assert get_atomic_number('O') == 8
    assert get_atomic_number('Og') == 118
    assert SYMBOL_TO_Z['Y'] == 39


def test_property_matrix():
    raw = element_property_matrix(normalize=False)
    assert raw.shape == (119, 11)
    assert (raw[0] == 0).all()  # padding row
    # every real element has mass > 0
    assert (raw[1:, -1] > 0).all()
    # electronegativity spot checks
    names = ('electronegativity',)
    assert abs(raw[SYMBOL_TO_Z['F'], 0] - 3.98) < 1e-3
    assert abs(raw[SYMBOL_TO_Z['Cs'], 0] - 0.79) < 1e-3
    norm = element_property_matrix(normalize=True)
    assert abs(norm[1:].mean()) < 0.1


def test_oxidation():
    assert get_oxidation_states('Cu') == [1, 2, 3]
    table = primary_oxidation_state_table()
    assert table[SYMBOL_TO_Z['O']] == -2.0
    assert table[SYMBOL_TO_Z['Ba']] == 2.0
    assert table[SYMBOL_TO_Z['Y']] == 3.0


def test_isotopes():
    assert len(ISOTOPES) == 291
    feats = isotope_feature_matrix()
    assert feats.shape == (291, 4)
    # 18O is heavier than natural O -> Tc suppressed (effect < 1)
    assert estimate_isotope_effect('18O') < 1.0
    assert estimate_isotope_effect('16O') > 0.99
