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


class TestFeaturize:
    def test_formula_features_shape_and_values(self):
        from superconductor_vae_tpu.chem import (FEATURE_NAMES, N_FEATURES,
                                                 formula_features)
        f = formula_features('YBa2Cu3O7')
        assert f.shape == (N_FEATURES,) == (len(FEATURE_NAMES),)
        assert np.all(np.isfinite(f))
        # n_elements coordinate
        assert f[FEATURE_NAMES.index('n_elements')] == 4
        # fraction entropy positive for a multi-element compound
        assert f[FEATURE_NAMES.index('frac_entropy')] > 0
        # mean electronegativity between min and max
        en_mean = f[FEATURE_NAMES.index('magpie_electronegativity_mean')]
        en_min = f[FEATURE_NAMES.index('magpie_electronegativity_min')]
        en_max = f[FEATURE_NAMES.index('magpie_electronegativity_max')]
        assert en_min <= en_mean <= en_max

    def test_unknown_composition_returns_zeros(self):
        from superconductor_vae_tpu.chem import (N_FEATURES,
                                                 composition_features)
        f = composition_features({})
        assert f.shape == (N_FEATURES,)
        assert np.all(f == 0)

    def test_single_element_zero_deviation(self):
        from superconductor_vae_tpu.chem import (FEATURE_NAMES,
                                                 formula_features)
        f = formula_features('Nb')
        for name in FEATURE_NAMES:
            if name.endswith('_avg_dev') or name.endswith('_range'):
                assert f[FEATURE_NAMES.index(name)] == 0, name


def test_encode_isotope_composition():
    """Isotope-aware per-formula aggregation
    (reference: encoders/isotope_encoder.py:227-420)."""
    from superconductor_vae_tpu.chem.isotopes import (
        encode_isotope_composition)

    # natural formula: zero deviation, zero isotope effect
    nat = encode_isotope_composition('YBa2Cu3O7')
    assert list(nat['symbols']) == ['Y', 'Ba', 'Cu', 'O']
    np.testing.assert_allclose(nat['element_fractions'].sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(nat['isotope_features'][3], 0.0, atol=1e-7)
    np.testing.assert_allclose(nat['mass_deviations'], 0.0, atol=1e-7)

    # 18O substitution: heavier than natural O (~16) -> positive deviation,
    # NEGATIVE isotope-effect feature (heavier -> lower Tc under BCS)
    iso = encode_isotope_composition('YBa2Cu3{18}O7')
    o = list(iso['symbols']).index('O')
    assert iso['element_masses'][o] == 18.0
    assert iso['mass_deviations'][o] > 0.05
    assert iso['isotope_features'][3] < 0.0
    assert iso['total_mass'] > nat['total_mass']

    # bare-prefix notation parses when unambiguous (leading position);
    # after an integer amount it is inherently ambiguous ('Cu318O') and
    # the {mass}El tokenizer notation must be used instead
    iso2 = encode_isotope_composition('18O2')
    assert iso2['element_masses'][0] == 18.0
    assert iso2['isotope_features'][3] < 0.0

    # weighted spin: 63Cu has spin 3/2
    cu = encode_isotope_composition('{63}Cu')
    np.testing.assert_allclose(cu['isotope_features'][1], 1.5, rtol=1e-6)
