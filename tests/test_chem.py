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
