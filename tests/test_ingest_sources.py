"""Source-specific ingestion readers (data/ingest_sources.py).

Reference behaviors under test: NEMAD Tc free-text parsing + formula
cleaning (reference: scripts/ingest_nemad.py:93-346), retraction /
contamination filters and the per-source readers of the multi-source
merger (reference: scripts/ingest_new_datasets.py), conflict-resolving
composition-level merge with holdout exclusion.
"""

import numpy as np
import pandas as pd
import pytest

from superconductor_vae_tpu.data.ingest_sources import (
    canonical_key, clean_formula_text, is_retracted_or_contaminated,
    manual_hydrides, merge_sources, parse_tc_text, read_mdr, read_nemad,
    read_sodnet, read_supercon2, read_threedsc,
)


class TestParseTcText:
    @pytest.mark.parametrize('text,expected', [
        ('93 K', 93.0), ('93K', 93.0), ('~39 K', 39.0), ('4.2', 4.2),
        ('92 ± 1 K', 92.0), ('1.5 ± 0.2', 1.5),
        ('88-92 K', 90.0), ('88–92 K', 90.0), ('10-20', 15.0),
        ('∼23 K', 23.0), ('≈7.7K', 7.7),
    ])
    def test_parses(self, text, expected):
        assert parse_tc_text(text) == pytest.approx(expected)

    @pytest.mark.parametrize('text', [
        None, '', 'NSC', 'n/a', '-', 'not superconducting',
        'varies with doping', 'onset at 90 K', 'Tc1 = 90, Tc2 = 60',
        '90 K, 60 K', '90; 60', '90/110 K', '350 mK', '1.2 meV',
        '< 2 K', '≤ 4 K', 'suppressed below 1 K', '93 K at 5 GPa',
        'broad transition', '120-90 K',  # inverted range is unreliable
    ])
    def test_rejects(self, text):
        assert parse_tc_text(text) is None


class TestCleanFormulaText:
    def test_unicode_subscripts(self):
        assert clean_formula_text('YBa₂Cu₃O₇') == 'YBa2Cu3O7'

    def test_variable_stoichiometry_stripped(self):
        assert clean_formula_text('YBa2Cu3O7-δ') == 'YBa2Cu3O7'
        assert clean_formula_text('La2-xSrxCuO4'.replace('x', 'x')) is not None

    def test_plus_minus_delta(self):
        assert clean_formula_text('Bi2Sr2CaCu2O8+δ') == 'Bi2Sr2CaCu2O8'

    def test_dopant_suffix(self):
        assert clean_formula_text('MgB2 + 5 wt% SiC') == 'MgB2'

    def test_additive_base_composite_takes_base(self):
        assert clean_formula_text('(Ag)0.5/YBa2Cu3O7') == 'YBa2Cu3O7'

    def test_plain_composite_takes_left(self):
        assert clean_formula_text('Nb3Sn/Cu') == 'Nb3Sn'

    def test_fraction_notation_untouched(self):
        # (p/q) stoichiometry slashes are NOT composite separators —
        # found by driving the cleaner on the processed reference CSV
        for f in ['Ba(3/5)Sr(2/5)CuO2', 'Tl2Ba2Ca(19/20)Y(1/20)Cu2O8']:
            assert clean_formula_text(f) == f

    def test_dash_alloy_rejected(self):
        assert clean_formula_text('Nb-Ti') is None
        assert clean_formula_text('La-Ba-Cu-O') is None

    def test_percent_mixture_rejected(self):
        assert clean_formula_text('50% Nb + 50% Ti') is None

    def test_trailing_comment_stripped(self):
        assert clean_formula_text('MgB2 (single phase)') == 'MgB2'

    def test_garbage_rejected(self):
        assert clean_formula_text('') is None
        assert clean_formula_text('123') is None
        assert clean_formula_text(np.nan) is None


class TestRetractionFilter:
    @pytest.mark.parametrize('formula,tc', [
        ('LuH2', 280.0),            # Dias Lu-H room-T claim
        ('CSH7', 287.0),            # Snider C-S-H claim
        ('Pb9Cu(PO4)6O', 400.0),    # LK-99-style Pb-C?-O unconfirmed: Pb+C+O
        ('La0.7Sr0.3MnO3', 360.0),  # manganite Curie temperature
        ('ZnO', 300.0),             # dilute-magnetic ZnO
        ('Fe2O3', 250.0),           # non-hydride >200K
    ])
    def test_flagged(self, formula, tc):
        assert is_retracted_or_contaminated(formula, tc)

    @pytest.mark.parametrize('formula,tc', [
        ('YBa2Cu3O7', 92.0), ('MgB2', 39.0), ('LaH10', 250.0),
        ('H3S', 203.0), ('Nb3Sn', 18.0), ('LuH2', 10.0),
    ])
    def test_passes(self, formula, tc):
        assert not is_retracted_or_contaminated(formula, tc)


class TestReadNemad:
    def test_end_to_end_frame(self):
        df = pd.DataFrame({
            'Chemical_Composition': ['YBa₂Cu₃O₇-δ', 'MgB2', 'Nb-Ti',
                                     'La2CuO4', 'Fe2O3'],
            'Data_Type': ['Experimental', 'Experimental', 'Experimental',
                          'Computational', 'Experimental'],
            'Median_Tc_By_Composition_K': [92.0, np.nan, 9.2, 35.0, 250.0],
            'Superconducting_Transition_Temperature':
                ['92 K', '~39 K', '9 K', '35 K', '250 K'],
        })
        out = read_nemad(df)
        # computational row + dash alloy + retracted dropped
        assert list(out['formula']) == ['YBa2Cu3O7', 'MgB2']
        assert list(out['Tc']) == [92.0, 39.0]  # median first, text fallback
        assert (out['dataset'] == 'nemad').all()
        assert (out['is_superconductor'] == 1).all()

    def test_text_fallback_only_when_median_missing(self):
        df = pd.DataFrame({
            'Chemical_Composition': ['MgB2'],
            'Data_Type': ['Experimental'],
            'Median_Tc_By_Composition_K': [np.nan],
            'Superconducting_Transition_Temperature': ['onset at 39 K'],
        })
        assert len(read_nemad(df)) == 0  # unreliable text -> dropped


class TestFileReaders:
    def test_mdr(self, tmp_path):
        p = tmp_path / 'primary.tsv'
        rows = ['h1', 'h2', 'h3']  # 3 header rows skipped
        for formula, tc in [('YBa2Cu3O7-Y', '91'), ('MgB2', '39'),
                            ('LuH3', '274'), ('BadTc', 'xx')]:
            rows.append('\t'.join(['a', 'b', formula, 'd', 'e', tc, 'g']))
        p.write_text('\n'.join(rows) + '\n')
        out = read_mdr(p)
        assert list(out['formula']) == ['YBa2Cu3O7', 'MgB2']
        assert list(out['Tc']) == [91.0, 39.0]

    def test_supercon2(self, tmp_path):
        p = tmp_path / 'sc2.csv'
        pd.DataFrame({
            'formula': ['Bi2Sr2CaCu2O8+δ', 'La0.7Ca0.3MnO3'],
            'criticalTemperature': [85.0, 260.0],
            'materialClass': ['cuprate', 'oxide'],
        }).to_csv(p, index=False)
        out = read_supercon2(p)
        assert list(out['formula']) == ['Bi2Sr2CaCu2O8']
        assert out['category_hint'].iloc[0] == 'cuprate'

    def test_threedsc(self, tmp_path):
        p = tmp_path / '3dsc.csv'
        p.write_text('# comment line\nformula_sc,tc,sc_class\n'
                     'Nb3Sn,18.0,A15\nMgB2,39.0,other\n')
        out = read_threedsc(p)
        assert len(out) == 2
        assert out['category_hint'].iloc[0] == 'A15'
        assert (out['dataset'] == '3dsc').all()

    def test_sodnet(self, tmp_path):
        p = tmp_path / 'sodnet.csv'
        pd.DataFrame({'Formula': ['FeSe', 'Hg'], 'Tc': [8.0, 4.2],
                      'Materials_family': ['iron', 'elemental']}).to_csv(
                          p, index=False)
        out = read_sodnet(p)
        assert len(out) == 2

    def test_manual_hydrides(self):
        out = manual_hydrides()
        assert len(out) == 12
        assert (out['Tc'] >= 100).all()
        assert (out['is_superconductor'] == 1).all()
        assert 'pressure_gpa' in out


class TestMergeSources:
    def _frame(self, rows):
        return pd.DataFrame(rows, columns=['formula', 'Tc',
                                           'is_superconductor', 'tc_source',
                                           'dataset', 'category_hint'])

    def test_composition_level_dedup_median(self):
        # same composition, three spellings, Tc within tolerance -> one
        # row at the median Tc
        a = self._frame([('YBa2Cu3O7', 91.0, 1, 'experimental', 'nemad', ''),
                         ('Ba2Cu3O7Y', 92.0, 1, 'experimental',
                          'mdr_supercon', ''),
                         ('Cu3Ba2YO7', 93.0, 1, 'experimental',
                          'supercon2', '')])
        out, rep = merge_sources([a])
        assert len(out) == 1
        assert out['Tc'].iloc[0] == 92.0
        assert rep['conflicts_resolved'] == 2

    def test_conflict_goes_to_priority_source(self):
        # Tc spread too wide -> the curated/NIMS source wins over scraped
        a = self._frame([('MgB2', 39.0, 1, 'experimental',
                          'mdr_supercon', ''),
                         ('MgB2', 150.0, 1, 'experimental',
                          'supercon2', '')])
        out, _ = merge_sources([a])
        assert len(out) == 1
        assert out['Tc'].iloc[0] == 39.0
        assert out['dataset'].iloc[0] == 'mdr_supercon'

    def test_holdout_and_existing_exclusion(self):
        a = self._frame([('YBa2Cu3O7', 91.0, 1, 'experimental', 'nemad', ''),
                         ('MgB2', 39.0, 1, 'experimental', 'nemad', ''),
                         ('Nb3Sn', 18.0, 1, 'experimental', 'nemad', '')])
        out, rep = merge_sources(
            [a], holdout_keys={canonical_key('Ba2Cu3O7Y')},
            existing_keys={canonical_key('B2Mg')})
        assert list(out['formula']) == ['Nb3Sn']
        assert rep['after_holdout_exclusion'] == 2

    def test_canonical_key_scale_and_order_invariant(self):
        assert canonical_key('YBa2Cu3O7') == canonical_key('Y2Ba4Cu6O14')
        assert canonical_key('MgB2') == canonical_key('B2Mg')
        assert canonical_key('MgB2') != canonical_key('MgB4')
        assert canonical_key('') is None
