"""Periodic-table property database as dense numpy arrays.

TPU-first design note: unlike the reference implementation
(/root/reference/src/superconductor/encoders/element_properties.py, a dict of
per-symbol dicts), properties here live in a dense ``[N_ELEMENTS + 1, P]``
float32 matrix indexed by atomic number Z (row 0 = padding).  Featurization is
then a single gather — `matrix[element_indices]` — which jits cleanly and maps
onto TPU vector loads, instead of per-sample Python dict lookups.

Values are standard reference-book numbers (Pauling electronegativity, Bohr
calculated atomic radii in pm, first ionization energy kJ/mol, electron
affinity kJ/mol, melting point K, density g/cm^3, thermal conductivity W/m/K,
valence electron count, d-electron count, f-electron count, atomic mass amu).
Precision beyond ~2-3 significant figures is immaterial: the encoder's active
path uses learnable embeddings, and property consumers (validators, charge
balance, compositional targets) are tolerance-based heuristics.
"""

from __future__ import annotations

import numpy as np
from typing import Dict, List, Optional

N_ELEMENTS = 118

ELEMENT_SYMBOLS: List[str] = [
    '',  # Z = 0 padding slot
    'H', 'He', 'Li', 'Be', 'B', 'C', 'N', 'O', 'F', 'Ne',
    'Na', 'Mg', 'Al', 'Si', 'P', 'S', 'Cl', 'Ar', 'K', 'Ca',
    'Sc', 'Ti', 'V', 'Cr', 'Mn', 'Fe', 'Co', 'Ni', 'Cu', 'Zn',
    'Ga', 'Ge', 'As', 'Se', 'Br', 'Kr', 'Rb', 'Sr', 'Y', 'Zr',
    'Nb', 'Mo', 'Tc', 'Ru', 'Rh', 'Pd', 'Ag', 'Cd', 'In', 'Sn',
    'Sb', 'Te', 'I', 'Xe', 'Cs', 'Ba', 'La', 'Ce', 'Pr', 'Nd',
    'Pm', 'Sm', 'Eu', 'Gd', 'Tb', 'Dy', 'Ho', 'Er', 'Tm', 'Yb',
    'Lu', 'Hf', 'Ta', 'W', 'Re', 'Os', 'Ir', 'Pt', 'Au', 'Hg',
    'Tl', 'Pb', 'Bi', 'Po', 'At', 'Rn', 'Fr', 'Ra', 'Ac', 'Th',
    'Pa', 'U', 'Np', 'Pu', 'Am', 'Cm', 'Bk', 'Cf', 'Es', 'Fm',
    'Md', 'No', 'Lr', 'Rf', 'Db', 'Sg', 'Bh', 'Hs', 'Mt', 'Ds',
    'Rg', 'Cn', 'Nh', 'Fl', 'Mc', 'Lv', 'Ts', 'Og',
]

SYMBOL_TO_Z: Dict[str, int] = {s: z for z, s in enumerate(ELEMENT_SYMBOLS) if s}

PROPERTY_NAMES = (
    'electronegativity', 'atomic_radius', 'ionization_energy',
    'electron_affinity', 'melting_point', 'density',
    'thermal_conductivity', 'valence', 'd_electrons', 'f_electrons', 'mass',
)
N_PROPERTIES = len(PROPERTY_NAMES)

# Per-element rows: (en, radius_pm, ion_kJ, ea_kJ, mp_K, dens, thermal, val, d, f, mass)
_ROWS = {
    'H':  (2.20,  53, 1312,  73,   14, 0.09,  0.18, 1, 0, 0, 1.008),
    'He': (0.00,  31, 2372,   0,    1, 0.18,  0.15, 0, 0, 0, 4.003),
    'Li': (0.98, 167,  520,  60,  454, 0.53,    85, 1, 0, 0, 6.94),
    'Be': (1.57, 112,  899,   0, 1560, 1.85,   190, 2, 0, 0, 9.012),
    'B':  (2.04,  87,  801,  27, 2349, 2.34,    27, 3, 0, 0, 10.81),
    'C':  (2.55,  67, 1086, 122, 3823, 2.27,   140, 4, 0, 0, 12.011),
    'N':  (3.04,  56, 1402,   7,   63, 1.25,  0.03, 5, 0, 0, 14.007),
    'O':  (3.44,  48, 1314, 141,   54, 1.43,  0.03, 6, 0, 0, 15.999),
    'F':  (3.98,  42, 1681, 328,   53, 1.70,  0.03, 7, 0, 0, 18.998),
    'Ne': (0.00,  38, 2081,   0,   25, 0.90,  0.05, 0, 0, 0, 20.180),
    'Na': (0.93, 190,  496,  53,  371, 0.97,   140, 1, 0, 0, 22.990),
    'Mg': (1.31, 145,  738,   0,  923, 1.74,   160, 2, 0, 0, 24.305),
    'Al': (1.61, 118,  578,  42,  933, 2.70,   235, 3, 0, 0, 26.982),
    'Si': (1.90, 111,  786, 134, 1687, 2.33,   150, 4, 0, 0, 28.085),
    'P':  (2.19,  98, 1012,  72,  317, 1.82,  0.24, 5, 0, 0, 30.974),
    'S':  (2.58,  88, 1000, 200,  388, 2.07,  0.27, 6, 0, 0, 32.06),
    'Cl': (3.16,  79, 1251, 349,  172, 3.21,  0.01, 7, 0, 0, 35.45),
    'Ar': (0.00,  71, 1521,   0,   84, 1.78,  0.02, 0, 0, 0, 39.948),
    'K':  (0.82, 243,  419,  48,  337, 0.86,   100, 1, 0, 0, 39.098),
    'Ca': (1.00, 194,  590,   2, 1115, 1.55,   200, 2, 0, 0, 40.078),
    'Sc': (1.36, 184,  633,  18, 1814, 2.99,    16, 3, 1, 0, 44.956),
    'Ti': (1.54, 176,  659,   8, 1941, 4.51,    22, 4, 2, 0, 47.867),
    'V':  (1.63, 171,  651,  51, 2183, 6.11,    31, 5, 3, 0, 50.942),
    'Cr': (1.66, 166,  653,  65, 2180, 7.15,    94, 6, 5, 0, 51.996),
    'Mn': (1.55, 161,  717,   0, 1519, 7.44,     8, 7, 5, 0, 54.938),
    'Fe': (1.83, 156,  763,  15, 1811, 7.87,    80, 8, 6, 0, 55.845),
    'Co': (1.88, 152,  760,  64, 1768, 8.86,   100, 9, 7, 0, 58.933),
    'Ni': (1.91, 149,  737, 112, 1728, 8.91,    91, 10, 8, 0, 58.693),
    'Cu': (1.90, 145,  745, 119, 1358, 8.96,   400, 11, 10, 0, 63.546),
    'Zn': (1.65, 142,  906,   0,  693, 7.13,   120, 12, 10, 0, 65.38),
    'Ga': (1.81, 136,  579,  29,  303, 5.91,    29, 3, 10, 0, 69.723),
    'Ge': (2.01, 125,  762, 119, 1211, 5.32,    60, 4, 10, 0, 72.630),
    'As': (2.18, 114,  947,  78, 1090, 5.78,    50, 5, 10, 0, 74.922),
    'Se': (2.55, 103,  941, 195,  494, 4.81,     2, 6, 10, 0, 78.971),
    'Br': (2.96,  94, 1140, 325,  266, 3.10,  0.12, 7, 10, 0, 79.904),
    'Kr': (3.00,  88, 1351,   0,  116, 3.75,  0.01, 0, 10, 0, 83.798),
    'Rb': (0.82, 265,  403,  47,  312, 1.53,    58, 1, 0, 0, 85.468),
    'Sr': (0.95, 219,  550,   5, 1050, 2.64,    35, 2, 0, 0, 87.62),
    'Y':  (1.22, 212,  600,  30, 1799, 4.47,    17, 3, 1, 0, 88.906),
    'Zr': (1.33, 206,  640,  41, 2128, 6.51,    23, 4, 2, 0, 91.224),
    'Nb': (1.60, 198,  652,  86, 2750, 8.57,    54, 5, 4, 0, 92.906),
    'Mo': (2.16, 190,  684,  72, 2896, 10.2,   139, 6, 5, 0, 95.95),
    'Tc': (1.90, 183,  702,  53, 2430, 11.5,    51, 7, 5, 0, 98.0),
    'Ru': (2.20, 178,  710, 101, 2607, 12.4,   120, 8, 7, 0, 101.07),
    'Rh': (2.28, 173,  720, 110, 2237, 12.4,   150, 9, 8, 0, 102.906),
    'Pd': (2.20, 169,  804,  54, 1828, 12.0,    72, 10, 10, 0, 106.42),
    'Ag': (1.93, 165,  731, 126, 1235, 10.5,   430, 11, 10, 0, 107.868),
    'Cd': (1.69, 161,  868,   0,  594, 8.69,    97, 12, 10, 0, 112.414),
    'In': (1.78, 156,  558,  29,  430, 7.31,    82, 3, 10, 0, 114.818),
    'Sn': (1.96, 145,  709, 107,  505, 7.29,    67, 4, 10, 0, 118.710),
    'Sb': (2.05, 133,  834, 101,  904, 6.69,    24, 5, 10, 0, 121.760),
    'Te': (2.10, 123,  869, 190,  723, 6.23,     3, 6, 10, 0, 127.60),
    'I':  (2.66, 115, 1008, 295,  387, 4.93,  0.45, 7, 10, 0, 126.904),
    'Xe': (2.60, 108, 1170,   0,  161, 5.89,  0.01, 0, 10, 0, 131.293),
    'Cs': (0.79, 298,  376,  46,  302, 1.93,    36, 1, 0, 0, 132.905),
    'Ba': (0.89, 253,  503,  14, 1000, 3.62,    18, 2, 0, 0, 137.327),
    'La': (1.10, 226,  538,  45, 1193, 6.15,    13, 3, 1, 0, 138.905),
    'Ce': (1.12, 210,  534,  63, 1068, 6.77,    11, 4, 1, 1, 140.116),
    'Pr': (1.13, 247,  527,  93, 1208, 6.77,    13, 5, 0, 3, 140.908),
    'Nd': (1.14, 206,  533, 185, 1297, 7.01,    17, 6, 0, 4, 144.242),
    'Pm': (1.13, 205,  540,  12, 1315, 7.26,    15, 7, 0, 5, 145.0),
    'Sm': (1.17, 238,  545,  16, 1345, 7.52,    13, 8, 0, 6, 150.36),
    'Eu': (1.20, 231,  547,  11, 1099, 5.24,    14, 9, 0, 7, 151.964),
    'Gd': (1.20, 233,  593,  13, 1585, 7.90,    11, 10, 1, 7, 157.25),
    'Tb': (1.22, 225,  566, 112, 1629, 8.23,    11, 11, 0, 9, 158.925),
    'Dy': (1.23, 228,  573,  34, 1680, 8.55,    11, 12, 0, 10, 162.500),
    'Ho': (1.24, 226,  581,  33, 1734, 8.80,    16, 13, 0, 11, 164.930),
    'Er': (1.24, 226,  589,  30, 1802, 9.07,    15, 14, 0, 12, 167.259),
    'Tm': (1.25, 222,  597,  99, 1818, 9.32,    17, 15, 0, 13, 168.934),
    'Yb': (1.10, 222,  603,  -2, 1097, 6.90,    39, 16, 0, 14, 173.045),
    'Lu': (1.27, 217,  524,  33, 1925, 9.84,    16, 3, 1, 14, 174.967),
    'Hf': (1.30, 208,  659,   0, 2506, 13.3,    23, 4, 2, 14, 178.49),
    'Ta': (1.50, 200,  761,  31, 3290, 16.7,    57, 5, 3, 14, 180.948),
    'W':  (2.36, 193,  770,  79, 3695, 19.3,   170, 6, 4, 14, 183.84),
    'Re': (1.90, 188,  760,  14, 3459, 20.8,    48, 7, 5, 14, 186.207),
    'Os': (2.20, 185,  840, 106, 3306, 22.6,    88, 8, 6, 14, 190.23),
    'Ir': (2.20, 180,  880, 151, 2719, 22.6,   150, 9, 7, 14, 192.217),
    'Pt': (2.28, 177,  870, 205, 2041, 21.5,    72, 10, 9, 14, 195.084),
    'Au': (2.54, 174,  890, 223, 1337, 19.3,   320, 11, 10, 14, 196.967),
    'Hg': (2.00, 171, 1007,   0,  234, 13.5,     8, 12, 10, 14, 200.592),
    'Tl': (1.62, 156,  589,  20,  577, 11.9,    46, 3, 10, 14, 204.38),
    'Pb': (2.33, 154,  716,  35,  601, 11.3,    35, 4, 10, 14, 207.2),
    'Bi': (2.02, 143,  703,  91,  544, 9.81,     8, 5, 10, 14, 208.980),
    'Po': (2.00, 135,  812, 183,  527, 9.32,    20, 6, 10, 14, 209.0),
    'At': (2.20, 127,  899, 270,  575, 7.00,     2, 7, 10, 14, 210.0),
    'Rn': (2.20, 120, 1037,   0,  202, 9.73,  0.00, 0, 10, 14, 222.0),
    'Fr': (0.70, 348,  380,  47,  300, 1.87,    15, 1, 0, 0, 223.0),
    'Ra': (0.90, 283,  509,  10,  973, 5.50,    19, 2, 0, 0, 226.0),
    'Ac': (1.10, 260,  499,  34, 1323, 10.1,    12, 3, 1, 0, 227.0),
    'Th': (1.30, 237,  587,   0, 2023, 11.7,    54, 4, 2, 0, 232.038),
    'Pa': (1.50, 243,  568,   0, 1841, 15.4,    47, 5, 1, 2, 231.036),
    'U':  (1.38, 240,  598,   0, 1405, 19.1,    27, 6, 1, 3, 238.029),
    'Np': (1.36, 221,  605,   0,  917, 20.5,     6, 7, 1, 4, 237.0),
    'Pu': (1.28, 243,  585,   0,  913, 19.8,     6, 8, 0, 6, 244.0),
    'Am': (1.30, 244,  578,   0, 1449, 13.7,    10, 9, 0, 7, 243.0),
    'Cm': (1.30, 245,  581,   0, 1613, 13.5,    10, 10, 1, 7, 247.0),
    'Bk': (1.30, 244,  601,   0, 1259, 14.8,    10, 11, 0, 9, 247.0),
    'Cf': (1.30, 245,  608,   0, 1173, 15.1,    10, 12, 0, 10, 251.0),
    'Es': (1.30, 245,  619,   0, 1133, 8.84,    10, 13, 0, 11, 252.0),
    'Fm': (1.30, 245,  627,   0, 1125, 9.70,    10, 14, 0, 12, 257.0),
    'Md': (1.30, 246,  635,   0, 1100, 10.3,    10, 15, 0, 13, 258.0),
    'No': (1.30, 246,  642,   0, 1100, 9.90,    10, 16, 0, 14, 259.0),
    'Lr': (1.30, 246,  470,   0, 1900, 15.6,    10, 3, 1, 14, 266.0),
    'Rf': (1.30, 220,  580,   0, 2400, 23.2,    23, 4, 2, 14, 267.0),
    'Db': (1.30, 215,  665,   0, 2900, 29.3,    58, 5, 3, 14, 268.0),
    'Sg': (1.30, 210,  757,   0, 3100, 35.0,    60, 6, 4, 14, 269.0),
    'Bh': (1.30, 205,  740,   0, 3100, 37.1,    60, 7, 5, 14, 270.0),
    'Hs': (1.30, 200,  730,   0, 3100, 40.7,    60, 8, 6, 14, 269.0),
    'Mt': (1.30, 197,  800,   0, 3100, 37.4,    60, 9, 7, 14, 278.0),
    'Ds': (1.30, 195,  960,   0, 3100, 34.8,    60, 10, 8, 14, 281.0),
    'Rg': (1.30, 193, 1020,   0, 3100, 28.7,    60, 11, 9, 14, 282.0),
    'Cn': (1.30, 190, 1155,   0,  283, 14.0,    60, 12, 10, 14, 285.0),
    'Nh': (1.30, 180,  707,   0,  700, 16.0,    60, 3, 10, 14, 286.0),
    'Fl': (1.30, 175,  832,   0,  340, 14.0,    60, 4, 10, 14, 289.0),
    'Mc': (1.30, 170,  538,   0,  670, 13.5,    60, 5, 10, 14, 290.0),
    'Lv': (1.30, 165,  664,   0,  709, 12.9,    60, 6, 10, 14, 293.0),
    'Ts': (1.30, 160,  737,   0,  723, 7.20,    60, 7, 10, 14, 294.0),
    'Og': (1.30, 157,  860,   0,  325, 5.00,    60, 0, 10, 14, 294.0),
}

# Common oxidation states per element (used by charge balance / validators).
_OXIDATION_STATES: Dict[str, List[int]] = {
    'H': [-1, 1], 'He': [0], 'Li': [1], 'Be': [2], 'B': [3], 'C': [-4, 2, 4],
    'N': [-3, 3, 5], 'O': [-2], 'F': [-1], 'Ne': [0],
    'Na': [1], 'Mg': [2], 'Al': [3], 'Si': [-4, 4], 'P': [-3, 3, 5],
    'S': [-2, 4, 6], 'Cl': [-1, 1, 3, 5, 7], 'Ar': [0], 'K': [1], 'Ca': [2],
    'Sc': [3], 'Ti': [2, 3, 4], 'V': [2, 3, 4, 5], 'Cr': [2, 3, 6],
    'Mn': [2, 3, 4, 7], 'Fe': [2, 3], 'Co': [2, 3], 'Ni': [2, 3],
    'Cu': [1, 2, 3], 'Zn': [2], 'Ga': [3], 'Ge': [2, 4], 'As': [-3, 3, 5],
    'Se': [-2, 4, 6], 'Br': [-1, 1, 5], 'Kr': [0], 'Rb': [1], 'Sr': [2],
    'Y': [3], 'Zr': [4], 'Nb': [3, 5], 'Mo': [2, 3, 4, 6], 'Tc': [4, 7],
    'Ru': [2, 3, 4], 'Rh': [3], 'Pd': [2, 4], 'Ag': [1], 'Cd': [2],
    'In': [1, 3], 'Sn': [2, 4], 'Sb': [-3, 3, 5], 'Te': [-2, 4, 6],
    'I': [-1, 1, 5, 7], 'Xe': [0, 2, 4, 6], 'Cs': [1], 'Ba': [2],
    'La': [3], 'Ce': [3, 4], 'Pr': [3, 4], 'Nd': [3], 'Pm': [3], 'Sm': [2, 3],
    'Eu': [2, 3], 'Gd': [3], 'Tb': [3, 4], 'Dy': [3], 'Ho': [3], 'Er': [3],
    'Tm': [2, 3], 'Yb': [2, 3], 'Lu': [3], 'Hf': [4], 'Ta': [5], 'W': [4, 6],
    'Re': [4, 6, 7], 'Os': [3, 4], 'Ir': [3, 4], 'Pt': [2, 4], 'Au': [1, 3],
    'Hg': [1, 2], 'Tl': [1, 3], 'Pb': [2, 4], 'Bi': [3, 5], 'Po': [2, 4],
    'At': [-1, 1], 'Rn': [0], 'Fr': [1], 'Ra': [2], 'Ac': [3], 'Th': [4],
    'Pa': [4, 5], 'U': [3, 4, 5, 6], 'Np': [3, 4, 5, 6], 'Pu': [3, 4, 5, 6],
    'Am': [3], 'Cm': [3], 'Bk': [3, 4], 'Cf': [3], 'Es': [3], 'Fm': [3],
    'Md': [2, 3], 'No': [2, 3], 'Lr': [3],
}


def _build_matrix() -> np.ndarray:
    mat = np.zeros((N_ELEMENTS + 1, N_PROPERTIES), dtype=np.float32)
    for sym, row in _ROWS.items():
        z = SYMBOL_TO_Z[sym]
        en, radius, ion_e, ea, mp, dens, thermal, val, d_e, f_e, mass = row
        mat[z] = (en, radius, ion_e, ea, mp, dens, thermal, val, d_e, f_e, mass)
    return mat


_PROPERTY_MATRIX = _build_matrix()


def element_property_matrix(normalize: bool = True) -> np.ndarray:
    """Dense ``[119, 11]`` property matrix (row Z, padding at row 0).

    With ``normalize=True`` each column is z-scored over real elements so the
    matrix can be consumed directly as embedding-side features.
    """
    mat = _PROPERTY_MATRIX.copy()
    if normalize:
        body = mat[1:]
        mean = body.mean(axis=0, keepdims=True)
        std = body.std(axis=0, keepdims=True) + 1e-8
        mat[1:] = (body - mean) / std
    return mat


def primary_oxidation_state_table() -> np.ndarray:
    """``[119]`` float32 table of the most-common oxidation state per Z.

    Used by the differentiable charge-balance loss (constraint A6): a single
    gather replaces the reference's per-element Python lookups
    (reference: losses/constraint_zoo.py:234).
    """
    table = np.zeros(N_ELEMENTS + 1, dtype=np.float32)
    for sym, states in _OXIDATION_STATES.items():
        z = SYMBOL_TO_Z[sym]
        # Most common = the state chemists write first for that element here;
        # prefer the max-magnitude positive state for cations, else first.
        positive = [s for s in states if s > 0]
        if sym in ('O',):
            table[z] = -2.0
        elif sym in ('F', 'Cl', 'Br', 'I', 'At'):
            table[z] = -1.0
        elif sym in ('S', 'Se', 'Te'):
            table[z] = -2.0
        elif sym in ('N', 'P', 'As', 'Sb'):
            table[z] = -3.0
        elif positive:
            table[z] = float(positive[0])
        else:
            table[z] = float(states[0]) if states else 0.0
    return table


def get_atomic_number(symbol: str) -> Optional[int]:
    return SYMBOL_TO_Z.get(symbol)


def get_element_symbol(z: int) -> Optional[str]:
    if 1 <= z <= N_ELEMENTS:
        return ELEMENT_SYMBOLS[z]
    return None


def get_oxidation_states(symbol: str) -> List[int]:
    return list(_OXIDATION_STATES.get(symbol, []))


def get_element_property(symbol: str, name: str) -> Optional[float]:
    z = SYMBOL_TO_Z.get(symbol)
    if z is None or name not in PROPERTY_NAMES:
        return None
    return float(_PROPERTY_MATRIX[z, PROPERTY_NAMES.index(name)])
