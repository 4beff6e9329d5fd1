from .elements import (
    ELEMENT_SYMBOLS,
    SYMBOL_TO_Z,
    N_ELEMENTS,
    PROPERTY_NAMES,
    element_property_matrix,
    get_atomic_number,
    get_element_symbol,
    get_oxidation_states,
    primary_oxidation_state_table,
)
from .featurize import (
    FEATURE_NAMES,
    N_FEATURES,
    composition_features,
    featurize_formulas,
    formula_features,
)
from .isotopes import (
    ISOTOPES,
    isotope_feature_matrix,
    estimate_isotope_effect,
)
