from .pipeline import (
    DatasetArrays, NormStats, load_dataset, parse_formula_composition,
    category_to_label, compute_sample_weights,
)
from .sampler import WeightedEpochSampler, shard_batch_indices
from .synthetic import synthetic_dataset
from .compositional_targets import compositional_targets, COMP_TARGET_NAMES
from .canonical_ordering import (
    OrderAugmentation, OrderingMethod, canonicalize, canonicalize_batch,
)
