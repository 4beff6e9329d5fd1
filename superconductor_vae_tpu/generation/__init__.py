from .generate import GenerationConfig, generate_with_kv_cache, sample_for_reinforce, sequence_mask
from .latent import (
    perturb, slerp, lerp, interpolation_sweep, centroid_walk, pca_walk,
    pca_components, element_anchored_blend, element_jaccard_neighbors,
)
from .latent_analyzer import LatentSpaceAnalyzer, LatentCache
from .candidate_generator import CandidateGenerator
from .discovery import SuperconductorDiscoveryPipeline, Candidate
