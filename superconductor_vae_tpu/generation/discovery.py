"""End-to-end discovery pipeline: analyze -> generate -> decode -> validate ->
rank.

Capability parity with the reference ``SuperconductorDiscoveryPipeline``
(reference: src/superconductor/generation/discovery_pipeline.py:69-556).
All candidate latents from every strategy are decoded in ONE batched
KV-cache rollout; only string validation/ranking is host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import DatasetArrays
from ..models import MaterialsEncoder, FormulaDecoder
from ..tokenizer import FractionAwareTokenizer
from ..validation import CandidateValidator, PhysicsValidator
from ..postprocessing import FormulaCorrector
from .candidate_generator import CandidateGenerator
from .generate import GenerationConfig, generate_with_kv_cache
from .latent_analyzer import LatentSpaceAnalyzer


@dataclasses.dataclass
class Candidate:
    formula: str
    tc_pred_kelvin: float
    sc_prob: float
    validation_score: float
    physics_plausibility: float
    novelty: bool
    strategy: str
    rank_score: float = 0.0
    tc_uncertainty: float = 0.0    # MC-dropout std, normalized Tc units


class SuperconductorDiscoveryPipeline:
    def __init__(self, encoder: MaterialsEncoder, decoder: FormulaDecoder,
                 enc_params, dec_params,
                 tokenizer: FractionAwareTokenizer,
                 ds: DatasetArrays,
                 type_masks: Optional[jnp.ndarray] = None):
        self.encoder, self.decoder = encoder, decoder
        self.enc_params, self.dec_params = enc_params, dec_params
        self.tokenizer = tokenizer
        self.ds = ds
        self.type_masks = type_masks
        self.analyzer = LatentSpaceAnalyzer(encoder, enc_params)
        self.generator = CandidateGenerator(encoder, enc_params)
        self.validator = CandidateValidator()
        self.physics = PhysicsValidator()
        self.corrector = FormulaCorrector()
        self.known = set(ds.formulas)

    def decode_latents(self, z: jnp.ndarray, temperature: float = 0.0,
                       rng: Optional[jax.Array] = None,
                       type_masks: Optional[jnp.ndarray] = None,
                       chunk: Optional[int] = None,
                       pure_greedy: bool = False,
                       snap_stoich: bool = False) -> List[str]:
        """z -> formulas via encoder heads + batched KV-cache decode.

        The whole head-assembly + rollout is ONE jitted program per
        sampling mode (greedy / sampled; temperature enters traced so
        temperature sweeps share the sampled compile).  Un-jitted, the
        memory/head applies dispatch eagerly per call — dozens of
        round-trips over a remote TPU tunnel per holdout-search target.

        ``chunk``: decode in fixed-size chunks of this many latents (last
        chunk padded by repetition) — bounds the KV-cache footprint for
        reference-scale candidate pools (~30K latents/target,
        scratch/HOLDOUT_SEARCH_TECHNIQUE_REPORT.md run-2 protocol) while
        keeping a single compile across every call site.

        ``pure_greedy``: decode with NO generation-time gates (no stop
        boost / hard stop / type masking / site-dup suppress) — the
        rollout is then plain per-step argmax, the exact quantity decoder
        inversion optimizes: its teacher-forced argmax diagnostic equals
        this rollout by induction, while the stop-prob EOS boost
        (generate.py:71-87, reference autoregressive_decoder.py:1437-1457)
        can truncate a long formula whose stop head fires early even when
        every TF argmax matches the target.

        ``snap_stoich``: rational-snap the fraction head's predicted stoich
        conditioning before decode (generation/stoich_snap.py) — removes
        the small conditioning ε the decoder is hypersensitive to (the
        round-4 oracle root cause).
        """
        greedy = temperature < 0.01
        key = ('decode', greedy, pure_greedy, snap_stoich)
        if not hasattr(self, '_jit_cache'):
            self._jit_cache = {}
        if key not in self._jit_cache:
            gcfg = GenerationConfig(
                max_len=self.decoder.cfg.max_len,
                temperature=0.0 if greedy else 1.0,
                stop_boost=0.0 if pure_greedy else 10.0,
                hard_stop_threshold=0.0 if pure_greedy else 0.8,
                use_type_masking=(self.type_masks is not None
                                  and not pure_greedy),
                early_exit=True)

            @jax.jit
            def run(enc_params, dec_params, z, rng, temp, tm):
                full = self.encoder.apply(
                    enc_params, z, method=MaterialsEncoder.heads_from_z)
                stoich = full['stoich']
                if snap_stoich:
                    from .stoich_snap import rational_snap_stoich
                    stoich = rational_snap_stoich(stoich)
                out = generate_with_kv_cache(
                    self.decoder, dec_params, z, stoich,
                    full['heads_vec'], rng, gcfg,
                    type_masks=tm,
                    temperature=None if greedy else temp)
                return out['tokens']
            self._jit_cache[key] = run
        tm = self.type_masks if type_masks is None else type_masks
        if tm is None:
            # masking disabled at trace time; pass a dummy traced constant
            tm = jnp.zeros((1, 1), bool)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        temp = jnp.asarray(max(temperature, 1e-3), jnp.float32)
        if chunk is None or len(z) <= chunk:
            toks = self._jit_cache[key](
                self.enc_params, self.dec_params, z, rng, temp, tm)
            return [self.tokenizer.decode(t) for t in np.asarray(toks)]
        out: List[str] = []
        for i in range(0, len(z), chunk):
            zc = z[i:i + chunk]
            pad = chunk - len(zc)
            if pad:
                zc = jnp.concatenate([zc, jnp.tile(zc[-1:], (pad, 1))])
            toks = self._jit_cache[key](
                self.enc_params, self.dec_params, zc,
                jax.random.fold_in(rng, i), temp, tm)
            arr = np.asarray(toks)
            if pad:
                arr = arr[:chunk - pad]
            out.extend(self.tokenizer.decode(t) for t in arr)
        return out

    def decode_conditioned(self, z: jnp.ndarray, stoich: jnp.ndarray,
                           heads_vec: jnp.ndarray,
                           type_masks: Optional[jnp.ndarray] = None
                           ) -> List[str]:
        """Greedy decode with EXPLICIT conditioning (the AR-eval convention:
        ground-truth stoich + encoder-head vector, reference
        stoich_cond_tf=1.0 train_v12_clean.py:464) instead of the
        heads_from_z PREDICTED conditioning `decode_latents` uses.

        Exists for full-supervision reconstruction diagnostics (oracle):
        the round-4 bisect showed the oracle z is bit-identical to the
        corpus-row z, yet predicted-stoich decode loses the reconstruction
        — the fraction head's conditioning error dominates, so the oracle
        must condition like the eval path does."""
        if not hasattr(self, '_jit_cache'):
            self._jit_cache = {}
        if 'decode_cond' not in self._jit_cache:
            gcfg = GenerationConfig(
                max_len=self.decoder.cfg.max_len, temperature=0.0,
                stop_boost=10.0, hard_stop_threshold=0.8,
                use_type_masking=self.type_masks is not None,
                early_exit=True)

            @jax.jit
            def run(dec_params, z, stoich, heads_vec, tm):
                return generate_with_kv_cache(
                    self.decoder, dec_params, z, stoich, heads_vec,
                    jax.random.PRNGKey(0), gcfg, type_masks=tm)['tokens']
            self._jit_cache['decode_cond'] = run
        tm = self.type_masks if type_masks is None else type_masks
        if tm is None:
            tm = jnp.zeros((1, 1), bool)
        toks = self._jit_cache['decode_cond'](
            self.dec_params, z, stoich, heads_vec, tm)
        return [self.tokenizer.decode(t) for t in np.asarray(toks)]

    def _full_heads(self, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Inference-mode head assembly from z (no input features).
        Jit cached on the instance (a fresh jax.jit per call retraces)."""
        if not hasattr(self, '_jit_cache'):
            self._jit_cache = {}
        if 'heads' not in self._jit_cache:
            self._jit_cache['heads'] = jax.jit(
                lambda ep, zz: self.encoder.apply(
                    ep, zz, method=MaterialsEncoder.heads_from_z))
        return self._jit_cache['heads'](self.enc_params, z)

    def run(self, n_candidates: int = 256, seed: int = 0,
            strategies: tuple = ('clusters', 'gradient', 'interpolation',
                                 'evolutionary')) -> List[Candidate]:
        rng = jax.random.PRNGKey(seed)
        cache = self.analyzer.build_cache(self.ds)
        clusters = self.analyzer.find_high_tc_clusters(cache)
        per = max(n_candidates // max(len(strategies), 1), 8)

        latents, labels = [], []
        if 'clusters' in strategies and clusters:
            centers = np.stack([c['center'] for c in clusters[:4]])
            z = self.generator.sample_clusters(
                centers, per // len(centers) + 1, sigma=0.5,
                rng=jax.random.fold_in(rng, 1))
            latents.append(z[:per]); labels += ['clusters'] * min(per, len(z))
        top = np.argsort(-cache.tc_kelvin)[:max(per, 16)]
        z_top = jnp.asarray(cache.z[top])
        if 'gradient' in strategies:
            z = self.generator.gradient_ascent_tc(z_top[:per])
            latents.append(z); labels += ['gradient'] * len(z)
        if 'interpolation' in strategies and len(top) >= 2:
            half = min(per // 8 + 1, len(top) // 2)
            z = self.generator.interpolate_pairs(
                z_top[:half], z_top[half:2 * half], n=8)
            latents.append(z[:per]); labels += ['interpolation'] * min(per, len(z))
        if 'evolutionary' in strategies:
            z = self.generator.evolutionary(
                z_top[:per], jax.random.fold_in(rng, 2))
            latents.append(z); labels += ['evolutionary'] * len(z)

        all_z = jnp.concatenate(latents, axis=0)
        heads = self._full_heads(all_z)
        formulas = self.decode_latents(all_z)
        sc_prob = np.asarray(jax.nn.sigmoid(heads['sc_pred']))
        # MC-dropout refinement: the mean replaces the single-pass tc_pred,
        # the std flags low-confidence candidates
        # (reference: attention_vae.py:824-856)
        from ..models.encoder import predict_tc_mc
        tc_mc_mean, tc_mc_std = predict_tc_mc(
            self.encoder, self.enc_params, all_z, jax.random.fold_in(rng, 9))
        tc_pred = np.asarray(tc_mc_mean)
        tc_std = np.asarray(tc_mc_std)
        tc_kelvin = self.ds.norm_stats.tc_to_kelvin(tc_pred)

        out: List[Candidate] = []
        seen = set()
        for i, f in enumerate(formulas):
            corrected = self.corrector.correct(f)
            f = corrected.corrected
            if not f or f in seen:
                continue
            seen.add(f)
            v = self.validator.validate(f)
            if not v.is_valid:
                continue
            p = self.physics.validate(f)
            cand = Candidate(
                formula=f,
                tc_pred_kelvin=float(tc_kelvin[i]),
                sc_prob=float(sc_prob[i]),
                validation_score=v.score,
                physics_plausibility=p.plausibility,
                novelty=f not in self.known,
                strategy=labels[i] if i < len(labels) else 'unknown',
                tc_uncertainty=float(tc_std[i]))
            # high MC-dropout uncertainty discounts the rank (soft penalty:
            # 1 std in normalized units halves the score)
            cand.rank_score = (cand.sc_prob * cand.validation_score
                               * cand.physics_plausibility
                               * (1.0 + cand.tc_pred_kelvin / 100.0)
                               * (1.2 if cand.novelty else 1.0)
                               / (1.0 + cand.tc_uncertainty))
            out.append(cand)
        return sorted(out, key=lambda c: -c.rank_score)
