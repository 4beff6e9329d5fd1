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
from ..tokenizer import BOS_ID, FractionAwareTokenizer
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
    # generation split (reference: self_supervised.py:86-88)
    greedy_fraction: float = 0.5
    explore_temp_min: float = 0.1
    explore_temp_max: float = 0.3
    # loss weights, relative within Phase 2 (reference: :96-99)
    round_trip_weight: float = 1.0
    consistency_weight: float = 0.5
    physics_weight: float = 0.3
    reinforce_weight: float = 0.5
    tc_consistency_weight: float = 5.0   # Tc weighted 5x inside loss 1
    # mode collapse intervention (reference: :101-104)
    diversity_bonus: float = 5.0
    collapse_threshold: float = 0.3
    collapse_temp_boost: float = 0.5
    collapse_rt_weight_mult: float = 2.0
    collapse_duration: int = 2
    # safety guards (reference: :117-119)
    exact_drop_threshold: float = 0.02
    exact_drop_window: int = 4
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
        self._enc_opt = None
        self._dec_opt = None
        self._update_fn = None
        self._heads_fn = None
        self._epoch = 0
        # mode-collapse intervention + exact-drop safety state
        self._collapse_remaining = 0
        self._exact_hist: List[float] = []
        self._rewarded: set = set(ds.formulas)

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
            self.coverage.fit(z_cache, method='hdbscan')
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
    def _safety_weight(self, phase2_weight: float,
                       current_exact: Optional[float]) -> float:
        """Exact-drop guard: halve the Phase-2 weight when training exact
        fell vs the recent window (reference: self_supervised.py:1486-1492)."""
        if current_exact is None:
            return phase2_weight
        self._exact_hist.append(current_exact)
        w = self.cfg.exact_drop_window
        if len(self._exact_hist) > w:
            recent_max = max(self._exact_hist[-w:])
            if current_exact < recent_max - self.cfg.exact_drop_threshold:
                return phase2_weight * 0.5
        return phase2_weight

    def run(self, enc_params, dec_params, z_cache: np.ndarray,
            rng: jax.Array, phase2_weight: float = 0.1,
            current_exact: Optional[float] = None,
            discovery_pipeline=None) -> Dict[str, object]:
        """One Phase-2 sub-epoch: sample z -> generate -> filter -> all four
        self-supervised losses -> gated low-LR update of encoder AND decoder
        (reference: self_supervised.py:976-1974 Phase2LossComputer + run).

        TPU redesign: greedy + exploratory rollouts are two batched KV-cache
        scans; the four losses live in ONE jitted value_and_grad whose
        REINFORCE term recomputes log-probs of the accepted sampled tokens
        with a differentiable teacher-forced pass (JAX has no stored graph
        to reuse, unlike the reference's retained autograd tape).
        """
        cfg = self.cfg
        self._epoch += 1
        weight = self._safety_weight(phase2_weight, current_exact)
        rt_mult = (cfg.collapse_rt_weight_mult
                   if self._collapse_remaining > 0 else 1.0)
        z = self.sample_latents(z_cache, rng)
        b = z.shape[0]
        n_greedy = int(b * cfg.greedy_fraction)

        # decoder conditioning from z alone (inference path); jit cached on
        # the instance — a fresh jax.jit(lambda) per sub-epoch would retrace
        # the encoder head assembly every time
        if self._heads_fn is None:
            self._heads_fn = jax.jit(lambda ep, zz: self.encoder.apply(
                ep, zz, method=MaterialsEncoder.heads_from_z))
        heads = self._heads_fn(enc_params, z)
        stoich, heads_vec = heads['stoich'], heads['heads_vec']

        # exploration temperature; boosted while collapse intervention active
        host_rng = np.random.default_rng(
            int(jax.random.randint(jax.random.fold_in(rng, 7), (), 0, 2**30)))
        temp = cfg.explore_temp_min + (
            cfg.explore_temp_max - cfg.explore_temp_min) * host_rng.random()
        if self._collapse_remaining > 0:
            temp = cfg.collapse_temp_boost

        gcfg_g = GenerationConfig(max_len=self.decoder.cfg.max_len,
                                  temperature=0.0)
        gcfg_e = GenerationConfig(max_len=self.decoder.cfg.max_len,
                                  temperature=float(temp))
        gen_g = generate_with_kv_cache(
            self.decoder, dec_params, z[:n_greedy], stoich[:n_greedy],
            heads_vec[:n_greedy], jax.random.fold_in(rng, 1), gcfg_g)
        gen_e = generate_with_kv_cache(
            self.decoder, dec_params, z[n_greedy:], stoich[n_greedy:],
            heads_vec[n_greedy:], jax.random.fold_in(rng, 2), gcfg_e)
        tokens_all = np.concatenate([np.asarray(gen_g['tokens']),
                                     np.asarray(gen_e['tokens'])])
        is_explore = np.arange(b) >= n_greedy
        formulas = [self.tokenizer.decode(t) for t in tokens_all]

        # filter: parse + chemical + physics validation.  Per-candidate
        # quality (validator score, zeroed on rejection) feeds the coverage
        # tracker so sampling favors productive latent regions.
        accepted_idx, accepted = [], []
        cand_quality = np.zeros(len(formulas), np.float32)
        for i, f in enumerate(formulas):
            if not f:
                continue
            v = self.validator.validate(f)
            if not v.is_valid or v.score < 0.3:
                continue
            if not self.physics.validate(f).is_plausible:
                cand_quality[i] = 0.25 * v.score
                continue
            cand_quality[i] = v.score
            accepted_idx.append(i)
            accepted.append(f)

        # degeneracy diagnostics + collapse detection (intervene, don't skip:
        # reference boosts round-trip weight + temperature for 2 sub-epochs,
        # self_supervised.py:1609-1616)
        unique_rate = len(set(accepted)) / max(len(accepted), 1)
        collapsed = bool(accepted) and unique_rate < cfg.collapse_threshold
        if collapsed and self._collapse_remaining == 0:
            self._collapse_remaining = cfg.collapse_duration
        elif self._collapse_remaining > 0:
            self._collapse_remaining -= 1

        novel = [f for f in set(accepted) if self.tracker.record(
            f, {'epoch': self._epoch})]

        # coverage sees EVERY sampled latent with its quality — visits mark
        # explored regions, quality marks which of them produce valid chem
        # (recorded before the no-accepts early return so barren regions
        # are down-weighted too)
        self.coverage.record_visits(np.asarray(z), quality=cand_quality)

        metrics = {
            'n_sampled': len(formulas),
            'n_accepted': len(accepted),
            'n_novel': len(novel),
            'unique_rate': unique_rate,
            'mode_collapsed': collapsed,
            'collapse_active': self._collapse_remaining > 0,
            'explore_temp': float(temp),
            'sigma': self._sigma(),
            'phase2_weight': weight,
            'holdout_hits': len(self.tracker.holdout_hits),
        }
        if not accepted_idx or weight <= 1e-8:
            return {'enc_params': enc_params, 'dec_params': dec_params,
                    'metrics': metrics, 'accepted': accepted}

        # cyclically pad the accepted set to a STATIC cfg.n_samples rows so
        # the jitted update compiles once; repeated rows mildly reweight the
        # means, which is harmless for this low-LR auxiliary update
        div_np = np.zeros(len(accepted), np.float32)
        for i, f in enumerate(accepted):
            if f not in self._rewarded:
                div_np[i] = cfg.diversity_bonus
                self._rewarded.add(f)
        pad_pos = np.resize(np.arange(len(accepted_idx)), cfg.n_samples)
        sel = np.asarray(accepted_idx)[pad_pos]
        acc = jnp.asarray(sel)
        z_acc = z[acc]

        # diversity bonus: first-seen formulas earn extra REINFORCE reward
        div_bonus = jnp.asarray(div_np[pad_pos])
        tokens = jnp.asarray(tokens_all[sel])
        explore_w = jnp.asarray(is_explore[sel], jnp.float32)
        stoich_acc, heads_acc = stoich[acc], heads_vec[acc]

        if self._enc_opt is None:
            self._enc_opt = self.tx.init(enc_params)
            self._dec_opt = self.tx.init(dec_params)

        me = self.encoder.cfg.max_elements

        def loss_fn(ep, dp, batch):
            tokens = batch['tokens']
            z_acc = batch['z_acc']
            stoich_acc, heads_acc = batch['stoich'], batch['heads']
            div_bonus, explore_w = batch['div_bonus'], batch['explore_w']
            weight, rt_mult = batch['weight'], batch['rt_mult']
            tok_mask = (tokens != 0).astype(jnp.float32)
            e_idx, e_frac, e_mask = tokens_to_composition(
                tokens, tok_mask, self.luts['token_to_z'],
                self.luts['token_value_table'], max_elements=me)

            # proxies from the ORIGINAL z (no grad, as in the reference)
            proxies = jax.lax.stop_gradient(self.encoder.apply(
                ep, z_acc, method=MaterialsEncoder.decode))
            magpie_proxy, tc_proxy = proxies['magpie_pred'], proxies['tc_pred']

            # loss 1: extended round-trip consistency (encoder grads)
            enc2 = self.encoder.apply(
                ep, e_idx, e_frac, e_mask, magpie_proxy, tc_proxy,
                method=MaterialsEncoder.encode)
            z_recon = enc2['z']
            z_mse = ((z_recon - jax.lax.stop_gradient(z_acc)) ** 2).mean()
            recon_heads = self.encoder.apply(ep, z_recon,
                                             method=MaterialsEncoder.decode)
            tc_mse = ((recon_heads['tc_pred'] - tc_proxy) ** 2).mean()
            loss1 = z_mse + cfg.tc_consistency_weight * tc_mse

            # loss 2: multi-head self-consistency on the sampled z
            hz = self.encoder.apply(ep, z_acc,
                                    method=MaterialsEncoder.heads_from_z)
            should_be_sc = jax.lax.stop_gradient(
                jax.nn.sigmoid(hz['tc_pred'] * 2.0))
            sc_bce = optax.sigmoid_binary_cross_entropy(
                hz['sc_pred'], should_be_sc).mean()
            bucket_p = jax.nn.softmax(hz['tc_class_logits'], axis=-1)
            bucket_ent = (-(bucket_p * jnp.log(bucket_p + 1e-8))
                          .sum(-1).mean())
            loss2 = 0.5 * (sc_bce + 0.1 * bucket_ent)

            # loss 3: differentiable physics constraints (A3+A6) on the
            # encoder's fraction head for the re-encoded candidates — the
            # parsed fractions themselves are constants, so the reference's
            # requires_grad gate always skipped them (self_supervised.py:
            # 1198-1226); routing through fraction_pred restores the signal
            from ..ops.constraints import (charge_balance_loss,
                                           site_occupancy_loss)
            frac_pred = hz['fraction_pred']
            a3 = site_occupancy_loss(e_idx, frac_pred, e_mask,
                                     hz['family_composed_14'])
            a6 = charge_balance_loss(e_idx, frac_pred, e_mask)
            loss3 = 0.5 * (a3 + a6)

            # loss 4: REINFORCE with round-trip cosine reward + diversity
            # bonus — the only signal reaching the decoder
            cos = (z_acc * z_recon).sum(-1) / (
                jnp.linalg.norm(z_acc, axis=-1)
                * jnp.linalg.norm(z_recon, axis=-1) + 1e-8)
            reward = jax.lax.stop_gradient(
                jnp.clip(cos, 0.0, 1.0) + div_bonus)
            adv = reward - reward.mean()
            # [BOS] + sampled tokens -> logits [B, T, V] aligned with tokens
            tf_input = jnp.concatenate(
                [jnp.full((tokens.shape[0], 1), BOS_ID, tokens.dtype),
                 tokens], axis=1)
            dec_out = self.decoder.apply(dp, z_acc, tf_input,
                                         stoich_acc, heads_acc)
            logp_all = jax.nn.log_softmax(
                dec_out['logits'].astype(jnp.float32), axis=-1)
            logp = jnp.take_along_axis(
                logp_all, tokens[:, :, None], axis=2)[:, :, 0]
            seq_logp = (logp * tok_mask).sum(1)
            loss4 = -(adv * seq_logp * explore_w).mean()

            total = weight * (
                cfg.round_trip_weight * rt_mult * loss1
                + cfg.consistency_weight * loss2
                + cfg.physics_weight * loss3
                + cfg.reinforce_weight * loss4)
            return total, {'loss1_round_trip': loss1,
                           'loss2_consistency': loss2,
                           'loss3_physics': loss3,
                           'loss4_reinforce': loss4,
                           'z_mse': z_mse, 'tc_mse': tc_mse}

        if self._update_fn is None:
            # one jitted program: 4-loss value_and_grad + BOTH optimizer
            # updates.  Un-jitted this is thousands of eager dispatches of
            # the 108M model per sub-epoch — minutes-to-hours over a remote
            # TPU tunnel, observed stuck on run2 @ epoch 327
            def _update(ep, dp, eopt, dopt, batch):
                (loss_, aux_), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(ep, dp, batch)
                upd_e, eopt = self.tx.update(grads[0], eopt, ep)
                ep = optax.apply_updates(ep, upd_e)
                upd_d, dopt = self.tx.update(grads[1], dopt, dp)
                dp = optax.apply_updates(dp, upd_d)
                return ep, dp, eopt, dopt, loss_, aux_
            self._update_fn = jax.jit(_update)

        batch = {'tokens': tokens, 'z_acc': z_acc, 'stoich': stoich_acc,
                 'heads': heads_acc, 'div_bonus': div_bonus,
                 'explore_w': explore_w,
                 'weight': jnp.asarray(weight, jnp.float32),
                 'rt_mult': jnp.asarray(rt_mult, jnp.float32)}
        (enc_params, dec_params, self._enc_opt, self._dec_opt,
         loss, aux) = self._update_fn(enc_params, dec_params,
                                      self._enc_opt, self._dec_opt, batch)
        metrics['phase2_loss'] = float(loss)
        metrics.update({k: float(v) for k, v in aux.items()})
        metrics['round_trip_z_mse'] = metrics.pop('z_mse')
        return {'enc_params': enc_params, 'dec_params': dec_params,
                'metrics': metrics, 'accepted': accepted}
