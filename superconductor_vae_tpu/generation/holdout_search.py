"""Generative holdout search: recover held-out superconductors by navigating
the latent space.

Capability parity with the reference holdout search drivers
(reference: scripts/holdout/holdout_search.py:441-566 and
holdout_search_targeted.py:200-778): for each of the 45 holdout targets, find
element-similar training anchors (Jaccard over element sets), generate
candidate latents with perturbation / SLERP / linear interpolation /
centroid+PCA walks / temperature sampling, decode in large batches, and
score exact + fuzzy element-similarity matches.

TPU redesign: every strategy emits latents into ONE pooled [N, latent] batch
per target, decoded by a single KV-cache rollout — the reference decodes per
strategy in small chunks.
"""

from __future__ import annotations

import dataclasses
import json
import time
from fractions import Fraction
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import (
    DatasetArrays, canonical_composition_key, parse_formula_composition,
)
from ..chem.elements import SYMBOL_TO_Z
from ..models import MaterialsEncoder, FormulaDecoder
from ..tokenizer import EOS_ID, PAD_ID, FractionAwareTokenizer
from .discovery import SuperconductorDiscoveryPipeline
from .latent import (
    element_anchored_blend, element_jaccard_neighbors, interpolation_sweep,
    lerp, pca_components, perturb, slerp,
)


@dataclasses.dataclass
class HoldoutResult:
    target: str
    best_match: str
    exact: bool
    best_similarity: float
    n_candidates: int
    # re-encode self-consistency of the best match's latent centroid
    # (reference: holdout_search_targeted.py:593-775)
    consistent: bool = True
    consistency: Optional[Dict[str, float]] = None
    # DIAGNOSTIC (not part of the reference-comparable headline): what the
    # decoder produces from directly ENCODING the target's composition —
    # holdout reconstruction, i.e. does the latent space contain the target
    # at all. The headline `exact` counts only navigation-found candidates.
    oracle_formula: Optional[str] = None
    oracle_match: Optional[bool] = None
    # type-mask convention the oracle decode ran under
    # ('element-constrained' | 'generic') — protocol provenance so oracle
    # numbers from the campaign and the standalone --oracle-only script are
    # comparable (ADVICE r4: they silently differed)
    oracle_masks: Optional[str] = None
    # which strategy family first produced the best match ('inversion' /
    # 'pool' / 'guided' / 'inverse_regression' / 'refine') — strategy
    # attribution so extensions beyond the reference's strategy set stay
    # auditable in the campaign stream
    found_by: Optional[str] = None
    # information-budget tier at which the exact match landed (tiered
    # strategy order only): 'navigation' = reference-parity strategies
    # (element-set anchors + pool/perturb/interp/PCA + refine; no
    # fraction-level target supervision), 'guided' = target-property-guided
    # (head-guided descent / inverse regression query the target's exact
    # fractions+Magpie+Tc), 'inversion' = decoder inversion (optimizes the
    # exact target token sequence — measures decoder invertibility, not
    # latent-space organization). None when no exact match.
    exact_tier: Optional[str] = None
    # best similarity achieved at the END of each tier that ran — the
    # per-information-budget trajectory ({'navigation': 0.997, ...})
    tier_sim: Optional[Dict[str, float]] = None
    # decoder-inversion endpoint diagnostics (best across starts/rounds):
    # 'tf_ce_min' = teacher-forced CE of the exact target sequence at the
    # final z; 'tf_argmax_max' = fraction of positions where the target
    # token is the TF argmax; 'tf_argmax_full' = #starts with argmax match
    # at EVERY position (greedy decode then provably reproduces the target
    # unless the generation-loop stop/type machinery intervenes)
    inversion_diag: Optional[Dict[str, float]] = None
    # wall-clock seconds this target's search took (timing provenance for
    # the campaign comparison table); excluded from equality so sharded
    # campaign runs compare equal to unsharded ones on search outcomes
    wall_s: Optional[float] = dataclasses.field(default=None, compare=False)


def element_presence(formulas: List[str]) -> np.ndarray:
    out = np.zeros((len(formulas), 119), bool)
    for i, f in enumerate(formulas):
        for el in parse_formula_composition(f):
            out[i, SYMBOL_TO_Z[el]] = True
    return out


def composition_feature(formula: str, dim: int = 119) -> Optional[np.ndarray]:
    """Order-free composition vector: x[Z] = normalized fraction of element
    Z, plus a trailing bias term. The feature space for the local inverse
    regression (``HoldoutSearch._inverse_regression_latents``)."""
    comp = parse_formula_composition(formula)
    if not comp:
        return None
    x = np.zeros(dim + 1, np.float32)
    total = sum(comp.values()) or 1.0
    for el, amt in comp.items():
        z = SYMBOL_TO_Z.get(el)
        if z is None:
            return None
        x[z] = amt / total
    x[-1] = 1.0
    return x


def element_similarity(a: str, b: str) -> float:
    """Jaccard over element sets, weighted by fraction closeness."""
    ca, cb = parse_formula_composition(a), parse_formula_composition(b)
    if not ca or not cb:
        return 0.0
    sa, sb = set(ca), set(cb)
    jac = len(sa & sb) / len(sa | sb)
    if jac == 0:
        return 0.0
    ta = sum(ca.values()) or 1.0
    tb = sum(cb.values()) or 1.0
    diffs = [abs(ca[e] / ta - cb[e] / tb) for e in sa & sb]
    frac_score = 1.0 - min(sum(diffs) / max(len(diffs), 1), 1.0)
    return 0.5 * jac + 0.5 * jac * frac_score


class HoldoutSearch:
    def __init__(self, pipeline: SuperconductorDiscoveryPipeline,
                 holdout_path: Optional[str | Path] = None):
        self.pipe = pipeline
        path = Path(holdout_path or Path(__file__).resolve().parents[2]
                    / 'data' / 'GENERATIVE_HOLDOUT_DO_NOT_TRAIN.json')
        blob = json.loads(path.read_text())
        self.targets = [s['formula'] for s in blob['holdout_samples']]
        self.target_tc = {s['formula']: float(s['Tc'])
                          for s in blob['holdout_samples'] if 'Tc' in s}
        self.presence = element_presence(pipeline.ds.formulas)

    # ---- head-guided latent optimization -----------------------------------
    def _target_head_arrays(self, target: str):
        """Supervision-convention arrays for the guided objective: normalized
        fractions padded to 12 slots + mask (the fraction head's training
        target, data/pipeline.py:322-344), element count, and the target Tc
        in normalized units.

        Slot order is ALPHABETICAL by element symbol — the corpus convention.
        The head learned appearance-order targets on a corpus whose spellings
        are alphabetical (jarvis Hill-ish notation), while holdout targets
        keep their source spelling (Tl2Ba2Ca... vs Ba2Ca...Tl2...): using the
        target's own appearance order mis-assigns every slot for reordered
        targets and the descent chases the wrong per-slot fractions."""
        from ..data.pipeline import MAX_ELEMENTS
        comp = parse_formula_composition(target)
        f_star = np.zeros(MAX_ELEMENTS, np.float32)
        m_star = np.zeros(MAX_ELEMENTS, np.float32)
        total = sum(comp.values()) or 1.0
        for j, (_, amt) in enumerate(sorted(comp.items())[:MAX_ELEMENTS]):
            f_star[j] = amt / total
            m_star[j] = 1.0
        tc_k = self.target_tc.get(target)
        tc_star = float(self.pipe.ds.norm_stats.kelvin_to_norm(
            np.asarray(tc_k or 0.0, np.float64)))
        tc_w = np.float32(0.5 if tc_k is not None else 0.0)

        # Magpie head target: the corpus's feature columns come from
        # chem/featurize.composition_features, so the target's vector can be
        # computed in-layout. With a quantile-grid skew transform
        # (NormStats.magpie_quantile_grids, the default since round 3) the
        # FULL vector is reproducible for a fresh formula; under legacy
        # rank-gauss stats the skewed columns are fed at their mean and
        # masked out (they cannot be reproduced, data/pipeline.py).
        ns = self.pipe.ds.norm_stats
        mdim = self.pipe.ds.magpie_dim
        mg_star = np.zeros(mdim, np.float32)
        mg_mask = np.zeros(mdim, np.float32)
        from ..chem.featurize import formula_features
        raw = formula_features(target)
        if len(raw) == mdim and np.asarray(ns.magpie_mean).shape[0] == mdim:
            mg_star, mg_mask = ns.normalize_fresh_magpie(raw)
            mg_star = mg_star * mg_mask
        return (f_star, m_star, np.float32(len(comp)), np.float32(tc_star),
                tc_w, mg_star, mg_mask)

    def head_guided_latents(self, target: str, z_init: jnp.ndarray,
                            steps: int = 240, lr: float = 0.08,
                            trust: float = 2e-3,
                            n_snapshots: int = 4,
                            order_free: bool = False) -> jnp.ndarray:
        """Navigate latents by gradient: descend z so the encoder's OWN heads
        predict the target's known properties (fractions, element count, Tc,
        SC), starting from corpus anchors.

        The reference's targeted holdout search navigates with the target's
        composition/Tc as anchors (doping-series interpolation, Tc-matched
        neighbors; holdout_search_targeted.py:200-545) — this is the same
        information, but the navigation is exact: the fraction head is the
        decoder's stoichiometry conditioning, so z's whose heads match the
        target fractions decode to those fractions with high probability.
        A trust-region penalty tethers each trajectory to its anchor so z
        stays on the data manifold instead of finding adversarial latents
        whose heads lie.

        ``order_free=True`` swaps the per-slot fraction match for a
        permutation-invariant one: sorted-descending predicted fractions vs
        sorted-descending targets, masked to the target's element count.
        The head's slot convention for off-manifold z is undefined (it was
        trained appearance-order on corpus rows only), so the sorted
        objective accepts ANY slot permutation that realizes the target's
        fraction multiset.

        Returns ``[n_snapshots * len(z_init), latent]``: trajectory snapshots
        (different decode basins along the path), final state last.
        """
        import optax
        (f_star, m_star, n_star, tc_star, tc_w,
         mg_star, mg_mask) = self._target_head_arrays(target)
        if order_free:
            f_star = np.sort(f_star)[::-1].copy()
            m_star = np.sort(m_star)[::-1].copy()
        # lr/trust are baked into the compiled optimizer closure, so they
        # MUST be part of the cache key (a later call with different lr
        # would otherwise silently reuse the old compiled descent)
        key = ('guided', len(z_init), steps, n_snapshots, order_free,
               lr, trust)
        if not hasattr(self, '_jit_cache'):
            self._jit_cache = {}
        if key not in self._jit_cache:
            enc = self.pipe.encoder
            snap_every = max(steps // n_snapshots, 1)
            tx = optax.adam(lr)

            def obj(z, z0, fs, ms, ns, ts, tw, mgs, mgm):
                h = enc.apply(self.pipe.enc_params, z,
                              method=MaterialsEncoder.heads_from_z)
                pred = h['fraction_pred']
                if order_free:
                    pred = jnp.sort(pred, axis=-1)[..., ::-1]
                lf = ((pred - fs) ** 2 * ms).sum(-1)
                lc = 0.05 * (h['element_count_pred'] - ns) ** 2
                lt = tw * (h['tc_pred'] - ts) ** 2
                lsc = 0.05 * jax.nn.softplus(-h['sc_pred'])
                # element identity lives in the Magpie head (the fraction
                # head has amounts only)
                lm = 0.25 * ((h['magpie_pred'] * mgm - mgs) ** 2).sum(-1) \
                    / jnp.clip(mgm.sum(), 1.0)
                reg = trust * ((z - z0) ** 2).sum(-1)
                return (lf + lc + lt + lsc + lm + reg).sum()

            @jax.jit
            def run(z0, fs, ms, ns, ts, tw, mgs, mgm):
                def step(carry, i):
                    z, opt_state = carry
                    g = jax.grad(obj)(z, z0, fs, ms, ns, ts, tw, mgs, mgm)
                    upd, opt_state = tx.update(g, opt_state, z)
                    z = optax.apply_updates(z, upd)
                    snap = jnp.where((i + 1) % snap_every == 0, 1, 0)
                    return (z, opt_state), (snap, z)
                (_, _), (snaps, traj) = jax.lax.scan(
                    step, (z0, tx.init(z0)), jnp.arange(steps))
                # gather the snapshot states (static count, fixed shapes)
                idx = jnp.flatnonzero(snaps, size=n_snapshots,
                                      fill_value=steps - 1)
                return traj[idx].reshape(-1, z0.shape[-1])
            self._jit_cache[key] = run
        return self._jit_cache[key](
            jnp.asarray(z_init), jnp.asarray(f_star), jnp.asarray(m_star),
            jnp.asarray(n_star), jnp.asarray(tc_star), jnp.asarray(tc_w),
            jnp.asarray(mg_star), jnp.asarray(mg_mask))

    # ---- decoder inversion --------------------------------------------------
    def _target_token_ids(self, target: str) -> Optional[np.ndarray]:
        """Canonical-spelling token sequence for decoder inversion:
        alphabetical element order with merged, GCD-reduced amounts — the
        corpus convention the decoder learned to emit. Returns None when the
        spelling doesn't round-trip (fraction outside the vocab, sequence
        longer than max_len), in which case inversion is skipped."""
        tok = self.pipe.tokenizer
        comp = parse_formula_composition(target)
        if not comp:
            return None
        parts = []
        for el in sorted(comp):
            amt = Fraction(comp[el]).limit_denominator(100000)
            parts.append(el)
            if amt == 1:
                continue
            if amt.denominator == 1:
                parts.append(str(int(amt)))
            else:
                parts.append(f'({amt.numerator}/{amt.denominator})')
        spelled = ''.join(parts)
        ids = tok.encode(spelled)
        tkey = canonical_composition_key(target)
        if tkey is None or canonical_composition_key(tok.decode(ids)) != tkey:
            return None
        return np.asarray(ids, np.int32)

    def decoder_inversion_latents(self, target: str, z_init: jnp.ndarray,
                                  steps: int = 384, lr: float = 0.05,
                                  trust: float = 1e-3,
                                  n_snapshots: int = 6,
                                  stop_w: float = 0.25
                                  ) -> Optional[jnp.ndarray]:
        """Direct decoder inversion: gradient-descend z on the teacher-forced
        cross-entropy of the exact canonical target token sequence (plus a
        stop-head alignment BCE so greedy decode's hard-stop machinery fires
        at EOS, not before — generate.py:71-87), through the full
        differentiable chain z -> encoder heads -> memory -> TF logits.

        This optimizes the quantity that *defines* an exact match: greedy
        decode reproduces the target iff the target token is the argmax at
        every position, which a low enough TF cross-entropy guarantees. It
        is the strongest member of the target-guided strategy family
        (head-guided descent and inverse regression already query the same
        target composition); reported under the same unconstrained protocol,
        with strategy attribution in ``HoldoutResult.found_by``. The
        reference's closest analogue is its targeted navigation toward known
        target properties (holdout_search_targeted.py:200-545).

        Returns trajectory snapshots ``[n_snapshots * len(z_init), latent]``
        (final states last), or None when the target has no in-vocab
        canonical spelling.
        """
        ids = self._target_token_ids(target)
        if ids is None:
            return None
        import optax
        key = ('inversion', len(z_init), steps, n_snapshots, lr, trust)
        if not hasattr(self, '_jit_cache'):
            self._jit_cache = {}
        if key not in self._jit_cache:
            enc, dec = self.pipe.encoder, self.pipe.decoder
            snap_every = max(steps // n_snapshots, 1)
            tx = optax.adam(lr)

            # params enter as jit ARGUMENTS: closing over them would bake
            # all 108M weights into the HLO as literal constants, and the
            # serialized compile request then exceeds the axon tunnel's
            # remote_compile body limit (observed HTTP 413 mid-campaign)
            def obj(ep, dp, z, z0, toks):
                full = enc.apply(ep, z,
                                 method=MaterialsEncoder.heads_from_z)
                heads = dec.apply(dp, z, toks,
                                  full['stoich'], full['heads_vec'])
                logits = heads['logits'].astype(jnp.float32)   # [B, T-1, V]
                tgt = toks[:, 1:]
                mask = (tgt != PAD_ID).astype(jnp.float32)
                lp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
                ce = (ce * mask).sum(-1) / jnp.clip(mask.sum(-1), 1.0)
                stop_t = (tgt == EOS_ID).astype(jnp.float32)
                sbce = optax.sigmoid_binary_cross_entropy(
                    heads['stop_logits'].astype(jnp.float32), stop_t)
                sbce = (sbce * mask).sum(-1) / jnp.clip(mask.sum(-1), 1.0)
                reg = trust * ((z - z0) ** 2).sum(-1)
                return (ce + stop_w * sbce + reg).sum()

            def diag(ep, dp, z, toks):
                full = enc.apply(ep, z,
                                 method=MaterialsEncoder.heads_from_z)
                heads = dec.apply(dp, z, toks,
                                  full['stoich'], full['heads_vec'])
                logits = heads['logits'].astype(jnp.float32)
                tgt = toks[:, 1:]
                mask = (tgt != PAD_ID).astype(jnp.float32)
                lp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
                ce = (ce * mask).sum(-1) / jnp.clip(mask.sum(-1), 1.0)
                am = (logits.argmax(-1) == tgt).astype(jnp.float32)
                am = (am * mask).sum(-1) / jnp.clip(mask.sum(-1), 1.0)
                return ce, am

            @jax.jit
            def run(ep, dp, z0, toks):
                def step(carry, i):
                    z, opt_state = carry
                    g = jax.grad(obj, argnums=2)(ep, dp, z, z0, toks)
                    upd, opt_state = tx.update(g, opt_state, z)
                    z = optax.apply_updates(z, upd)
                    snap = jnp.where((i + 1) % snap_every == 0, 1, 0)
                    return (z, opt_state), (snap, z)
                (zf, _), (snaps, traj) = jax.lax.scan(
                    step, (z0, tx.init(z0)), jnp.arange(steps))
                idx = jnp.flatnonzero(snaps, size=n_snapshots,
                                      fill_value=steps - 1)
                ce, am = diag(ep, dp, zf, toks)
                return traj[idx].reshape(-1, z0.shape[-1]), ce, am
            self._jit_cache[key] = run
        toks = jnp.asarray(np.tile(ids[None], (len(z_init), 1)))
        out, ce, am = self._jit_cache[key](self.pipe.enc_params,
                                           self.pipe.dec_params,
                                           jnp.asarray(z_init), toks)
        self.last_inversion_diag = {
            'tf_ce_min': float(ce.min()),
            'tf_argmax_max': float(am.max()),
            'tf_argmax_full': int((np.asarray(am) >= 1.0).sum())}
        return out

    def _inversion_safe(self, target: str, z_init: jnp.ndarray,
                        steps: int) -> Optional[jnp.ndarray]:
        """Inversion is one strategy of several: a runtime failure (e.g. a
        tunnel-side compile rejection) must degrade to the remaining
        strategy families, not abort the target's whole search budget."""
        try:
            return self.decoder_inversion_latents(target, z_init,
                                                  steps=steps)
        except Exception as e:  # noqa: BLE001 — deliberate blanket guard
            print(f'  [inversion] skipped for {target}: '
                  f'{type(e).__name__}: {e}', flush=True)
            return None

    def _anchor_latents(self, target: str, cache, n: int = 16) -> jnp.ndarray:
        """Fixed-count anchor set for guided navigation: same-element-set
        rows first, then Jaccard neighbors — each neighbor missing target
        elements gets pre-blended 30% toward the centroid of corpus rows
        that contain the missing element, so every start already points at
        the full element set (descent then only has to fix fractions).
        Padded by repetition; fixed shape keeps one jit compile across all
        45 targets."""
        tgt_presence = element_presence([target])[0]
        same = np.flatnonzero((self.presence == tgt_presence).all(axis=1))
        nbrs = element_jaccard_neighbors(tgt_presence, self.presence, k=n)
        idx = np.concatenate([same[:n], nbrs])[:n]
        if len(idx) == 0:
            idx = np.argsort(-cache.tc_kelvin)[:n]
        idx = np.resize(idx, n)
        z = np.array(np.asarray(cache.z[idx], np.float32))
        for i, row in enumerate(idx):
            missing = np.flatnonzero(tgt_presence & ~self.presence[row])
            for ez in missing:
                rows = np.flatnonzero(self.presence[:, ez])
                if len(rows):
                    # rank element-carrying rows by set overlap with the
                    # target so the blend direction points at e.g. Y-CUPRATES
                    # for a missing Y, not the centroid of every Y compound
                    ov = (self.presence[rows] & tgt_presence).sum(1) \
                        / np.maximum((self.presence[rows]
                                      | tgt_presence).sum(1), 1)
                    best = rows[np.argsort(-ov)[:16]]
                    cen = np.asarray(cache.z[best], np.float32).mean(0)
                    z[i] = 0.7 * z[i] + 0.3 * cen
        return jnp.asarray(z)

    def _candidate_latents(self, target: str, cache, budget: int,
                           rng: jax.Array) -> jnp.ndarray:
        """Candidate latent pool per target, mirroring the reference run-2
        protocol (element-matched top-100 seeds; multi-scale perturbation /
        pairwise lerp+slerp / centroid scaled walks / PCA walks —
        scratch/HOLDOUT_SEARCH_TECHNIQUE_REPORT.md §3), plus two extensions
        of ours: same-element-set manifold sweeps and dopant-anchored
        blends.  The multi-scale perturbation block is sized LAST to exactly
        fill ``budget`` so the final clip never drops a strategy."""
        tgt_presence = element_presence([target])[0]
        nbrs = element_jaccard_neighbors(tgt_presence, self.presence, k=100)
        if len(nbrs) == 0:
            nbrs = np.argsort(-cache.tc_kelvin)[:8]
        z_n = jnp.asarray(cache.z[nbrs])
        anchor = z_n[0]
        k = jax.random.split(rng, 7)
        latent_dim = z_n.shape[-1]

        # same-element-set manifold sweep: corpus rows with the IDENTICAL
        # element set differ from the target only in fractions, so dense
        # interpolation between pairs of them (plus tight perturbation)
        # walks the fraction manifold directly — the dominant miss mode is
        # right-elements / wrong-subscripts (reference analogue: the
        # targeted search's doping-series interpolation,
        # holdout_search_targeted.py:441-545)
        same_set = np.flatnonzero((self.presence == tgt_presence).all(axis=1))
        same_parts = []
        if len(same_set) >= 1:
            z_s = jnp.asarray(cache.z[same_set[:24]])
            n_pair = max(budget // 8, 8)
            if len(z_s) >= 2:
                ii = jax.random.randint(k[6], (n_pair,), 0, len(z_s))
                jj = jax.random.randint(
                    jax.random.fold_in(k[6], 1), (n_pair,), 0, len(z_s))
                ts = jax.random.uniform(
                    jax.random.fold_in(k[6], 2), (n_pair,),
                    minval=-0.25, maxval=1.25)   # extrapolate past endpoints
                same_parts.append(jax.vmap(
                    lambda i, j, t: lerp(z_s[i], z_s[j], t))(ii, jj, ts))
            same_parts.append(perturb(
                z_s[jax.random.randint(jax.random.fold_in(k[6], 3),
                                       (n_pair,), 0, len(z_s))],
                jax.random.fold_in(k[6], 4), 0.03))

        # dopant anchoring: the dominant miss mode is DROPPED minority
        # elements (e.g. Mg(97/100)Na(3/100)B2 -> B2Mg) — Jaccard neighbors
        # rarely contain the dopant, so no base strategy can inject it.
        # For target elements absent from the anchor's own formula, blend
        # the anchor with corpus rows that DO contain them
        # (reference: holdout strategies + phase-2 element anchoring,
        # self_supervised.py ZSpaceSampler strategy 4)
        anchor_presence = self.presence[nbrs[0]]
        missing = np.flatnonzero(tgt_presence & ~anchor_presence)
        per = max(budget // (6 if len(missing) else 5), 4)
        dope_parts = []
        if len(missing):
            per_el = max(per // len(missing), 2)
            for j, ez in enumerate(missing):
                rows = np.flatnonzero(self.presence[:, ez])
                if len(rows) == 0:
                    continue
                dope_parts.append(element_anchored_blend(
                    anchor, jnp.asarray(cache.z[rows[:64]]),
                    jax.random.fold_in(k[5], j), per_el, sigma=0.02))

        parts: List[jnp.ndarray] = []

        # pairwise interpolation between seed pairs, both lerp and slerp,
        # with extrapolation past the endpoints (reference strategy 2 uses
        # t in [0,1]; extrapolating reaches doping levels outside the
        # anchors' span)
        if len(z_n) >= 2:
            n_int = max(budget // 8, 16)
            ii = jax.random.randint(k[1], (n_int,), 0, len(z_n))
            jj = jax.random.randint(k[2], (n_int,), 0, len(z_n))
            ts = jax.random.uniform(jax.random.fold_in(k[2], 1), (n_int,),
                                    minval=-0.25, maxval=1.25)
            half = n_int // 2
            parts.append(jax.vmap(lambda i, j, t: slerp(z_n[i], z_n[j], t))(
                ii[:half], jj[:half], ts[:half]))
            parts.append(jax.vmap(lambda i, j, t: lerp(z_n[i], z_n[j], t))(
                ii[half:], jj[half:], ts[half:]))

        # centroid + scaled random walks, directions normalized by the
        # neighbor distribution's per-dim std (reference strategy 3,
        # scales {0.3, 0.5, 1.0, 1.5, 2.0})
        centroid = z_n.mean(axis=0)
        cw_scales = jnp.asarray((0.3, 0.5, 1.0, 1.5, 2.0))
        n_cw = max(budget // 32, 10)
        dirs = jax.random.normal(k[3], (n_cw, latent_dim)) \
            * jnp.maximum(z_n.std(axis=0), 1e-4)[None]
        parts.append(centroid[None]
                     + cw_scales[jnp.arange(n_cw) % 5][:, None] * dirs)
        # plus the anchor->centroid line (our round-1 sweep, kept)
        steps = jnp.linspace(-0.5, 1.5, max(budget // 64, 8))
        parts.append(anchor[None] + steps[:, None] * (centroid - anchor)[None])

        # PCA walks: top-20 principal directions of the seed cloud, stepped
        # -3σ..+3σ from the centroid (reference strategy 4), plus random
        # component combinations
        if len(nbrs) >= 4:
            n_comp = min(20, len(nbrs) - 1)
            comps, std = pca_components(np.asarray(z_n), k=n_comp)
            sweep = np.linspace(-3.0, 3.0, 20)
            mags = np.zeros((n_comp * 20, n_comp), np.float32)
            for c in range(n_comp):
                mags[c * 20:(c + 1) * 20, c] = sweep * std[c]
            n_mix = max(budget // 32, 10)
            mix = np.asarray(jax.random.normal(
                k[4], (n_mix, n_comp))) * std[None] * 0.5
            parts.append(jnp.asarray(
                np.asarray(centroid)[None] + mags @ comps))
            parts.append(jnp.asarray(np.asarray(anchor)[None] + mix @ comps))
        parts += dope_parts

        # multi-scale Gaussian perturbation of the top element-overlap seeds
        # (reference strategy 1: 30 seeds x 8 noise scales) — sized to fill
        # whatever budget the other strategies left
        n_so_far = sum(len(p) for p in same_parts + parts)
        n_pert = max(budget - n_so_far, 64)
        seeds = z_n[:30]
        sidx = jax.random.randint(k[0], (n_pert,), 0, len(seeds))
        scales = jnp.asarray((0.02, 0.05, 0.08, 0.1, 0.15, 0.2, 0.3, 0.5))
        sig = scales[jnp.arange(n_pert) % 8]
        parts.append(seeds[sidx] + sig[:, None] * jax.random.normal(
            jax.random.fold_in(k[0], 1), (n_pert, latent_dim)))

        # same-set sweeps go FIRST so the [:budget] clip never drops them —
        # they are the highest-yield candidates when they exist (and the
        # leading rows double as the sampled-temperature slice in search())
        return jnp.concatenate(same_parts + parts, axis=0)[:budget]

    def _inverse_regression_latents(self, target: str,
                                    pool_z: List[np.ndarray],
                                    by_formula: Dict[str, list],
                                    rng: jax.Array,
                                    best: str = '',
                                    n_out: int = 384,
                                    k_local: int = 1024,
                                    l2: float = 1e-2,
                                    tau: float = 0.3) -> Optional[jnp.ndarray]:
        """Local inverse regression: the decoded pool is a dataset of
        (composition -> latent) pairs — every distinct decoded formula maps
        to the centroid of the latents that produced it. Weighted ridge over
        the ``k_local`` pool formulas nearest the target (weights
        ``exp(-L1/tau)`` in composition space) fits a LOCAL linear inverse
        of the decoder, which is then *queried at the exact target
        composition* — a z estimate no forward strategy can propose when the
        target's fraction combination is absent from the corpus.

        Also queries along the best-match -> target composition path
        (including mild extrapolation past the target) since the linear fit
        is most trustworthy near its support. Returns the query latents
        tiled with small Gaussian perturbations, or None when the pool is
        too thin to fit.

        This is an extension beyond the reference's strategy set (its
        closest analogue is doping-series interpolation at the LATENT level,
        holdout_search_targeted.py:441-545); reported under the same
        unconstrained protocol.
        """
        x_t = composition_feature(target)
        if x_t is None:
            return None
        all_z = np.concatenate(pool_z)
        feats, zs = [], []
        for f, rows in by_formula.items():
            x = composition_feature(f)
            if x is None:
                continue
            feats.append(x)
            zs.append(all_z[np.asarray(rows)].mean(axis=0))
        if len(feats) < 24:
            return None
        X = np.stack(feats)                        # [N, 120]
        Z = np.stack(zs).astype(np.float64)        # [N, latent]
        d = np.abs(X - x_t[None]).sum(axis=1)      # L1 in composition space
        idx = np.argsort(d)[:k_local]
        Xl, Zl, dl = X[idx].astype(np.float64), Z[idx], d[idx]
        w = np.exp(-dl / tau)
        if w.sum() < 1e-6:
            return None
        Xw = Xl * w[:, None]
        # ridge on the active columns only (elements never seen in the local
        # pool carry no signal; shrinking the full 120-dim system toward 0
        # would just zero the query's contribution for them)
        active = np.flatnonzero((Xl != 0).any(axis=0))
        A = Xw[:, active].T @ Xl[:, active] \
            + l2 * np.eye(len(active))
        B = Xw[:, active].T @ Zl
        try:
            beta = np.linalg.solve(A, B)           # [act, latent]
        except np.linalg.LinAlgError:
            return None

        queries = [x_t]
        x_b = composition_feature(best) if best else None
        if x_b is not None:
            for t in (0.5, 0.75, 1.1, 1.25):       # path + extrapolation
                queries.append((1 - t) * x_b + t * x_t)
        Q = np.stack(queries)[:, active]
        z_q = (Q @ beta).astype(np.float32)        # [q, latent]

        reps = max(n_out // len(z_q), 1)
        base = jnp.asarray(np.repeat(z_q, reps, axis=0))
        sig = jnp.asarray(
            np.tile(np.asarray([0.0, 0.005, 0.01, 0.02], np.float32),
                    (len(base) + 3) // 4)[:len(base)])[:, None]
        noise = jax.random.normal(rng, base.shape)
        return base + sig * noise

    def oracle_encode_latent(self, target: str) -> Optional[jnp.ndarray]:
        """Encode the target composition directly: elements in the corpus's
        alphabetical convention, normalized fractions, the full z-scored
        Magpie vector (skewed columns through the persisted quantile grids
        when present — legacy rank-gauss stats fall back to the column
        mean, data/pipeline.py::NormStats.normalize_fresh_magpie), and the
        known Tc. This is holdout RECONSTRUCTION — generalization to
        unseen inputs — not generative navigation, so it is reported as a
        diagnostic next to (never inside) the reference-comparable search
        pool."""
        from ..data.pipeline import MAX_ELEMENTS
        comp = parse_formula_composition(target)
        if not comp:
            return None
        idx = np.zeros((1, MAX_ELEMENTS), np.int32)
        frac = np.zeros((1, MAX_ELEMENTS), np.float32)
        mask = np.zeros((1, MAX_ELEMENTS), bool)
        total = sum(comp.values()) or 1.0
        for j, (el, amt) in enumerate(sorted(comp.items())[:MAX_ELEMENTS]):
            z = SYMBOL_TO_Z.get(el)
            if z is None:
                return None
            idx[0, j] = z
            frac[0, j] = amt / total
            mask[0, j] = True
        (_, _, _, tc_star, _, mg_star, _) = self._target_head_arrays(target)
        out = self.pipe.encoder.apply(
            self.pipe.enc_params, jnp.asarray(idx), jnp.asarray(frac),
            jnp.asarray(mask), jnp.asarray(mg_star[None]),
            jnp.asarray(np.asarray([tc_star], np.float32)),
            method=MaterialsEncoder.encode)
        return out['z']

    def oracle_reconstruct(self, target: str,
                           type_masks: Optional[jnp.ndarray] = None
                           ) -> Optional[Tuple[str, jnp.ndarray]]:
        """Full-supervision holdout RECONSTRUCTION: encode the target's
        composition (GT fractions, full fresh-Magpie through the persisted
        quantile grids, known Tc) and greedy-decode with GROUND-TRUTH
        stoich conditioning + the encoder's head vector — the SAME
        conditioning convention as the standard AR eval and the reference
        (stoich_cond_tf=1.0, train_v12_clean.py:464; its inference uses the
        fraction head only for *generative* latents).

        Why not decode through ``decode_latents`` (heads_from_z): the
        round-4 bisect (`scripts/oracle_bisect.py`) showed the oracle z is
        bit-identical (max |dz| = 0.0) to the corpus-row z, yet
        predicted-stoich decode reconstructed 0/24 training rows that the
        eval path reconstructs at 77.5% — the decoder is hypersensitive to
        stoich-conditioning error, and GT stoich is inside the oracle's
        information budget by definition (it already feeds GT Magpie+Tc).
        Returns (decoded formula, z) or None if the target can't encode."""
        from ..data.pipeline import MAX_ELEMENTS
        comp = parse_formula_composition(target)
        if not comp:
            return None
        idx = np.zeros((1, MAX_ELEMENTS), np.int32)
        frac = np.zeros((1, MAX_ELEMENTS), np.float32)
        mask = np.zeros((1, MAX_ELEMENTS), bool)
        total = sum(comp.values()) or 1.0
        for j, (el, amt) in enumerate(sorted(comp.items())[:MAX_ELEMENTS]):
            z_num = SYMBOL_TO_Z.get(el)
            if z_num is None:
                return None
            idx[0, j] = z_num
            frac[0, j] = amt / total
            mask[0, j] = True
        (_, _, _, tc_star, _, mg_star, _) = self._target_head_arrays(target)
        enc = self.pipe.encoder
        enc_out = enc.apply(
            self.pipe.enc_params, jnp.asarray(idx), jnp.asarray(frac),
            jnp.asarray(mask), jnp.asarray(mg_star[None]),
            jnp.asarray(np.asarray([tc_star], np.float32)))
        heads_vec = enc.apply(self.pipe.enc_params, enc_out,
                              method=type(enc).heads_pred_for_decoder)
        stoich = jnp.concatenate([
            jnp.asarray(frac * mask),
            jnp.asarray(mask.sum(axis=1, keepdims=True), jnp.float32)],
            axis=1)
        fs = self.pipe.decode_conditioned(enc_out['z'], stoich, heads_vec,
                                          type_masks=type_masks)
        return (fs[0] if fs else ''), enc_out['z']

    def _element_type_masks(self, target: str) -> Optional[jnp.ndarray]:
        """Type masks with the ELEMENT row restricted to the target's element
        set — the decode-time constraint for the *element-constrained* search
        mode. Builds on the decoder's hard type masking (reference:
        autoregressive_decoder.py:1415-1422); the constrained mode is an
        EXTENSION (targeted candidate generation for a known chemical
        system), reported separately from the reference-comparable
        unconstrained number."""
        tok = self.pipe.tokenizer
        if tok.type_masks is None:
            return None
        from ..tokenizer.fraction_tokenizer import (
            ELEMENT_TOKEN_START, TOKEN_TYPE_ELEMENT,
        )
        masks = np.array(tok.type_masks)
        allowed = np.zeros(masks.shape[1], bool)
        for el in parse_formula_composition(target):
            allowed[ELEMENT_TOKEN_START + SYMBOL_TO_Z[el] - 1] = True
        masks[TOKEN_TYPE_ELEMENT] &= allowed
        return jnp.asarray(masks)

    def consistency_check(self, z: jnp.ndarray) -> Dict[str, np.ndarray]:
        """All-head self-consistency over candidate latents
        (reference: holdout_search_targeted.py:593-775 run_consistency_check):
        SC prob vs predicted Tc, SC prob vs family head, Tc value vs Tc
        bucket.  One vectorized heads_from_z pass instead of the reference's
        per-head per-batch loop.
        """
        if not hasattr(self, '_heads_fn'):
            # cached — a fresh jax.jit per call retraces encoder heads for
            # every one of the 45 targets
            self._heads_fn = jax.jit(lambda ep, zz: self.pipe.encoder.apply(
                ep, zz, method=MaterialsEncoder.heads_from_z))
        heads = self._heads_fn(self.pipe.enc_params, z)
        tc_k = np.asarray(self.pipe.ds.norm_stats.tc_to_kelvin(
            np.asarray(heads['tc_pred'], np.float64)))
        sc_p = np.asarray(jax.nn.sigmoid(heads['sc_pred']))
        fam = np.asarray(heads['family_composed_14'].argmax(-1))
        bucket = np.asarray(heads['tc_class_logits'].argmax(-1))
        exp_bucket = np.digitize(tc_k, [0.0, 10.0, 50.0, 100.0])
        sc_tc = (((sc_p < 0.5) & (tc_k > 5.0))
                 | ((sc_p > 0.8) & (tc_k <= 0.0)))
        # family index 0 = NOT_SUPERCONDUCTOR in the composed-14 layout
        sc_family = (((sc_p < 0.5) & (fam != 0))
                     | ((sc_p > 0.8) & (fam == 0)))
        tc_bucket = np.abs(exp_bucket - bucket) > 1
        return {'sc_tc_mismatch': sc_tc, 'sc_family_mismatch': sc_family,
                'tc_bucket_mismatch': tc_bucket,
                'tc_pred_kelvin': tc_k, 'sc_prob': sc_p}

    def search(self, budget_per_target: int = 200, seed: int = 0,
               targets: Optional[List[str]] = None,
               temperature_sweep: tuple = (0.0, 0.3, 0.7),
               check_consistency: bool = True,
               refine_rounds: int = 2,
               guided: bool = True,
               guided_starts: int = 16,
               inversion: bool = True,
               inversion_starts: int = 24,
               inversion_steps: int = 384,
               inverse_regression: bool = True,
               oracle_diagnostic: bool = True,
               constrain_elements: bool = False,
               sample_slice: int = 4096,
               sample_draws: int = 2,
               decode_chunk: int = 2048,
               target_offset: int = 0,
               strategy_order: str = 'tiered',
               snap_stoich: bool = True,
               log_fn=print,
               stream_fn=None) -> List[HoldoutResult]:
        """``refine_rounds``: zoom-in passes re-seeding a fine perturbation
        sweep around the best candidate's latent centroid (the reference's
        targeted search does the same around promising matches,
        holdout_search_targeted.py:441-545).

        ``strategy_order`` controls information-budget stratification:

        - ``'tiered'`` (default, the honest reporting protocol): strategies
          run in escalating information tiers — *navigation* (pool +
          perturbation-only refine; only the target's element set picks
          anchors, matching the reference's information budget,
          holdout_search_targeted.py:364-545) -> *guided* (head-guided
          descent + inverse regression, which consume the target's exact
          fractions / Magpie / Tc) -> *inversion* (TF-CE descent on the
          exact target token sequence).  Each tier only starts if the
          previous one failed to land an exact match, so
          ``HoldoutResult.exact_tier`` cleanly attributes every exact to
          the weakest information budget that achieved it, and navigation-
          tier refine never zooms in on latents produced by an
          information-advantaged strategy.
        - ``'inversion_first'``: the legacy speed ordering (inversion runs
          first because it lands most often and an early hit skips the
          expensive pool).  ``exact_tier`` is then attributed from
          ``found_by`` alone, which is ambiguous for 'refine' hits.

        Temperature protocol at scale (reference run 2 decodes every
        candidate greedily and temperature-samples a seed subset,
        HOLDOUT_SEARCH_TECHNIQUE_REPORT.md §3): the FULL pool decodes at
        ``temperature_sweep[0]`` (greedy); the remaining temperatures decode
        only the leading ``sample_slice`` rows — the same-set sweeps and
        dopant blends the pool deliberately fronts — ``sample_draws`` times
        each with fresh rngs.

        ``target_offset``: absolute index of ``targets[0]`` within the full
        holdout list — keeps per-target rng folds identical whether the 45
        targets run in one process or sharded across several (the axon
        PJRT client leaks host memory per dispatch, so long campaigns run
        as sequential per-window subprocesses)."""
        cache = self.pipe.analyzer.build_cache(self.pipe.ds)
        results = []
        rng = jax.random.PRNGKey(seed)
        # exact match is COMPOSITION-level: generated formulas are in
        # the tokenizer's canonical order (sorted elements, GCD p/q)
        # while holdout targets keep their source notation, so a string
        # compare would never fire (reference holdout_search.py:546-566
        # compares raw strings because its corpus preserves order)
        for t_i, target in enumerate(targets or self.targets):
            t_start = time.perf_counter()
            t_rng = jax.random.fold_in(rng, target_offset + t_i)
            tkey = canonical_composition_key(target)

            pool_z: List[np.ndarray] = []      # latent pool, concatenated
            by_formula: Dict[str, list] = {}   # formula -> latent pool rows
            scores: Dict[str, tuple] = {}      # formula -> (sim, is_exact),
                                               # computed once at insertion
            first_label: Dict[str, str] = {}   # formula -> producing strategy

            tmask = (self._element_type_masks(target)
                     if constrain_elements else None)

            def decode_into_pool(zc, temps, rng_, label='pool',
                                 pure_greedy=False):
                offset = sum(len(p) for p in pool_z)
                pool_z.append(np.asarray(zc))
                for s, temp in enumerate(temps):
                    greedy = temp < 0.01
                    z_use = zc if greedy else zc[:sample_slice]
                    for d in range(1 if greedy else sample_draws):
                        fs = self.pipe.decode_latents(
                            z_use, temperature=temp,
                            rng=jax.random.fold_in(rng_, s * 131 + d),
                            type_masks=tmask, chunk=decode_chunk,
                            pure_greedy=pure_greedy,
                            snap_stoich=snap_stoich)
                        for j, f in enumerate(fs):
                            if f:
                                by_formula.setdefault(f, []).append(offset + j)
                                first_label.setdefault(f, label)
                                if f not in scores:
                                    is_exact = (
                                        tkey is not None
                                        and canonical_composition_key(f)
                                        == tkey)
                                    sim = (1.0 if is_exact
                                           else element_similarity(f, target))
                                    scores[f] = (sim, is_exact)

            def score():
                best, best_sim, best_exact = '', 0.0, False
                for f, (sim, is_exact) in scores.items():
                    if sim > best_sim or (is_exact and not best_exact):
                        best, best_sim, best_exact = f, sim, is_exact
                return best, best_sim, best_exact

            best, best_sim, best_exact = '', 0.0, False
            inv_diag = None
            tier_sim: Dict[str, float] = {}
            exact_tier: Optional[str] = None

            def merge_inv_diag():
                nonlocal inv_diag
                d = getattr(self, 'last_inversion_diag', None)
                if d is None:
                    return
                if inv_diag is None:
                    inv_diag = dict(d)
                else:
                    inv_diag['tf_ce_min'] = min(inv_diag['tf_ce_min'],
                                                d['tf_ce_min'])
                    inv_diag['tf_argmax_max'] = max(
                        inv_diag['tf_argmax_max'], d['tf_argmax_max'])
                    inv_diag['tf_argmax_full'] += d['tf_argmax_full']

            def best_centroid():
                all_z = np.concatenate(pool_z)
                return jnp.asarray(
                    all_z[np.asarray(by_formula[best])].mean(axis=0))

            fine_n = min(max(budget_per_target // 2, 8), 8192)

            def run_pool():
                z = self._candidate_latents(target, cache,
                                            budget_per_target, t_rng)
                decode_into_pool(z, temperature_sweep, t_rng)
                return score()

            def run_navigation_refine(r):
                # perturbation-only zoom-in around the best candidate —
                # stays inside the navigation information budget
                fine = perturb(jnp.tile(best_centroid()[None], (fine_n, 1)),
                               jax.random.fold_in(t_rng, 100 + r),
                               0.01 * (r + 1))
                decode_into_pool(fine, (0.0, 0.3),
                                 jax.random.fold_in(t_rng, 200 + r),
                                 label='refine')
                return score()

            def run_guided(anchors, suffix=0):
                # both slot conventions: corpus-alphabetical (matches the
                # head's training order) and permutation-free sorted
                zg = self.head_guided_latents(target, anchors)
                decode_into_pool(zg, (0.0,),
                                 jax.random.fold_in(t_rng, 999 - suffix),
                                 label='guided')
                zg = self.head_guided_latents(target, anchors,
                                              order_free=True)
                decode_into_pool(zg, (0.0,),
                                 jax.random.fold_in(t_rng, 979 - suffix),
                                 label='guided')
                return score()

            def run_inverse_regression(r=0):
                zi = self._inverse_regression_latents(
                    target, pool_z, by_formula,
                    jax.random.fold_in(t_rng, 500 + r), best=best)
                if zi is not None:
                    decode_into_pool(zi, (0.0, 0.3),
                                     jax.random.fold_in(t_rng, 530 + r),
                                     label='inverse_regression')
                return score()

            def run_inversion(z_seed, fold):
                self.last_inversion_diag = None
                zi = self._inversion_safe(target, z_seed,
                                          steps=inversion_steps)
                merge_inv_diag()
                if zi is None:
                    return score()
                decode_into_pool(zi, (0.0,),
                                 jax.random.fold_in(t_rng, fold),
                                 label='inversion')
                b, s, e = score()
                if not e:
                    # ungated argmax rollout: equals the TF-argmax
                    # diagnostic by induction — catches targets whose
                    # stop head fires early under the boosted decode
                    decode_into_pool(zi, (0.0,),
                                     jax.random.fold_in(t_rng, fold + 3),
                                     label='inversion_pure',
                                     pure_greedy=True)
                    b, s, e = score()
                if not e:
                    # small greedy fan around the final states: argmax
                    # ties at the CE optimum sit on basin boundaries
                    fin = zi[-inversion_starts:]
                    reps = max(256 // max(len(fin), 1), 1)
                    fan = perturb(jnp.tile(fin, (reps, 1)),
                                  jax.random.fold_in(t_rng, fold + 1), 0.004)
                    decode_into_pool(fan, (0.0,),
                                     jax.random.fold_in(t_rng, fold + 2),
                                     label='inversion')
                    b, s, e = score()
                    if not e:
                        decode_into_pool(
                            fan, (0.0,),
                            jax.random.fold_in(t_rng, fold + 4),
                            label='inversion_pure', pure_greedy=True)
                        b, s, e = score()
                return b, s, e

            if strategy_order == 'tiered':
                # ---- tier 1: NAVIGATION (reference information parity) ----
                best, best_sim, best_exact = run_pool()
                for r in range(refine_rounds):
                    if best_exact or not best:
                        break
                    best, best_sim, best_exact = run_navigation_refine(r)
                tier_sim['navigation'] = best_sim
                if best_exact:
                    exact_tier = 'navigation'

                # ---- tier 2: GUIDED (target-property supervision) ----
                if not best_exact and (guided or inverse_regression):
                    if guided:
                        best, best_sim, best_exact = run_guided(
                            self._anchor_latents(target, cache,
                                                 n=guided_starts))
                    if inverse_regression and not best_exact:
                        best, best_sim, best_exact = run_inverse_regression()
                    for r in range(refine_rounds):
                        if best_exact or not best:
                            break
                        if guided:
                            best, best_sim, best_exact = run_guided(
                                perturb(jnp.tile(best_centroid()[None],
                                                 (guided_starts, 1)),
                                        jax.random.fold_in(t_rng, 300 + r),
                                        0.01), suffix=2 * r + 2)
                        if inverse_regression and not best_exact:
                            best, best_sim, best_exact = \
                                run_inverse_regression(r + 1)
                    tier_sim['guided'] = best_sim
                    if best_exact and exact_tier is None:
                        exact_tier = 'guided'

                # ---- tier 3: INVERSION (decoder invertibility) ----
                if not best_exact and inversion:
                    best, best_sim, best_exact = run_inversion(
                        self._anchor_latents(target, cache,
                                             n=inversion_starts), 600)
                    for r in range(refine_rounds):
                        if best_exact or not best:
                            break
                        best, best_sim, best_exact = run_inversion(
                            perturb(jnp.tile(best_centroid()[None],
                                             (inversion_starts, 1)),
                                    jax.random.fold_in(t_rng, 700 + r),
                                    0.02), 710 + 10 * r)
                    tier_sim['inversion'] = best_sim
                    if best_exact and exact_tier is None:
                        exact_tier = 'inversion'
            else:
                # legacy speed ordering: inversion first (most likely to
                # land an exact hit; an early success skips the pool)
                if inversion:
                    best, best_sim, best_exact = run_inversion(
                        self._anchor_latents(target, cache,
                                             n=inversion_starts), 600)
                if not best_exact:
                    best, best_sim, best_exact = run_pool()
                if guided and not best_exact:
                    best, best_sim, best_exact = run_guided(
                        self._anchor_latents(target, cache, n=guided_starts))
                if inverse_regression and not best_exact:
                    best, best_sim, best_exact = run_inverse_regression()
                for r in range(refine_rounds):
                    if best_exact or not best:
                        break
                    best, best_sim, best_exact = run_navigation_refine(r)
                    if inversion and not best_exact:
                        # inversion re-seeded from the best-match basin:
                        # corpus anchors may sit too far from a valid basin,
                        # the best match's latent centroid rarely does
                        best, best_sim, best_exact = run_inversion(
                            perturb(jnp.tile(best_centroid()[None],
                                             (inversion_starts, 1)),
                                    jax.random.fold_in(t_rng, 700 + r),
                                    0.02), 710 + 10 * r)
                    if guided and not best_exact:
                        best, best_sim, best_exact = run_guided(
                            perturb(jnp.tile(best_centroid()[None],
                                             (guided_starts, 1)),
                                    jax.random.fold_in(t_rng, 300 + r),
                                    0.01), suffix=2 * r + 2)
                    if inverse_regression and not best_exact:
                        best, best_sim, best_exact = \
                            run_inverse_regression(r + 1)
                if best_exact:
                    exact_tier = {
                        'pool': 'navigation', 'refine': 'mixed',
                        'guided': 'guided', 'inverse_regression': 'guided',
                        'inversion': 'inversion',
                        'inversion_pure': 'inversion',
                    }.get(first_label.get(best) or '', 'mixed')

            oracle_f = oracle_m = None
            oracle_masks = None
            if oracle_diagnostic:
                rec = self.oracle_reconstruct(target, type_masks=tmask)
                if rec is not None:
                    oracle_f = rec[0]
                    oracle_m = bool(
                        tkey is not None and oracle_f
                        and canonical_composition_key(oracle_f) == tkey)
                    # protocol provenance: which type-mask convention the
                    # oracle decode used, so oracle numbers are comparable
                    # across the campaign and the standalone --oracle-only
                    # script (they historically differed silently)
                    oracle_masks = ('element-constrained' if tmask is not None
                                    else 'generic')

            consistent = True
            cons_info = None
            if check_consistency and best:
                all_z = np.concatenate(pool_z)
                cen = jnp.asarray(
                    all_z[np.asarray(by_formula[best])].mean(axis=0))[None]
                c = self.consistency_check(cen)
                consistent = not (c['sc_tc_mismatch'][0]
                                  or c['sc_family_mismatch'][0]
                                  or c['tc_bucket_mismatch'][0])
                cons_info = {'tc_pred_kelvin': float(c['tc_pred_kelvin'][0]),
                             'sc_prob': float(c['sc_prob'][0])}
            results.append(HoldoutResult(
                target=target, best_match=best, exact=best_exact,
                best_similarity=best_sim, n_candidates=len(by_formula),
                consistent=consistent, consistency=cons_info,
                oracle_formula=oracle_f, oracle_match=oracle_m,
                oracle_masks=oracle_masks,
                found_by=first_label.get(best),
                exact_tier=exact_tier, tier_sim=tier_sim or None,
                inversion_diag=inv_diag,
                wall_s=round(time.perf_counter() - t_start, 2)))
            log_fn(f'[{target_offset + t_i + 1}] {target}: '
                   f'best={best!r} sim={best_sim:.3f} '
                   f'{"EXACT[" + str(exact_tier) + "/" + str(first_label.get(best)) + "]" if best_exact else ""}'
                   f'{"" if consistent else " INCONSISTENT"}'
                   f'{" oracle=Y" if oracle_m else ""}')
            if stream_fn is not None:
                # durably record each finished target (a campaign killed
                # mid-window otherwise loses every completed search in it)
                stream_fn(target_offset + t_i, results[-1])
        return results

    @staticmethod
    def summarize(results: List[HoldoutResult]) -> Dict[str, float]:
        n = len(results)
        nav = sum(r.exact_tier == 'navigation' for r in results)
        gui = sum(r.exact_tier == 'guided' for r in results)
        inv = sum(r.exact_tier == 'inversion' for r in results)
        return {
            'n_targets': n,
            'exact': sum(r.exact for r in results),
            # information-budget stratification (see HoldoutResult.exact_tier)
            # — 'exact_navigation' is the number comparable to the
            # reference's 12/45 protocol; the *_cum rows are cumulative
            'exact_navigation': nav,
            'exact_guided_cum': nav + gui,
            'exact_inversion_cum': nav + gui + inv,
            'exact_tier_unattributed': sum(
                r.exact and r.exact_tier in (None, 'mixed') for r in results),
            'sim_ge_99': sum(r.best_similarity >= 0.99 for r in results),
            'sim_ge_95': sum(r.best_similarity >= 0.95 for r in results),
            'mean_similarity': float(np.mean([r.best_similarity
                                              for r in results])) if n else 0.0,
            'consistent': sum(r.consistent for r in results),
            # diagnostic only — direct-encode reconstruction, NOT counted
            # in 'exact' (see HoldoutResult.oracle_match)
            'oracle_match': sum(bool(r.oracle_match) for r in results),
        }
