"""Rational snap of predicted stoichiometry conditioning.

Round-4 root cause (scripts/oracle_bisect.py, results/run5/oracle_*.json):
for a latent whose z is BIT-IDENTICAL to a corpus row's, decoding with the
fraction head's predicted stoich loses the reconstruction that ground-truth
stoich conditioning recovers — the decoder is hypersensitive to small
conditioning error in the 13-dim stoich vector.  Corpus stoich values are
exact rationals (normalized element shares of (p/q)-amount formulas), so the
head's predictions sit a small ε away from a low-denominator rational.
Snapping each slot to its best bounded-denominator rational removes that ε
exactly whenever the head is within half a grid step — the inference-time
analogue of the reference's FractionCorrector denominator snapping
(reference: postprocessing/fraction_corrector.py:45-120), applied to decode
CONDITIONING instead of decoded output.

Fully jit-compatible: a fixed candidate-denominator scan (no data-dependent
shapes), usable inside the batched decode programs of
``SuperconductorDiscoveryPipeline.decode_latents``.
"""

from __future__ import annotations

import jax.numpy as jnp

# candidate denominators for normalized SHARES: all integers up to 64 (a
# share's denominator is the formula's total amount scale, e.g. 2/13 for
# Cu in YBa2Cu3O7) plus the training vocab's larger common denominators
_SNAP_DENOMS = tuple(range(1, 65)) + (80, 100, 125, 200, 250, 1000)


def rational_snap_stoich(stoich: jnp.ndarray,
                         tol: float = 2.5e-3) -> jnp.ndarray:
    """Snap a [B, 13] stoich conditioning vector (12 normalized fraction
    slots + element count) onto the rational grid.

    Each slot share is replaced by the SMALLEST-denominator rational p/q
    within ``tol`` of it (the classic best-rational rule: prefer the
    simplest fraction the measurement is consistent with; ``tol`` is sized
    to the fraction head's observed prediction noise).  If no candidate is
    within tol the slot keeps its minimum-error candidate (≈ the raw
    value).  Shares are renormalized to sum to 1 over nonzero slots and
    the trailing element count is rounded to the nearest integer in
    [1, 12].  Identity for inputs already on the grid — teacher-forced
    conditioning (ground-truth stoich) passes through unchanged, so the
    snap can default-on in inference paths.
    """
    frac = stoich[:, :-1]                                  # [B, 12]
    count = stoich[:, -1:]                                 # [B, 1]
    q = jnp.asarray(_SNAP_DENOMS, jnp.float32)             # [Q] ascending
    p = jnp.round(frac[..., None] * q)                     # [B, 12, Q]
    cand = p / q
    err = jnp.abs(cand - frac[..., None])
    within = err <= tol
    # argmax picks the FIRST True (q ascending => smallest denominator)
    first_ok = jnp.argmax(within, axis=-1)
    best = jnp.where(within.any(axis=-1), first_ok,
                     jnp.argmin(err, axis=-1))             # [B, 12]
    snapped = jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
    snapped = jnp.clip(snapped, 0.0, 1.0)
    total = jnp.sum(snapped, axis=-1, keepdims=True)
    # if every slot snapped to zero (degenerate head output), fall back to
    # the raw predictions rather than emitting NaNs
    snapped = jnp.where(total > 0, snapped / jnp.maximum(total, 1e-9), frac)
    count_r = jnp.clip(jnp.round(count), 1.0, float(frac.shape[1]))
    return jnp.concatenate([snapped, count_r], axis=1)
