"""Physics-Z supervision: tie named latent coordinates to physical targets.

Capability parity with the reference ``PhysicsZLoss``
(reference: src/superconductor/losses/z_supervision_loss.py:367-446), compact
jnp form.  Sub-losses:

  comp      — Block 8 coords supervised against the 15 compositional targets
  magpie    — Block 11 (450-512) supervised against a LEARNABLE linear
              projection of the Magpie features, trained jointly with the
              encoder exactly as the reference's ``MagpieEncodingLoss``
              (reference: src/superconductor/losses/z_supervision_loss.py:52-76
              — an ``nn.Linear(magpie_dim, 62)`` inside the loss module).
              Init with ``init_magpie_proj`` and pass the params via
              ``proj_params``; with ``proj_params=None`` a deterministic
              seeded isometry is used instead (parameter-free fallback for
              eval/analysis paths that carry no loss-module state)
  thermo    — z[TC] consistency with the normalized input Tc, transition
              width non-negativity
  gl/bcs    — internal consistency: kappa ~ lambda_L/xi, Hc2 >= Hc1,
              gap ratio soft-anchored at the BCS value
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import physics_z as PZ


@dataclasses.dataclass(frozen=True)
class PhysicsZConfig:
    comp_weight: float = 1.0
    magpie_weight: float = 0.5
    consistency_weight: float = 0.1
    new_consistency_weight: float = 0.05


def _magpie_projection(magpie_dim: int, out_dim: int = 62) -> np.ndarray:
    """Deterministic near-isometric projection magpie -> Block 11 coords."""
    rng = np.random.default_rng(1234)
    m = rng.normal(0, 1, (magpie_dim, out_dim)).astype(np.float32)
    # unit-norm columns for a stable target scale (true orthonormality is
    # impossible when out_dim > magpie_dim)
    m /= np.linalg.norm(m, axis=0, keepdims=True) + 1e-8
    return m


_PROJ_CACHE: Dict[int, np.ndarray] = {}


def init_magpie_proj(rng, magpie_dim: int, out_dim: int = 62) -> Dict[str, jnp.ndarray]:
    """Learnable Linear(magpie_dim -> out_dim) params.

    Matches torch ``nn.Linear`` default init (kaiming-uniform weight, uniform
    bias, both bounded by 1/sqrt(fan_in)) so converted reference checkpoints
    and fresh runs start from the same distribution.
    """
    bound = 1.0 / float(np.sqrt(magpie_dim))
    k1, k2 = jax.random.split(rng)
    return {
        'kernel': jax.random.uniform(
            k1, (magpie_dim, out_dim), jnp.float32, -bound, bound),
        'bias': jax.random.uniform(
            k2, (out_dim,), jnp.float32, -bound, bound),
    }


def _huber(pred: jnp.ndarray, target: jnp.ndarray,
           delta: float = 1.0) -> jnp.ndarray:
    """SmoothL1 (the reference uses nn.SmoothL1Loss throughout for
    robustness to large initial deviations)."""
    d = pred - target
    a = jnp.abs(d)
    return jnp.where(a < delta, 0.5 * d * d / delta, a - 0.5 * delta).mean()


def _c(x: jnp.ndarray, lo: float = -100.0, hi: float = 100.0) -> jnp.ndarray:
    """Clamp derived targets: prevents gradient explosions while Z coords
    are still randomly distributed (reference: z_supervision_loss.py:92-95)."""
    return jnp.clip(x, lo, hi)


def gl_consistency(z: jnp.ndarray) -> jnp.ndarray:
    """Ginzburg-Landau identities (reference: z_supervision_loss.py:78-131):
    kappa=lam/xi, Hc~1/(lam*xi), Hc2~1/xi^2, E_cond~Hc^2,
    Hc1~ln(kappa)/lam^2."""
    xi = jnp.clip(z[:, PZ.XI], 0.01)
    lam = jnp.clip(z[:, PZ.LAMBDA_L], 0.01)
    kappa = z[:, PZ.KAPPA]
    hc = z[:, PZ.HC]
    loss = _huber(kappa, _c(lam / xi))
    loss += _huber(hc, _c(1.0 / (lam * xi)))
    loss += _huber(z[:, PZ.HC2], _c(1.0 / xi ** 2))
    loss += _huber(z[:, PZ.E_COND],
                   _c(jax.lax.stop_gradient(hc) ** 2))
    loss += _huber(z[:, PZ.HC1],
                   _c(jnp.log(jnp.clip(kappa, 1.01)) / lam ** 2))
    return loss


def bcs_consistency(z: jnp.ndarray) -> jnp.ndarray:
    """BCS identities (reference: :134-161): xi~v_F/Delta0, gap ratio
    soft-bounded to [1, 5]."""
    vf = jnp.clip(z[:, PZ.V_F], 0.01)
    d0 = jnp.clip(z[:, PZ.DELTA0], 0.01)
    gap = z[:, PZ.GAP_RATIO]
    loss = _huber(z[:, PZ.XI], _c(vf / d0))
    loss += jnp.clip(gap - 5.0, 0.0).mean() + jnp.clip(1.0 - gap, 0.0).mean()
    return loss


def cobordism_consistency(z: jnp.ndarray) -> jnp.ndarray:
    """Block 9 defect energies from GL parameters (reference: :163-205):
    E_vortex~ln(kappa)/lam^2, E_domain=sigma_ns, type=kappa-1/sqrt(2),
    E_defect_min=min(defect energies)."""
    kappa = z[:, PZ.KAPPA]
    lam = jnp.clip(z[:, PZ.LAMBDA_L], 0.01)
    ev, ed = z[:, PZ.E_VORTEX], z[:, PZ.E_DOMAIN]
    loss = _huber(ev, _c(jnp.log(jnp.clip(kappa, 1.01)) / lam ** 2))
    loss += _huber(ed, z[:, PZ.SIGMA_NS])
    loss += _huber(z[:, PZ.TYPE_I_II],
                   jax.lax.stop_gradient(kappa) - 2.0 ** -0.5)
    e_min = jnp.minimum(jax.lax.stop_gradient(ev),
                        jax.lax.stop_gradient(ed))
    loss += _huber(z[:, PZ.E_DEFECT_MIN], e_min)
    return loss


def ratio_consistency(z: jnp.ndarray) -> jnp.ndarray:
    """Block 10 cross-block ratios (reference: :208-228): Tc/Theta_D and
    xi/l_mfp."""
    loss = _huber(z[:, PZ.TC_THETA_D],
                  _c(z[:, PZ.TC] / jnp.clip(z[:, PZ.THETA_D], 0.01)))
    loss += _huber(z[:, PZ.XI_L],
                   _c(z[:, PZ.XI] / jnp.clip(z[:, PZ.L_MFP], 0.01)))
    return loss


def thermo_consistency(z: jnp.ndarray,
                       tc_normalized: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Block 7 (reference: :231-283): z[TC] matches the input Tc, onset >=
    midpoint >= zero ordering hinge, Delta_Tc = onset - zero identity."""
    onset, mid = z[:, PZ.TC_ONSET], z[:, PZ.TC_MIDPOINT]
    zero = z[:, PZ.TC_ZERO]
    loss = jnp.asarray(0.0)
    if tc_normalized is not None:
        loss += _huber(z[:, PZ.TC], tc_normalized)
    loss += jnp.clip(mid - onset, 0.0).mean()
    loss += jnp.clip(zero - mid, 0.0).mean()
    loss += _huber(z[:, PZ.DELTA_TC],
                   jax.lax.stop_gradient(onset) - jax.lax.stop_gradient(zero))
    return loss


def structural_consistency(z: jnp.ndarray) -> jnp.ndarray:
    """Block 5 (reference: :286-307): volume ~ a*b*c."""
    a = jnp.clip(z[:, PZ.LATTICE_A], 0.01)
    b = jnp.clip(z[:, PZ.LATTICE_B], 0.01)
    c = jnp.clip(z[:, PZ.LATTICE_C], 0.01)
    return _huber(z[:, PZ.VOLUME], _c(a * b * c))


def electronic_consistency(z: jnp.ndarray) -> jnp.ndarray:
    """Block 6 (reference: :309-333): Drude weight ~ plasma_freq^2."""
    plasma = jax.lax.stop_gradient(z[:, PZ.PLASMA_FREQ])
    return _huber(z[:, PZ.DRUDE_WEIGHT], _c(plasma ** 2))


def physics_z_loss(
    z: jnp.ndarray,                 # [B, 2048]
    comp_targets: jnp.ndarray,      # [B, 15] normalized
    magpie: jnp.ndarray,            # [B, M] normalized
    tc_normalized: jnp.ndarray,     # [B]
    cfg: PhysicsZConfig = PhysicsZConfig(),
    proj_params: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    coords = jnp.asarray(PZ.COMP_COORDS)
    z_comp = z[:, coords]                                   # [B, 15]
    comp = ((z_comp - comp_targets) ** 2).mean()

    start, end = PZ.block('magpie')
    if proj_params is not None:
        # learnable projection, trained jointly (reference parity)
        target = magpie @ proj_params['kernel'] + proj_params['bias']
    else:
        m_dim = magpie.shape[1]
        if m_dim not in _PROJ_CACHE:
            _PROJ_CACHE[m_dim] = _magpie_projection(m_dim)
        target = magpie @ jnp.asarray(_PROJ_CACHE[m_dim])   # [B, 62]
    mag = ((z[:, start:end] - target) ** 2).mean()

    gl = gl_consistency(z)
    bcs = bcs_consistency(z)
    cob = cobordism_consistency(z)
    ratios = ratio_consistency(z)
    thermo = thermo_consistency(z, tc_normalized)
    struct = structural_consistency(z)
    elec = electronic_consistency(z)
    consistency = gl + bcs + cob + ratios
    new_consistency = thermo + struct + elec

    total = (cfg.comp_weight * comp + cfg.magpie_weight * mag
             + cfg.consistency_weight * consistency
             + cfg.new_consistency_weight * new_consistency)
    return {
        'total': total, 'comp': comp, 'magpie': mag,
        'gl': gl, 'bcs': bcs, 'cobordism': cob, 'ratios': ratios,
        'thermo': thermo, 'structural': struct, 'electronic': elec,
        'consistency': consistency,
    }
