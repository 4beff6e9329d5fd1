"""Candidate latent generation strategies.

Capability parity with the reference ``CandidateGenerator``
(reference: src/superconductor/generation/candidate_generator.py:44-499):
latent gradient ascent on predicted Tc, cluster-center sampling,
interpolation, and evolutionary refinement — each one a jitted/vmapped
program instead of per-candidate Python loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import MaterialsEncoder
from .latent import interpolation_sweep, perturb


class CandidateGenerator:
    def __init__(self, encoder: MaterialsEncoder, enc_params):
        self.encoder = encoder
        self.enc_params = enc_params

        # params are jit ARGUMENTS (constants would bloat the program)
        def tc_of_z(params, z):
            out = encoder.apply(params, z, method=MaterialsEncoder.decode)
            return out['tc_pred'].sum(), out['tc_pred']

        _grad = jax.jit(jax.grad(lambda p, z: tc_of_z(p, z)[0], argnums=1))
        _pred = jax.jit(lambda p, z: tc_of_z(p, z)[1])
        self._tc_grad = lambda z: _grad(self.enc_params, z)
        self._tc_pred = lambda z: _pred(self.enc_params, z)

    def gradient_ascent_tc(self, z_init: jnp.ndarray, steps: int = 20,
                           lr: float = 0.5,
                           max_norm_growth: float = 1.3) -> jnp.ndarray:
        """Push latents toward higher predicted Tc, norm-trust-region bounded
        so candidates stay on the data manifold."""
        z0_norm = jnp.linalg.norm(z_init, axis=-1, keepdims=True)
        encoder = self.encoder

        @jax.jit
        def run(params, z, z0_norm):
            def tc_sum(zz):
                out = encoder.apply(params, zz,
                                    method=MaterialsEncoder.decode)
                return out['tc_pred'].sum()

            def body(_, z):
                g = jax.grad(tc_sum)(z)
                z = z + lr * g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8)
                norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
                cap = z0_norm * max_norm_growth
                return jnp.where(norm > cap, z * cap / norm, z)
            return jax.lax.fori_loop(0, steps, body, z)

        return run(self.enc_params, z_init, z0_norm)

    def sample_clusters(self, centers: np.ndarray, n_per_cluster: int,
                        sigma: float, rng: jax.Array) -> jnp.ndarray:
        """Gaussian sampling around cluster centers. [K*n, latent]."""
        centers = jnp.asarray(centers)
        reps = jnp.repeat(centers, n_per_cluster, axis=0)
        return perturb(reps, rng, sigma)

    def interpolate_pairs(self, z_a: jnp.ndarray, z_b: jnp.ndarray,
                          n: int = 8, spherical: bool = True) -> jnp.ndarray:
        """Interpolants between high-Tc pairs, flattened. [P*n, latent]."""
        sweep = jax.vmap(lambda a, b: interpolation_sweep(a, b, n, spherical))(
            z_a, z_b)
        return sweep.reshape(-1, z_a.shape[-1])

    def evolutionary(self, z_pop: jnp.ndarray, rng: jax.Array,
                     generations: int = 5, elite_frac: float = 0.25,
                     sigma: float = 0.1) -> jnp.ndarray:
        """Evolve a latent population toward higher predicted Tc:
        select elite by tc_pred, refill with mutated crossovers."""
        n = z_pop.shape[0]
        n_elite = max(int(n * elite_frac), 2)
        encoder = self.encoder

        @jax.jit
        def gen_step(params, z, key):
            tc = encoder.apply(params, z,
                               method=MaterialsEncoder.decode)['tc_pred']
            order = jnp.argsort(-tc)
            elite = z[order[:n_elite]]
            k1, k2, k3 = jax.random.split(key, 3)
            pa = elite[jax.random.randint(k1, (n - n_elite,), 0, n_elite)]
            pb = elite[jax.random.randint(k2, (n - n_elite,), 0, n_elite)]
            alpha = jax.random.uniform(k3, (n - n_elite, 1))
            children = alpha * pa + (1 - alpha) * pb
            children = perturb(children, jax.random.fold_in(key, 7), sigma)
            return jnp.concatenate([elite, children], axis=0)

        z = z_pop
        for g in range(generations):
            z = gen_step(self.enc_params, z, jax.random.fold_in(rng, g))
        return z

    def predicted_tc(self, z: jnp.ndarray) -> np.ndarray:
        return np.asarray(self._tc_pred(z))
