"""Golden-value and invariant tests for rewards, constraints, and the
17-term multitask loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superconductor_vae_tpu.tokenizer import default_tokenizer, EOS_ID, PAD_ID
from superconductor_vae_tpu.ops.reward import RewardConfig, compute_reward
from superconductor_vae_tpu.ops.constraints import (
    ConstraintConfig, constraint_rewards, charge_balance_loss,
    site_occupancy_loss,
)
from superconductor_vae_tpu.ops.losses import (
    LossConfig, focal_ce_per_sample, tc_loss_per_sample, tc_class_targets,
    site_dup_targets, multitask_loss, tc_kelvin,
)
from superconductor_vae_tpu.ops.token_stats import element_amounts

TOK = default_tokenizer(max_len=30)
LUTS = {
    'fraction_values': jnp.asarray(TOK.fraction_value_table),
    'token_value_table': jnp.asarray(TOK.token_value_table),
    'token_to_z': jnp.asarray(TOK.token_to_element_z),
    'type_masks': jnp.asarray(TOK.type_masks),
    'type_table': jnp.asarray(TOK.token_type_table),
}


def enc(formula, t=12):
    ids = TOK.encode(formula, add_bos_eos=True, pad=False)[1:]  # drop BOS
    ids = ids + [PAD_ID] * (t - len(ids))
    return jnp.asarray([ids[:t]], jnp.int32)


def seq_mask(tokens):
    from superconductor_vae_tpu.generation import sequence_mask
    return sequence_mask(tokens)


class TestReward:
    def test_exact_match(self):
        t = enc('YBa2Cu3O7')
        r = compute_reward(t, t, seq_mask(t),
                           fraction_values=LUTS['fraction_values'])
        assert float(r[0]) == 100.0

    def test_monotonic_in_errors(self):
        target = enc('Bi2Sr2CaCu2O8')
        rewards = []
        for n_wrong in range(4):
            s = np.array(target)
            for i in range(n_wrong):
                s[0, i] = TOK.token_id('K')  # wrong element
            r = compute_reward(jnp.asarray(s), target, seq_mask(target),
                               fraction_values=LUTS['fraction_values'])
            rewards.append(float(r[0]))
        assert rewards[0] == 100.0
        assert all(a > b for a, b in zip(rewards, rewards[1:]))

    def test_length_only_error(self):
        """Perfect prefix + extra tokens after END gets the high length-only
        reward tier, not the generic continuous reward."""
        target = enc('MgB2', t=10)
        s = np.array(target)
        # sampled: same prefix but keeps going past where target ended
        end_pos = int(np.argmax(np.array(target[0]) == EOS_ID))
        s[0, end_pos] = TOK.token_id('O')
        s[0, end_pos + 1] = EOS_ID
        mask = np.array(seq_mask(target))
        mask[0, end_pos:end_pos + 2] = 1.0
        r = compute_reward(jnp.asarray(s), target, jnp.asarray(mask),
                           fraction_values=LUTS['fraction_values'])
        assert 10.0 <= float(r[0]) <= 50.0

    def test_fraction_value_scaling(self):
        """Wrong fraction with closer value is penalized less."""
        target = enc('La(4/5)CuO4')
        near = np.array(target)
        far = np.array(target)
        frac_pos = int(np.where(
            np.array(TOK.token_type_targets(np.array(target[0]))) == 2)[0][0])
        near[0, frac_pos] = TOK.token_id('FRAC:17/20') if 'FRAC:17/20' in [] else \
            TOK._frac_to_id['17/20']  # 0.85 vs 0.8
        far[0, frac_pos] = TOK._frac_to_id['1/20']    # 0.05 vs 0.8
        m = seq_mask(target)
        r_near = compute_reward(jnp.asarray(near), target, m,
                                fraction_values=LUTS['fraction_values'])
        r_far = compute_reward(jnp.asarray(far), target, m,
                               fraction_values=LUTS['fraction_values'])
        assert float(r_near[0]) > float(r_far[0])


class TestConstraints:
    def _rewards(self, formula, fam_probs=None):
        t = enc(formula, t=16)
        fam = None
        if fam_probs is not None:
            fam = jnp.zeros((1, 14)).at[0, fam_probs].set(1.0)
        return float(constraint_rewards(
            t, seq_mask(t), LUTS['token_to_z'], LUTS['token_value_table'],
            ConstraintConfig(), family_predictions=fam)[0])

    def test_a1_duplicate(self):
        assert self._rewards('CuOCu2') <= -50.0
        assert self._rewards('YBa2Cu3O7') == 0.0

    def test_a4_reducible(self):
        assert self._rewards('Mg2B4') == -10.0
        assert self._rewards('MgB2') == 0.0
        # fractions exempt
        assert self._rewards('Mg(1/2)B1') == 0.0

    def test_a7_impossible(self):
        assert self._rewards('F1Tl1') == -30.0
        # magnetic 3d comparable to Cu
        assert self._rewards('Cu2Fe2O4') <= -30.0

    def test_b1_ybco_oxygen(self):
        # YBCO family (id 2) with low oxygen
        r = self._rewards('YBa2Cu3O6', fam_probs=2)
        assert r <= -40.0
        r_ok = self._rewards('YBa2Cu3O7', fam_probs=2)
        assert r_ok == 0.0

    def test_b8_a15(self):
        assert self._rewards('Nb3Sn', fam_probs=1) == 0.0
        assert self._rewards('Nb2Sn', fam_probs=1) == -30.0

    def test_element_amounts(self):
        t = enc('YBa2Cu3O7', t=12)
        amt = element_amounts(t, seq_mask(t), LUTS['token_to_z'],
                              LUTS['token_value_table'])
        assert float(amt[0, 39]) == 1.0   # Y
        assert float(amt[0, 56]) == 2.0   # Ba
        assert float(amt[0, 29]) == 3.0   # Cu
        assert float(amt[0, 8]) == 7.0    # O

    def test_charge_balance(self):
        # MgO: +2 + -2 = 0 -> no loss; Mg2O: +4-2=2 -> loss > 0
        idx = jnp.asarray([[12, 8] + [0] * 10])
        balanced = jnp.asarray([[0.5, 0.5] + [0.0] * 10])
        unbalanced = jnp.asarray([[0.8, 0.2] + [0.0] * 10])
        mask = idx > 0
        l0 = charge_balance_loss(idx, balanced, mask)
        l1 = charge_balance_loss(idx, unbalanced, mask)
        assert float(l0) == 0.0
        assert float(l1) > 0.0


class TestLossPrimitives:
    def test_focal_ce_perfect_prediction(self):
        v = 50
        targets = jnp.asarray([[5, 6, EOS_ID, PAD_ID]])
        logits = jax.nn.one_hot(targets, v) * 100.0
        loss = focal_ce_per_sample(logits, targets, gamma=2.0, smoothing=0.0)
        assert float(loss[0]) < 1e-4

    def test_focal_downweights_easy(self):
        v = 50
        targets = jnp.asarray([[5, 6, EOS_ID, PAD_ID]])
        logits = jax.nn.one_hot(targets, v) * 3.0
        plain = focal_ce_per_sample(logits, targets, gamma=0.0, smoothing=0.0)
        focal = focal_ce_per_sample(logits, targets, gamma=2.0, smoothing=0.0)
        assert float(focal[0]) < float(plain[0])

    def test_tc_asymmetry(self):
        cfg = LossConfig(tc_mean=2.0, tc_std=1.0, tc_relative_weight=0.0,
                         tc_kelvin_weighting=False,
                         tc_bin_weights=((0.0, 1.0),))
        true = jnp.asarray([1.0])
        under = tc_loss_per_sample(jnp.asarray([0.5]), true, cfg)
        over = tc_loss_per_sample(jnp.asarray([1.5]), true, cfg)
        assert float(under[0]) > float(over[0])

    def test_tc_class_targets(self):
        k = jnp.asarray([0.0, 5.0, 30.0, 80.0, 150.0])
        t = tc_class_targets(k, (0.0, 10.0, 50.0, 100.0))
        np.testing.assert_array_equal(np.asarray(t), [0, 1, 2, 3, 4])

    def test_site_dup_targets(self):
        cu = TOK.token_id('Cu')
        o = TOK.token_id('O')
        targets = jnp.asarray([[cu, o, cu, EOS_ID, PAD_ID]])
        t = np.asarray(site_dup_targets(targets))
        np.testing.assert_array_equal(t[0], [0, 0, 1, 0, 0])


class TestMultitask:
    def _run(self, rl_loss=None):
        from superconductor_vae_tpu.models import MaterialsEncoder, FormulaDecoder
        from superconductor_vae_tpu.models.config import tiny_test_config
        from superconductor_vae_tpu.data import synthetic_dataset
        cfg = tiny_test_config()
        ds = synthetic_dataset(n=8, max_len=cfg.max_len,
                               magpie_dim=cfg.magpie_dim)
        batch = {k: jnp.asarray(v) for k, v in ds.batch(np.arange(8)).items()}
        enc_m = MaterialsEncoder(cfg)
        rng = jax.random.PRNGKey(0)
        eparams = enc_m.init(rng, batch['element_indices'],
                             batch['element_fractions'], batch['element_mask'],
                             batch['magpie'], batch['tc'])
        enc_out = enc_m.apply(eparams, batch['element_indices'],
                              batch['element_fractions'], batch['element_mask'],
                              batch['magpie'], batch['tc'])
        heads_vec = enc_m.apply(eparams, enc_out,
                                method=MaterialsEncoder.heads_pred_for_decoder)
        dec_m = FormulaDecoder(cfg)
        stoich = jnp.concatenate(
            [batch['element_fractions'],
             batch['element_mask'].sum(1, keepdims=True).astype(jnp.float32)],
            axis=1)
        dparams = dec_m.init(rng, enc_out['z'], batch['tokens'], stoich, heads_vec)
        dec_out = dec_m.apply(dparams, enc_out['z'], batch['tokens'],
                              stoich, heads_vec)
        lcfg = LossConfig(tc_mean=float(ds.norm_stats.tc_mean),
                          tc_std=float(ds.norm_stats.tc_std))
        total, metrics = multitask_loss(
            lcfg, enc_out, dec_out, batch, LUTS['type_table'],
            rl_loss=rl_loss)
        return total, metrics

    def test_multitask_finite_and_complete(self):
        total, metrics = self._run()
        assert np.isfinite(float(total))
        expected_keys = {
            'total', 'formula_loss', 'reinforce_loss', 'tc_loss',
            'magpie_loss', 'stoich_loss', 'count_loss', 'kl_loss',
            'tc_class_loss', 'z_norm_penalty', 'stop_loss', 'type_loss',
            'site_dup_loss', 'hp_loss', 'sc_loss', 'family_loss',
            'constraint_zoo_loss', 'token_accuracy', 'exact_match',
            'entropy', 'mean_reward', 'type_accuracy',
        }
        assert expected_keys <= set(metrics.keys())
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_multitask_grads_flow(self):
        # differentiability smoke: loss should be jittable and finite
        total = jax.jit(lambda: self._run()[0])()
        assert np.isfinite(float(total))


class TestPhysicsZ:
    def _inputs(self, b=4, magpie_dim=24):
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(size=(b, 2048)).astype(np.float32))
        comp = jnp.asarray(rng.normal(size=(b, 15)).astype(np.float32))
        magpie = jnp.asarray(rng.normal(size=(b, magpie_dim)).astype(np.float32))
        tc = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))
        return z, comp, magpie, tc

    def test_fixed_projection_fallback(self):
        from superconductor_vae_tpu.ops.physics_z_loss import physics_z_loss
        out = physics_z_loss(*self._inputs())
        assert set(out) >= {'total', 'comp', 'magpie', 'thermo',
                            'consistency', 'gl', 'bcs', 'cobordism',
                            'ratios', 'structural', 'electronic'}
        for v in out.values():
            assert np.isfinite(float(v))

    def test_sub_losses_vanish_on_consistent_z(self):
        """Each consistency sub-loss is zero (or near) when z satisfies its
        physical identity — validates the identities are encoded correctly
        (reference: z_supervision_loss.py:78-333)."""
        from superconductor_vae_tpu.models import physics_z as PZ
        from superconductor_vae_tpu.ops import physics_z_loss as pzl
        rng = np.random.default_rng(1)
        b = 8
        z = np.zeros((b, 2048), np.float32)
        lam = rng.uniform(1.5, 3.0, b).astype(np.float32)
        xi = rng.uniform(0.5, 1.0, b).astype(np.float32)
        kappa = lam / xi
        z[:, PZ.LAMBDA_L], z[:, PZ.XI], z[:, PZ.KAPPA] = lam, xi, kappa
        z[:, PZ.HC] = 1.0 / (lam * xi)
        z[:, PZ.HC2] = 1.0 / xi ** 2
        z[:, PZ.E_COND] = z[:, PZ.HC] ** 2
        z[:, PZ.HC1] = np.log(np.clip(kappa, 1.01, None)) / lam ** 2
        assert float(pzl.gl_consistency(jnp.asarray(z))) < 1e-5

        z[:, PZ.V_F] = rng.uniform(1, 2, b)
        z[:, PZ.DELTA0] = rng.uniform(1, 2, b)
        z[:, PZ.XI] = z[:, PZ.V_F] / z[:, PZ.DELTA0]
        z[:, PZ.GAP_RATIO] = 3.528
        assert float(pzl.bcs_consistency(jnp.asarray(z))) < 1e-5

        z[:, PZ.E_VORTEX] = np.log(np.clip(kappa, 1.01, None)) / lam ** 2
        z[:, PZ.SIGMA_NS] = rng.normal(size=b)
        z[:, PZ.E_DOMAIN] = z[:, PZ.SIGMA_NS]
        z[:, PZ.TYPE_I_II] = kappa - 2 ** -0.5
        z[:, PZ.E_DEFECT_MIN] = np.minimum(z[:, PZ.E_VORTEX],
                                           z[:, PZ.E_DOMAIN])
        assert float(pzl.cobordism_consistency(jnp.asarray(z))) < 1e-5

        z[:, PZ.THETA_D] = rng.uniform(1, 2, b)
        z[:, PZ.L_MFP] = rng.uniform(1, 2, b)
        z[:, PZ.TC] = rng.uniform(0.1, 1, b)
        z[:, PZ.TC_THETA_D] = z[:, PZ.TC] / z[:, PZ.THETA_D]
        z[:, PZ.XI_L] = z[:, PZ.XI] / z[:, PZ.L_MFP]
        assert float(pzl.ratio_consistency(jnp.asarray(z))) < 1e-5

        tc_n = z[:, PZ.TC].copy()
        z[:, PZ.TC_ONSET] = z[:, PZ.TC] + 0.1
        z[:, PZ.TC_MIDPOINT] = z[:, PZ.TC]
        z[:, PZ.TC_ZERO] = z[:, PZ.TC] - 0.1
        z[:, PZ.DELTA_TC] = z[:, PZ.TC_ONSET] - z[:, PZ.TC_ZERO]
        assert float(pzl.thermo_consistency(jnp.asarray(z),
                                            jnp.asarray(tc_n))) < 1e-5

        z[:, PZ.LATTICE_A] = rng.uniform(1, 2, b)
        z[:, PZ.LATTICE_B] = rng.uniform(1, 2, b)
        z[:, PZ.LATTICE_C] = rng.uniform(1, 2, b)
        z[:, PZ.VOLUME] = (z[:, PZ.LATTICE_A] * z[:, PZ.LATTICE_B]
                           * z[:, PZ.LATTICE_C])
        assert float(pzl.structural_consistency(jnp.asarray(z))) < 1e-5

        z[:, PZ.PLASMA_FREQ] = rng.uniform(0.5, 1.5, b)
        z[:, PZ.DRUDE_WEIGHT] = z[:, PZ.PLASMA_FREQ] ** 2
        assert float(pzl.electronic_consistency(jnp.asarray(z))) < 1e-5

    def test_learnable_projection_trains(self):
        """Reference parity: MagpieEncodingLoss nn.Linear is trained jointly
        (z_supervision_loss.py:52-76) — grads must reach kernel AND bias."""
        from superconductor_vae_tpu.ops.physics_z_loss import (
            init_magpie_proj, physics_z_loss)
        z, comp, magpie, tc = self._inputs()
        proj = init_magpie_proj(jax.random.PRNGKey(0), magpie.shape[1])
        assert proj['kernel'].shape == (magpie.shape[1], 62)
        assert proj['bias'].shape == (62,)
        bound = 1.0 / np.sqrt(magpie.shape[1])
        assert np.abs(np.asarray(proj['kernel'])).max() <= bound

        def loss(p):
            return physics_z_loss(z, comp, magpie, tc, proj_params=p)['total']

        g = jax.grad(loss)(proj)
        assert float(jnp.abs(g['kernel']).sum()) > 0
        assert float(jnp.abs(g['bias']).sum()) > 0
        # one SGD step on the projection alone reduces the magpie term
        before = float(physics_z_loss(z, comp, magpie, tc,
                                      proj_params=proj)['magpie'])
        stepped = jax.tree.map(lambda p, gr: p - 0.1 * gr, proj, g)
        after = float(physics_z_loss(z, comp, magpie, tc,
                                     proj_params=stepped)['magpie'])
        assert after < before


def test_semantic_unit_loss():
    """Ordered-stream comparison matches the reference semantics
    (semantic_unit_loss.py:205-268): positional mismatches + count
    difference, normalized by the longer stream."""
    from superconductor_vae_tpu.ops.losses import semantic_unit_loss
    from superconductor_vae_tpu.tokenizer import default_tokenizer

    tok = default_tokenizer(max_len=16)
    tt = jnp.asarray(tok.token_type_table)

    def enc(f):
        return tok.encode(f)[1:]  # drop BOS: loss sees target stream

    # identical -> zero everywhere
    a = jnp.asarray([enc('YBa2Cu3O7')])
    m = a != 0
    out = semantic_unit_loss(a, a, m, tt)
    assert float(out['total']) == 0.0

    # one element of four differs -> element_err = 1/4; amounts equal
    p = jnp.asarray([enc('LaBa2Cu3O7')])
    out = semantic_unit_loss(p, a, m, tt)
    np.testing.assert_allclose(float(out['element_loss']), 5.0 * 0.25, rtol=1e-6)
    assert float(out['fraction_loss']) == 0.0
    np.testing.assert_allclose(float(out['exact_match_loss']), 1.0, rtol=1e-6)

    # one amount of three differs -> fraction_err = 1/3
    p = jnp.asarray([enc('YBa2Cu4O7')])
    out = semantic_unit_loss(p, a, m, tt)
    assert float(out['element_loss']) == 0.0
    np.testing.assert_allclose(float(out['fraction_loss']), 3.0 / 3, rtol=1e-6)

    # missing element (count mismatch): pred 3 elements vs target 4
    p = jnp.asarray([enc('Ba2Cu3O7')])
    out = semantic_unit_loss(p, a, m, tt)
    # ordered compare: Ba/Y, Cu/Ba, O/Cu mismatch + 1 missing = 4/4
    np.testing.assert_allclose(float(out['element_loss']), 5.0 * 1.0, rtol=1e-6)


def test_semantic_unit_loss_in_multitask():
    """Enabled weight adds the term; disabled keeps it at zero metric."""
    import dataclasses as dc
    from superconductor_vae_tpu.ops.losses import LossConfig
    cfg0 = LossConfig()
    assert cfg0.semantic_unit_weight == 0.0
    cfg1 = dc.replace(cfg0, semantic_unit_weight=1.0)
    assert cfg1.semantic_unit_weight == 1.0
