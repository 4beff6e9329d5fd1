"""Training driver: the host loop around the jitted step.

Capability parity with the reference's ``train()`` entry
(reference: scripts/train_v12_clean.py:5926-7800): data loading + weighted
sampling, model/optimizer creation, per-epoch scheduler decisions (curriculum,
RL, physics-Z, loss skipping, entropy, drop rollback), cadence-based true-AR
evaluation, CSV metric logging, and best/interval checkpointing.

The device never sees the controllers: every decision flows into the step as
traced scalars (train_step.default_dyn) or as host-side param surgery
(rollback, Tc-bin restore).
"""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    DatasetArrays, WeightedEpochSampler, compute_sample_weights, load_dataset,
    synthetic_dataset,
)
from ..models.config import ModelConfig
from ..parallel import make_mesh, shard_batch
from ..tokenizer import default_tokenizer
from .config import TrainConfig
from .evaluate import evaluate_autoregressive
from .schedulers import (
    DropDetector, EntropyManager, LossSkipScheduler,
    PerPositionEntropyWeighter, PhysZController, RLController, TcBinTracker,
    cosine_lr, curriculum_weights, teacher_forcing_ratio,
)
from .train_step import (
    build_luts, create_train_state, default_dyn, make_epoch_runner,
    make_train_step,
    set_learning_rate,
)


def train(
    csv_path: Optional[str] = None,
    model_config: Optional[ModelConfig] = None,
    train_config: Optional[TrainConfig] = None,
    output_dir: str = 'outputs',
    limit: Optional[int] = None,
    dataset: Optional[DatasetArrays] = None,
    use_mesh: bool = True,
    log_fn=None,
) -> Dict[str, object]:
    if log_fn is None:
        log_fn = lambda *a, **k: print(*a, flush=True, **k)
    tcfg = train_config or TrainConfig()
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if tcfg.debug_numerics:
        # NaN/Inf sanitizer (SURVEY 5.2): every dispatch is checked and, on
        # a hit, re-run un-jitted so the exception names the producing op.
        # The whole-epoch scan is disabled in this mode (one dispatch per
        # step gives per-step localization).
        from ..utils.debug import enable_nan_debugging
        enable_nan_debugging()

    # ---- data --------------------------------------------------------------
    tokenizer = default_tokenizer(max_len=tcfg.max_formula_len)
    if dataset is not None:
        ds = dataset
    elif csv_path:
        ds = load_dataset(csv_path, max_len=tcfg.max_formula_len,
                          tokenizer=tokenizer, limit=limit,
                          cache_dir=out_dir / 'data_cache',
                          skew_transform=tcfg.skew_transform,
                          order_augment=tcfg.order_augment,
                          order_augment_seed=tcfg.seed)
    else:
        ds = synthetic_dataset(n=limit or 512, max_len=tcfg.max_formula_len)

    import dataclasses as _dc
    mcfg = model_config or ModelConfig(magpie_dim=ds.magpie_dim,
                                       max_len=tcfg.max_formula_len)
    if mcfg.magpie_dim != ds.magpie_dim:
        mcfg = _dc.replace(mcfg, magpie_dim=ds.magpie_dim)
    # loss needs the dataset's Tc normalization for Kelvin-space weighting
    tcfg.loss = _dc.replace(
        tcfg.loss, tc_mean=float(ds.norm_stats.tc_mean),
        tc_std=float(ds.norm_stats.tc_std),
        tc_log_transform=bool(ds.norm_stats.tc_log_transform))

    weights = compute_sample_weights(
        ds, balanced=tcfg.balanced_sampling,
        oversample_hard=tcfg.oversample_hard_sequences,
        oversample_high_tc=tcfg.oversample_high_tc)
    batch_size = min(tcfg.batch_size, len(ds))
    sampler = WeightedEpochSampler(weights, batch_size=batch_size,
                                   seed=tcfg.seed)

    # ---- models / state ----------------------------------------------------
    rng = jax.random.PRNGKey(tcfg.seed)
    compute_dtype = (jnp.bfloat16 if tcfg.compute_dtype == 'bfloat16'
                     else jnp.float32)
    encoder, decoder, state, tx_enc, tx_dec = create_train_state(
        mcfg, tcfg, rng, dtype=compute_dtype)
    luts = build_luts(tokenizer)

    # single-device: skip the mesh entirely — sharding adds nothing and the
    # experimental axon TPU platform has crashed on NamedSharding transfers
    mesh = make_mesh() if (use_mesh and len(jax.devices()) > 1) else None

    steps = {}

    def get_step(rl_enabled: bool):
        if rl_enabled not in steps:
            step = make_train_step(
                encoder, decoder, tcfg, tx_enc, tx_dec, luts,
                rl_enabled=rl_enabled)
            steps[rl_enabled] = step
        return steps[rl_enabled]

    # device-resident dataset + whole-epoch scan: ONE dispatch per epoch.
    # The per-step host->device RTT (dominant at batch 128 over the remote
    # tunnel) disappears; only the [n_batches, B] int32 indices transfer.
    # Multi-host keeps the per-batch make_array_from_process_local_data path.
    device_resident = (tcfg.device_resident_data and jax.process_count() == 1
                       and not tcfg.debug_numerics)
    data_dev = None
    runners = {}
    if device_resident:
        full = ds.batch(np.arange(len(ds)))
        if mesh is not None:
            from ..parallel.mesh import replicate
            rep = replicate(mesh)
            data_dev = {k: jax.device_put(np.asarray(v), rep)
                        for k, v in full.items()}
        else:
            data_dev = {k: jax.device_put(np.asarray(v))
                        for k, v in full.items()}

    def get_epoch_runner(rl_enabled: bool):
        if rl_enabled not in runners:
            runners[rl_enabled] = make_epoch_runner(
                encoder, decoder, tcfg, tx_enc, tx_dec, luts,
                rl_enabled=rl_enabled, mesh=mesh)
        return runners[rl_enabled]

    # ---- controllers -------------------------------------------------------
    rl_ctl = RLController(tcfg)
    pz_ctl = PhysZController(tcfg)
    skip_ctl = LossSkipScheduler(tcfg)
    drop_ctl = DropDetector(tcfg)
    ent_mgr = EntropyManager(tcfg)
    tc_tracker = TcBinTracker(tcfg)
    pos_weighter = (PerPositionEntropyWeighter(
        tcfg.max_formula_len - 1, error_boost=tcfg.entropy_position_boost)
        if tcfg.entropy_per_position else None)

    # mastery-aware sampling + optional length-bucket AR curriculum
    from .mastery_sampler import CurriculumScheduler, MasteryTracker
    mastery = MasteryTracker(len(ds))
    curriculum = None
    if getattr(tcfg, 'curriculum_ar_enabled', False):
        seq_len = (ds.tokens != 0).sum(axis=1)
        curriculum = CurriculumScheduler(seq_len)

    # phase-2 self-supervised machinery (gated)
    phase2 = None
    if tcfg.phase2_enabled:
        from .self_supervised import Phase2Config, SelfSupervisedEpoch
        phase2 = SelfSupervisedEpoch(
            encoder, decoder, tokenizer, ds, luts,
            cfg=Phase2Config(n_samples=tcfg.phase2_n_samples,
                             lr_factor=tcfg.phase2_lr_factor,
                             max_weight=tcfg.phase2_max_weight,
                             warmup=tcfg.phase2_warmup),
            base_lr=tcfg.learning_rate, output_dir=str(out_dir))

    from ..analysis import TopologyAnalyzer
    topo = TopologyAnalyzer(output_dir=out_dir)
    from ..generation.latent_analyzer import LatentSpaceAnalyzer

    # graceful shutdown: SIGINT/SIGTERM saves a full-state interrupt
    # checkpoint (reference: train_v12_clean.py:1383-1433)
    import signal
    interrupt = {'flag': False}

    def _on_signal(signum, frame):
        interrupt['flag'] = True

    old_handlers = {}
    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            old_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not main thread

    best_exact = 0.0
    last_best_saved = 0.0
    last_best_save_epoch = -10 ** 9
    last_metrics: Optional[Dict[str, float]] = None
    last_ar_exact = 0.0
    history = []
    step_rng = jax.random.PRNGKey(tcfg.seed + 1)
    start_epoch = 0

    # host-side state machines bundled into every checkpoint so a restart
    # resumes controllers, not just params (reference saves optimizer +
    # scheduler + controller states, train_v12_clean.py:3527-3597)
    def _ctl_state():
        return {
            'rl': rl_ctl.state_dict(), 'physz': pz_ctl.state_dict(),
            'skip': skip_ctl.state_dict(), 'drop': drop_ctl.state_dict(),
            'entropy': ent_mgr.state_dict(),
            'pos_weighter': (pos_weighter.state_dict()
                             if pos_weighter else None),
            'curriculum': curriculum.state_dict() if curriculum else None,
            'best_exact': best_exact, 'last_best_saved': last_best_saved,
            'last_ar_exact': last_ar_exact,
        }

    def _mastery_arrays():
        return {'mastery': {'mastery': mastery.mastery,
                            'seen': mastery.seen, 'peak': mastery.peak}}

    # resume: restore params + optimizer states + step + controller state
    # from the newest checkpoint (manifest drift check as in the reference,
    # utils/manifest.py:137)
    if tcfg.resume:
        from ..checkpoint import (check_manifest_drift, latest_checkpoint,
                                  load_checkpoint, restore_opt_state)
        path = (latest_checkpoint(out_dir / 'checkpoints')
                if tcfg.resume == 'auto' else Path(tcfg.resume))
        if path is not None and (Path(path) / 'meta.json').exists():
            restored, meta = load_checkpoint(path)
            drift = check_manifest_drift(meta.get('manifest', {}), mcfg, tcfg)
            if drift:
                log_fn(f'[resume] manifest drift: {drift}')
            # auto-migration chain: vocab / magpie-dim / pz-proj upgrades
            # before loading (reference: train_v12_clean.py:6497-6565)
            from ..checkpoint.migrate import auto_migrate
            restored, migrations = auto_migrate(
                restored, meta, mcfg, tokenizer=tokenizer, seed=tcfg.seed)
            for act in migrations:
                log_fn(f'[resume][migrate] {act}')
            # params-only bf16 snapshots (scripts/snapshot_params.py) must
            # become fp32 master weights again: bf16 masters quantize away
            # fine-tune-scale updates (~1e-5 on O(0.1) weights is below
            # bf16's ~0.4% relative precision)
            def _fp32_masters(tree):
                return jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if getattr(x, 'dtype', None) == jnp.bfloat16 else x,
                    tree)
            restored = {k: (_fp32_masters(v) if k.endswith('_params') else v)
                        for k, v in restored.items()}
            state = state.replace(
                enc_params=restored['enc_params'],
                dec_params=restored['dec_params'],
                set_params=restored.get('set_params', state.set_params),
                pz_params=restored.get('pz_params', state.pz_params))
            if 'step' in restored:
                state = state.replace(
                    step=jnp.asarray(restored['step'], jnp.int32))
            for name in ('enc_opt', 'dec_opt', 'set_opt', 'pz_opt'):
                if name in restored and getattr(state, name) is not None:
                    state = state.replace(**{name: restore_opt_state(
                        getattr(state, name), restored[name])})
            ctl = meta.get('controllers') or {}
            for obj, key in ((rl_ctl, 'rl'), (pz_ctl, 'physz'),
                             (skip_ctl, 'skip'), (drop_ctl, 'drop'),
                             (ent_mgr, 'entropy')):
                if ctl.get(key):
                    obj.load_state_dict(ctl[key])
            if curriculum is not None and ctl.get('curriculum'):
                curriculum.load_state_dict(ctl['curriculum'])
            if pos_weighter is not None and ctl.get('pos_weighter'):
                pos_weighter.load_state_dict(ctl['pos_weighter'])
            best_exact = float(ctl.get('best_exact', 0.0))
            last_best_saved = float(ctl.get('last_best_saved', 0.0))
            last_ar_exact = float(ctl.get('last_ar_exact', 0.0))
            m = restored.get('mastery')
            if m is not None and len(m['mastery']) == len(ds):
                mastery.mastery = np.asarray(m['mastery'])
                mastery.seen = np.asarray(m['seen'], bool)
                mastery.peak = np.asarray(m['peak'])
            start_epoch = int(meta.get('epoch', -1)) + 1
            if tcfg.resume_grace_epochs > 0:
                drop_ctl.grace_until = max(
                    drop_ctl.grace_until,
                    start_epoch + tcfg.resume_grace_epochs)
                drop_ctl.prev_exact = None
                log_fn(f'[resume] drop-detector grace until epoch '
                       f'{drop_ctl.grace_until} (corpus/normalization '
                       f'shift expected)')
            log_fn(f'[resume] {path} -> epoch {start_epoch} '
                   f'(opt={"enc_opt" in restored} ctl={bool(ctl)})')

    csv_path_out = out_dir / 'training_metrics.csv'
    csv_fields = ['epoch', 'total', 'formula_loss', 'tc_loss', 'exact_match',
                  'token_accuracy', 'true_ar_exact', 'rl_weight',
                  'physz_weight', 'lr', 'entropy', 'mean_reward',
                  'epoch_time_s', 'samples_per_s']

    # append across resumes so crash-restart loops (train_resilient) keep
    # one continuous metrics history for the analyzers (the reference's
    # log_training_metrics also appends, train_v12_clean.py:3979)
    if not (start_epoch > 0 and csv_path_out.exists()):
        with open(csv_path_out, 'w', newline='') as f:
            csv.DictWriter(f, fieldnames=csv_fields).writeheader()

    for epoch in range(start_epoch, tcfg.num_epochs):
        t0 = time.time()
        tf_exact = last_metrics.get('exact_match', 0.0) if last_metrics else 0.0

        # per-epoch order-augmentation resampling: redraw every augmented
        # row's element-order respelling (fresh permutations each epoch) so
        # decode-side ordering supervision generalizes beyond the K static
        # spellings — see data/pipeline.py::resample_order_augmentation
        if (tcfg.order_augment_resample and ds.aug_group is not None
                and epoch % max(tcfg.order_augment_resample_interval, 1) == 0):
            from ..data.pipeline import resample_order_augmentation
            ds = resample_order_augmentation(
                ds, tokenizer, seed=tcfg.seed * 100003 + epoch)
            if data_dev is not None:
                fresh = ds.batch(np.arange(len(ds)))
                for key in ('tokens', 'element_indices',
                            'element_fractions', 'element_mask'):
                    arr = np.asarray(fresh[key])
                    data_dev[key] = (jax.device_put(arr, rep)
                                     if mesh is not None
                                     else jax.device_put(arr))

        # controller decisions for this epoch
        tc_w, mg_w = curriculum_weights(epoch, tcfg)
        rl_w = rl_ctl.epoch_update(
            epoch, tf_exact, last_ar_exact,
            raw_rl_loss=last_metrics.get('reinforce_loss') if last_metrics else None)
        pz_w = pz_ctl.epoch_update(epoch, tf_exact)
        skip_m = skip_ctl.multipliers(epoch, last_metrics)
        ent_w = (ent_mgr.update(last_metrics.get('mean_reward', 0.0),
                                last_metrics.get('entropy', 1.0),
                                reward_var=last_metrics.get('reward_var'))
                 if last_metrics else tcfg.rl.entropy_weight)
        tf_ratio = teacher_forcing_ratio(tf_exact, tcfg)  # logged; TF path fixed
        lr = cosine_lr(epoch, tcfg) * drop_ctl.lr_scale
        state = state.replace(enc_opt=set_learning_rate(state.enc_opt, lr),
                              dec_opt=set_learning_rate(state.dec_opt, lr))

        dyn = default_dyn(tcfg)
        dyn.update({
            'tc_w': jnp.asarray(tc_w), 'magpie_w': jnp.asarray(mg_w),
            'rl_w': jnp.asarray(rl_w), 'physz_w': jnp.asarray(pz_w),
            'rl_temperature': jnp.asarray(max(
                rl_ctl.temperature(epoch) * ent_mgr.temperature_scale, 0.011)),
            'entropy_weight': jnp.asarray(ent_w),
        })
        if tcfg.soft_token_enabled:
            from .soft_token import SoftTokenSchedule, soft_token_ratio
            dyn['soft_ratio'] = jnp.asarray(soft_token_ratio(
                epoch, SoftTokenSchedule(
                    n_epochs=tcfg.soft_token_epochs,
                    start_ratio=tcfg.soft_token_start_ratio,
                    end_ratio=tcfg.soft_token_end_ratio,
                    warmup_epochs=tcfg.soft_token_warmup_epochs,
                    schedule=tcfg.soft_token_schedule)))
        if pos_weighter is not None:
            dyn['entropy_pos_w'] = jnp.asarray(
                pos_weighter.weights(), jnp.float32)
        dyn.update({k: jnp.asarray(v) for k, v in skip_m.items()})

        # epoch over weighted batches — metric sums stay ON DEVICE so every
        # step dispatches asynchronously; one host sync per epoch (a float()
        # per step would serialize each step on the tunnel RTT)
        #
        # RL epochs dispatch PER STEP: wrapping the rollout step in the
        # whole-epoch lax.scan produces a program large enough to crash the
        # remote TPU worker at compile time (observed: 4 consecutive
        # worker "kernel fault" deaths at the RL-activation epoch, repro'd
        # standalone — the un-scanned RL step compiles and runs fine at
        # ~330 samples/s, where per-step RTT is ~1% of step time).
        if device_resident and rl_w > 0:
            sums = {}
            n_batches = 0
            n_samples = 0
            idx_all = np.stack(list(sampler.epoch(epoch))).astype(np.int32)
            k_chunk = getattr(tcfg, 'rl_chunk_steps', 0)
            pos = 0
            if k_chunk > 1 and len(idx_all) >= k_chunk:
                # chunked scan: one dispatch per k-step block — the program
                # is ONE traced RL step scanned k times (same compiled size
                # as the k=1 program), so per-step host RTT amortizes ~k x
                # without the whole-epoch-scan compile that killed the
                # remote worker in round 2 (train_loop history)
                try:
                    runner = get_epoch_runner(True)
                    n_full = (len(idx_all) // k_chunk) * k_chunk
                    while pos < n_full:
                        chunk = idx_all[pos:pos + k_chunk]
                        step_rng, sub = jax.random.split(step_rng)
                        state, s = runner(state, data_dev, chunk, sub, dyn)
                        for k, v in s.items():
                            sums[k] = sums[k] + v if k in sums else v
                        n_batches += len(chunk)
                        n_samples += int(chunk.size)
                        pos += k_chunk
                except Exception as e:  # noqa: BLE001 — worker-side compile
                    if pos > 0:
                        raise  # mid-epoch state is poisoned; let resilient
                               # wrapper restart from checkpoint
                    log_fn(f'[rl] chunked scan failed to compile '
                           f'({type(e).__name__}: {e}); falling back to '
                           f'per-step dispatch for this session')
                    tcfg.rl_chunk_steps = 0
            step_fn = None
            for batch_idx in idx_all[pos:]:
                if step_fn is None:
                    step_fn = get_step(rl_enabled=True)
                idx_dev = jnp.asarray(batch_idx)
                batch = {k: jnp.take(v, idx_dev, axis=0)
                         for k, v in data_dev.items()}
                step_rng, sub = jax.random.split(step_rng)
                state, metrics = step_fn(state, batch, sub, dyn)
                n_batches += 1
                n_samples += len(batch_idx)
                for k, v in metrics.items():
                    sums[k] = sums[k] + v if k in sums else v
        elif device_resident:
            idx_mat = np.stack(list(sampler.epoch(epoch))).astype(np.int32)
            step_rng, sub = jax.random.split(step_rng)
            state, sums = get_epoch_runner(False)(
                state, data_dev, idx_mat, sub, dyn)
            n_batches = idx_mat.shape[0]
            n_samples = int(idx_mat.size)
        else:
            step_fn = get_step(rl_enabled=rl_w > 0)
            sums: Dict[str, jnp.ndarray] = {}
            n_batches = 0
            n_samples = 0
            for batch_idx in sampler.epoch(epoch):
                if jax.process_count() > 1:
                    # every host draws the same seeded stream; keep our shard
                    from ..data.sampler import shard_batch_indices
                    batch_idx = shard_batch_indices(
                        batch_idx, jax.process_index(), jax.process_count())
                batch = ds.batch(batch_idx)
                batch = (shard_batch(batch, mesh) if mesh is not None
                         else {k: jnp.asarray(v) for k, v in batch.items()})
                step_rng, sub = jax.random.split(step_rng)
                state, metrics = step_fn(state, batch, sub, dyn)
                n_batches += 1
                n_samples += len(batch_idx)
                for k, v in metrics.items():
                    sums[k] = sums[k] + v if k in sums else v
        last_metrics = {k: float(v) / max(n_batches, 1)
                        for k, v in sums.items()}
        epoch_time = time.time() - t0

        # cadence: true-AR eval on a ROTATING random subsample (a fixed
        # prefix would starve mastery/curriculum of feedback on the rest of
        # the corpus) with per-eval error records on their own cadence
        eval_out = None
        if (epoch + 1) % tcfg.eval_interval == 0 or epoch == tcfg.num_epochs - 1:
            n_eval = min(len(ds), batch_size * tcfg.eval_max_batches)
            if tcfg.eval_random_subset and n_eval < len(ds):
                eval_idx = np.random.default_rng(
                    tcfg.seed * 100003 + epoch).choice(
                        len(ds), size=n_eval, replace=False)
            else:
                eval_idx = np.arange(n_eval)
            collect = ((epoch + 1) % tcfg.error_report_interval == 0
                       or epoch == tcfg.num_epochs - 1)
            eval_out = evaluate_autoregressive(
                encoder, decoder, state.enc_params, state.dec_params, ds,
                tcfg, luts, tokenizer=tokenizer,
                batch_size=batch_size, max_batches=tcfg.eval_max_batches,
                sample_indices=eval_idx, collect_errors=collect)
            last_ar_exact = eval_out['ar_exact']
            if collect and eval_out['error_records']:
                err_dir = out_dir / 'error_reports'
                err_dir.mkdir(exist_ok=True)
                with open(err_dir / f'epoch_{epoch:05d}.jsonl', 'w') as f:
                    for rec in eval_out['error_records']:
                        f.write(json.dumps({'epoch': epoch, **rec}) + '\n')
            # Tc-bin tracker acts on high-Tc bins
            bins = eval_out['tc_r2_per_bin']
            high = [v for k, v in bins.items()
                    if k in ('120-200K', '200-1000K')]
            if high:
                new_enc = tc_tracker.update(state.enc_params, float(np.mean(high)))
                if new_enc is not state.enc_params:
                    state = state.replace(enc_params=new_enc)
            # mastery + curriculum controllers consume per-sample AR exact;
            # both fold multiplicatively into the base sampling weights
            idx = eval_out['sample_indices']
            per = eval_out['per_sample_ar_exact'].astype(np.float64)
            mastery.update(idx, per)
            if pos_weighter is not None:
                pos_weighter.update(eval_out['position_errors'],
                                    eval_out['position_mask'])
            w_combined = weights * mastery.weights()
            if curriculum is not None:
                curriculum.report_ar_exact(per, idx)
                w_combined = w_combined * curriculum.get_sample_weights()
            sampler.set_weights(w_combined)

            # phase-2 self-supervised sub-epoch (gated on TF exact)
            if (phase2 is not None
                    and tf_exact >= tcfg.phase2_auto_min_exact
                    and (epoch + 1) % tcfg.phase2_interval == 0):
                cache = LatentSpaceAnalyzer(
                    encoder, state.enc_params).build_cache(ds)
                p2_w = tcfg.phase2_max_weight * min(
                    1.0, (epoch + 1) / max(tcfg.phase2_warmup, 1))
                step_rng, p2_rng = jax.random.split(step_rng)
                p2 = phase2.run(state.enc_params, state.dec_params,
                                cache.z, p2_rng, phase2_weight=p2_w,
                                current_exact=tf_exact)
                state = state.replace(enc_params=p2['enc_params'],
                                      dec_params=p2['dec_params'])
                log_fn(f"[phase2] {p2['metrics']}")
                # structured sub-epoch record (mined by
                # scripts/phase2_dashboard.py; reference logs to
                # outputs/phase2_log.csv, phase2_dashboard.py:26-44)
                with open(out_dir / 'phase2_log.jsonl', 'a') as f:
                    f.write(json.dumps({'epoch': epoch,
                                        **p2['metrics']}) + '\n')

            # z-cache dump + topology telemetry on checkpoint cadence
            if (epoch + 1) % tcfg.checkpoint_interval == 0:
                cache = LatentSpaceAnalyzer(
                    encoder, state.enc_params).build_cache(ds)
                np.savez_compressed(out_dir / 'latent_cache.npz',
                                    z=cache.z, tc_pred=cache.tc_pred,
                                    tc_kelvin=cache.tc_kelvin,
                                    is_sc=cache.is_sc, family=cache.family)
                topo.analyze(cache.z, is_sc=cache.is_sc,
                             tc_kelvin=cache.tc_kelvin, epoch=epoch)

        # drop detection / rollback. The rollback source is the on-disk
        # 'best' checkpoint (local disk read, Orbax), NOT a host RAM
        # mirror: keeping a mirror fresh costs a full-params device_get
        # over the axon tunnel — doing that every improving epoch made the
        # wall epoch time ~10x the scan time on run3. Rollback is rare;
        # reading 'best' back when it fires is the cheap side of the trade.
        exact = last_metrics.get('exact_match', 0.0)
        if drop_ctl.check(epoch, exact):
            best_dir = out_dir / 'checkpoints' / 'best'
            if (best_dir / 'state').exists():
                from ..checkpoint import load_checkpoint
                restored_best, _ = load_checkpoint(best_dir)
                state = state.replace(
                    enc_params=jax.device_put(restored_best['enc_params']),
                    dec_params=jax.device_put(restored_best['dec_params']))
                log_fn(f'[rollback] epoch {epoch}: exact {exact:.3f} '
                       f'collapsed; restored best checkpoint, '
                       f'lr_scale={drop_ctl.lr_scale}')
            else:
                log_fn(f'[rollback] epoch {epoch}: exact {exact:.3f} '
                       f'collapsed but no best checkpoint exists yet; '
                       f'continuing (lr_scale={drop_ctl.lr_scale})')
        elif exact > best_exact:
            best_exact = exact

        row = {
            'epoch': epoch, 'total': last_metrics.get('total', 0.0),
            'formula_loss': last_metrics.get('formula_loss', 0.0),
            'tc_loss': last_metrics.get('tc_loss', 0.0),
            'exact_match': exact,
            'token_accuracy': last_metrics.get('token_accuracy', 0.0),
            'true_ar_exact': last_ar_exact, 'rl_weight': rl_w,
            'physz_weight': pz_w, 'lr': lr,
            'entropy': last_metrics.get('entropy', 0.0),
            'mean_reward': last_metrics.get('mean_reward', 0.0),
            'epoch_time_s': round(epoch_time, 3),
            'samples_per_s': round(n_samples / max(epoch_time, 1e-6), 1),
        }
        history.append(row)
        with open(csv_path_out, 'a', newline='') as f:
            csv.DictWriter(f, fieldnames=csv_fields).writerow(row)
        log_fn(f"epoch {epoch}: loss={row['total']:.4f} "
               f"exact={exact:.3f} tok_acc={row['token_accuracy']:.3f} "
               f"ar={last_ar_exact:.3f} {row['samples_per_s']}/s tf={tf_ratio}")

        from ..checkpoint import save_checkpoint
        if (epoch + 1) % tcfg.checkpoint_interval == 0:
            save_checkpoint(out_dir / 'checkpoints', state, mcfg, tcfg,
                            epoch=epoch, metrics=row,
                            controllers=_ctl_state(),
                            extra_arrays=_mastery_arrays())
        # save 'best' on meaningful improvement only, at most every 10
        # epochs (a full-state Orbax write — params + both optimizer
        # states — costs minutes of device_get over the axon tunnel;
        # early training improves every epoch and the writes dominated
        # the wall epoch time ~10x on run3)
        if exact > 0 and exact >= best_exact and (
                (exact - last_best_saved >= 0.005
                 and epoch - last_best_save_epoch >= 10)
                or (epoch + 1) % tcfg.checkpoint_interval == 0):
            save_checkpoint(out_dir / 'checkpoints', state, mcfg, tcfg,
                            epoch=epoch, metrics=row, tag='best',
                            controllers=_ctl_state(),
                            extra_arrays=_mastery_arrays())
            last_best_saved = exact
            last_best_save_epoch = epoch
        if interrupt['flag']:
            save_checkpoint(out_dir / 'checkpoints', state, mcfg, tcfg,
                            epoch=epoch, metrics=row, tag='interrupt',
                            controllers=_ctl_state(),
                            extra_arrays=_mastery_arrays())
            log_fn(f'[interrupt] saved checkpoint at epoch {epoch}; stopping')
            break

    for sig, h in old_handlers.items():
        signal.signal(sig, h)

    return {
        'state': state, 'encoder': encoder, 'decoder': decoder,
        'dataset': ds, 'history': history, 'luts': luts,
        'model_config': mcfg, 'tokenizer': tokenizer,
    }
