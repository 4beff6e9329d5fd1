"""True autoregressive evaluation — batched greedy KV-cache decode.

Capability parity with the reference's ``evaluate_true_autoregressive``
(reference: scripts/train_v12_clean.py:4431-5073): true exact match vs
teacher-forced exact match, per-sample error records, Tc R² per Kelvin bin,
z-norm diagnostics.  The whole eval decode is one jitted batched rollout per
batch instead of the reference's Python generation loop.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import DatasetArrays, NormStats
from ..generation import GenerationConfig, generate_with_kv_cache
from ..models import MaterialsEncoder, FormulaDecoder
from ..tokenizer import FractionAwareTokenizer, EOS_ID, PAD_ID
from .config import TrainConfig
from .train_step import stoich_conditioning

TC_BINS = ((0, 10), (10, 50), (50, 100), (100, 120), (120, 200), (200, 1000))


def _exact_match(generated: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Per-sample: generated token stream equals target up to/incl. EOS.
    Vectorized (no per-row Python loop); a target with no EOS is never
    exact, matching the historical per-row semantics."""
    b, t = targets.shape
    g = generated[:, :t]
    if g.shape[1] < t:
        g = np.pad(g, ((0, 0), (0, t - g.shape[1])), constant_values=-1)
    has_eos = (targets == EOS_ID).any(axis=1)
    eos_pos = np.where(has_eos, (targets == EOS_ID).argmax(axis=1), t - 1)
    needed = np.arange(t)[None, :] <= eos_pos[:, None]
    return ((g == targets) | ~needed).all(axis=1) & has_eos


def evaluate_autoregressive(
    encoder: MaterialsEncoder, decoder: FormulaDecoder,
    enc_params, dec_params,
    ds: DatasetArrays,
    tcfg: TrainConfig,
    luts: Dict[str, jnp.ndarray],
    tokenizer: Optional[FractionAwareTokenizer] = None,
    batch_size: int = 256,
    max_batches: Optional[int] = None,
    collect_errors: bool = False,
    sample_indices: Optional[np.ndarray] = None,
    speculative_tables: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, object]:
    """``sample_indices``: explicit dataset rows to evaluate (the train loop
    passes a rotating random subsample so mastery/curriculum feedback covers
    the whole corpus, not a fixed prefix).  ``sample_indices`` in the result
    is always the TRUE dataset indices of the evaluated rows.

    ``speculative_tables``: n-gram draft tables (models/draft.py
    build_ngram_draft) switch the AR decode to speculative chunk
    verification (generation/speculative.py).  NOTE the speculative path is
    pure greedy — no stop boost / hard stop / type masking — so its exact
    match can differ at the margin from the gated scan; the A/B numbers
    are recorded in docs/RESULTS.md (scripts/evaluate.py --speculative)."""
    gcfg = GenerationConfig(
        max_len=decoder.cfg.max_len, temperature=0.0,
        stop_boost=tcfg.stop_boost,
        hard_stop_threshold=tcfg.hard_stop_threshold,
        site_dup_threshold=tcfg.site_dup_threshold,
        use_type_masking=tcfg.use_type_masking_ar,
        early_exit=True)
    type_masks = luts['type_masks'] if tcfg.use_type_masking_ar else None

    # params are ARGUMENTS, not closure constants — closing over 108M params
    # embeds them in the serialized HLO and overflows remote-compile limits
    @jax.jit
    def eval_batch(enc_params, dec_params, batch):
        enc_out = encoder.apply(
            enc_params, batch['element_indices'], batch['element_fractions'],
            batch['element_mask'], batch['magpie'], batch['tc'])
        heads_vec = encoder.apply(
            enc_params, enc_out, method=MaterialsEncoder.heads_pred_for_decoder)
        stoich = stoich_conditioning(batch)
        if speculative_tables is not None:
            from ..generation.speculative import speculative_generate
            gen = speculative_generate(
                decoder, dec_params, enc_out['z'], stoich, heads_vec,
                speculative_tables, k=4)
        else:
            gen = generate_with_kv_cache(
                decoder, dec_params, enc_out['z'], stoich, heads_vec,
                jax.random.PRNGKey(0), gcfg, type_masks=type_masks)
        # TF path for TF-exact comparison
        dec_out = decoder.apply(dec_params, enc_out['z'], batch['tokens'],
                                stoich, heads_vec)
        return {
            'generated': gen['tokens'],
            'tf_pred': dec_out['generated'],
            'tc_pred': enc_out['tc_pred'],
            'sc_pred': enc_out['sc_pred'],
            'z_norm': jnp.linalg.norm(enc_out['z'], axis=1),
            'family_composed_14': enc_out['family_composed_14'],
        }

    if sample_indices is None:
        sample_indices = np.arange(len(ds))
    sample_indices = np.asarray(sample_indices, np.int64)
    n = len(sample_indices)
    nb = -(-n // batch_size)
    if max_batches:
        nb = min(nb, max_batches)

    ar_exact, tf_exact = [], []
    tc_preds, tc_trues, z_norms = [], [], []
    fam_correct = []
    sc_probs, sc_trues = [], []
    pos_errors, pos_masks = [], []
    errors: List[dict] = []

    def _dispatch(b):
        """Async-dispatch one eval batch; returns (row_idx, device_out).
        JAX dispatch returns immediately, so the device decodes batch b+1
        while the host scores batch b (the full-corpus eval was host-bound:
        the device round-trip serialized with ~2s/batch of host scoring)."""
        idx = sample_indices[b * batch_size: min((b + 1) * batch_size, n)]
        pad_n = batch_size - len(idx)
        full_idx = (np.concatenate([idx, np.zeros(pad_n, np.int64)])
                    if pad_n else idx)
        batch = {k: jnp.asarray(v) for k, v in ds.batch(full_idx).items()}
        return idx, eval_batch(enc_params, dec_params, batch)

    pending = _dispatch(0)
    for b in range(nb):
        idx, dev_out = pending
        if b + 1 < nb:
            pending = _dispatch(b + 1)   # overlaps with np.asarray below
        out = jax.tree.map(np.asarray, dev_out)
        m = len(idx)

        targets = ds.tokens[idx][:, 1:]
        ar = _exact_match(out['generated'][:m], targets)
        mask = targets != PAD_ID
        tf = ((out['tf_pred'][:m] == targets) | ~mask).all(axis=1)
        pos_errors.append((out['tf_pred'][:m] != targets) & mask)
        pos_masks.append(mask)
        ar_exact.append(ar)
        tf_exact.append(tf)
        tc_preds.append(out['tc_pred'][:m])
        tc_trues.append(ds.tc[idx])
        z_norms.append(out['z_norm'][:m])
        coarse_pred = out['family_composed_14'][:m].argmax(axis=1)
        fam_correct.append(coarse_pred == ds.family[idx])
        sc_probs.append(1.0 / (1.0 + np.exp(-out['sc_pred'][:m])))
        sc_trues.append(ds.is_sc[idx])

        if collect_errors and tokenizer is not None:
            for i in np.where(~ar)[0]:
                errors.append({
                    'index': int(idx[i]),
                    'formula': ds.formulas[idx[i]],
                    'generated': tokenizer.decode(out['generated'][i]),
                    'tc_kelvin': float(ds.norm_stats.tc_to_kelvin(
                        np.array([ds.tc[idx[i]]]))[0]),
                    'z_norm': float(out['z_norm'][i]),
                    'family': int(ds.family[idx[i]]),
                })

    ar_exact = np.concatenate(ar_exact)
    tf_exact = np.concatenate(tf_exact)
    tc_pred = np.concatenate(tc_preds)
    tc_true = np.concatenate(tc_trues)
    z_norm = np.concatenate(z_norms)

    k_pred = ds.norm_stats.tc_to_kelvin(tc_pred)
    k_true = ds.norm_stats.tc_to_kelvin(tc_true)
    r2_per_bin = {}
    for lo, hi in TC_BINS:
        sel = (k_true >= lo) & (k_true < hi)
        if sel.sum() >= 5:
            ss_res = ((k_pred[sel] - k_true[sel]) ** 2).sum()
            ss_tot = ((k_true[sel] - k_true[sel].mean()) ** 2).sum()
            r2_per_bin[f'{lo}-{hi}K'] = float(1 - ss_res / max(ss_tot, 1e-8))
    tc_mae = float(np.abs(k_pred - k_true).mean())

    # SC/non-SC cross-head classifier metrics (reference evaluates this
    # head on its 50/50 corpus; meaningful only when negatives are present)
    sc_p = np.concatenate(sc_probs)
    sc_t = np.concatenate(sc_trues).astype(np.int32)
    sc_metrics = {}
    if len(np.unique(sc_t)) == 2:
        pred = (sc_p >= 0.5).astype(np.int32)
        tp = int(((pred == 1) & (sc_t == 1)).sum())
        fp = int(((pred == 1) & (sc_t == 0)).sum())
        fn = int(((pred == 0) & (sc_t == 1)).sum())
        # rank-based AUC (Mann-Whitney)
        order = np.argsort(sc_p, kind='stable')
        ranks = np.empty(len(sc_p)); ranks[order] = np.arange(1, len(sc_p) + 1)
        n1, n0 = int(sc_t.sum()), int((1 - sc_t).sum())
        auc = (ranks[sc_t == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
        sc_metrics = {
            'sc_accuracy': float((pred == sc_t).mean()),
            'sc_precision': tp / max(tp + fp, 1),
            'sc_recall': tp / max(tp + fn, 1),
            'sc_auc': float(auc),
            'sc_balance': float(sc_t.mean()),
        }

    return {
        'ar_exact': float(ar_exact.mean()),
        'tf_exact': float(tf_exact.mean()),
        'tc_mae_kelvin': tc_mae,
        'tc_r2_per_bin': r2_per_bin,
        'sc_metrics': sc_metrics,
        'z_norm_mean': float(z_norm.mean()),
        'family_coarse_acc': float(np.concatenate(fam_correct).mean()),
        'n_evaluated': int(len(ar_exact)),
        'error_records': errors,
        # per-sample arrays for the curriculum / mastery controllers —
        # TRUE dataset indices, not positions within the eval subset
        'per_sample_ar_exact': ar_exact,
        'sample_indices': sample_indices[:len(ar_exact)],
        # per-position TF mismatches for the entropy weighter
        'position_errors': np.concatenate(pos_errors),
        'position_mask': np.concatenate(pos_masks),
    }
