"""Numerical sanitizer: NaN/Inf localization for the training path.

TPU-native analogue of the reference's NaN/Inf runtime guards
(reference: models/autoregressive_decoder.py:1459-1518 NaN logit guards;
docs/TRAINING_RECORDS.md:3228-3236 NaN-checkpoint recovery).  Instead of
patching over NaNs at generation time, debug mode localizes the FIRST
op producing a non-finite value (SURVEY.md §5.2).

Two mechanisms, by scope:

- ``enable_nan_debugging()`` — flips ``jax.config.jax_debug_nans``: every
  jitted computation is checked on return and, on a hit, re-run op-by-op
  un-jitted so the exception points at the producing op.  This is the
  whole-train-step sanitizer used by ``TrainConfig.debug_numerics``
  (``--set debug_numerics=true``); it costs a host sync per dispatch, so
  the train loop also drops the whole-epoch scan in this mode.

- ``checkify_fn(fn)`` — ``jax.experimental.checkify`` float checks for
  surgically wrapping ONE function (a loss term, a kernel) when you need
  the check to run on-device inside jit.  Not applied to the full train
  step: instrumenting every op of the 17-term loss *and* its backward
  pass makes tracing memory blow up (>38 GB observed on the tiny test
  config under jax 0.9) — keep its scope to a single suspect fn.
"""

from __future__ import annotations

from jax.experimental import checkify


def enable_nan_debugging() -> None:
    """Globally enable first-NaN localization for every jitted call."""
    import jax
    jax.config.update('jax_debug_nans', True)


def checkify_fn(fn):
    """Wrap ``fn`` with on-device float (NaN/Inf) error tracking.

    Returns a function with signature ``(*args) -> (err, out)``; call
    ``err.throw()`` on host to raise at the first offending op.

    Only ``float_checks`` — checkify's ``index_checks`` scatter-OOB
    instrumentation (jax 0.9.0 checkify.py:709 ``scatter_oob``) crashes
    with an IndexError on the gather pattern ``take_along_axis`` emits in
    the Hungarian loss, and NaN/Inf localization is the point here.
    """
    return checkify.checkify(fn, errors=checkify.float_checks)
