"""Test configuration: run everything on a virtual 8-device CPU mesh.

This emulates multi-chip TPU topology without hardware, per the test strategy
in SURVEY.md §4: sharding/collective code paths are exercised on
``jax.devices()`` with XLA's host-platform device-count override.
"""

import os

# Note: this machine's profile exports JAX_PLATFORMS=axon (the TPU tunnel) and
# the env var alone is not reliably honored, so we ALSO force the platform via
# jax.config below.  Running unit tests over the tunnel is both slow (per-op
# RTT) and numerically different (TPU matmuls default to bf16 passes).
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax

jax.config.update('jax_platforms', 'cpu')
# Persistent compile cache: repeated test runs skip XLA recompiles.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np
import pytest


@pytest.fixture(scope='session')
def tokenizer():
    from superconductor_vae_tpu.tokenizer import default_tokenizer
    return default_tokenizer(max_len=30)


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(0)
