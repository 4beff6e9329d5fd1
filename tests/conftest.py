"""Test configuration: run everything on a virtual 8-device CPU mesh.

This emulates multi-chip TPU topology without hardware, per the test strategy
in SURVEY.md §4: sharding/collective code paths are exercised on
``jax.devices()`` with XLA's host-platform device-count override.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope='session')
def tokenizer():
    from superconductor_vae_tpu.tokenizer import default_tokenizer
    return default_tokenizer(max_len=30)


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(0)
