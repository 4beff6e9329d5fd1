"""Runtime environment detection -> training configuration overrides.

Capability parity with the reference env_config
(reference: src/superconductor/utils/env_config.py:104-249, which detects
WSL2/Colab/Linux + GPU class and scales DataLoader workers / batch size /
compile mode).  The TPU equivalents: accelerator platform and chip count,
per-chip HBM, host core count — mapped to global batch size, RLOO sample
count, and prefetch depth.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional


@dataclasses.dataclass
class EnvironmentInfo:
    platform: str               # 'tpu' | 'gpu' | 'cpu'
    device_kind: str
    n_devices: int
    n_hosts: int
    host_cpu_count: int
    hbm_gb_per_device: float
    suggested_batch_size: int
    suggested_rloo_samples: int
    suggested_prefetch: int

    def as_overrides(self) -> Dict[str, int]:
        return {
            'batch_size': self.suggested_batch_size,
            'n_samples_rloo': self.suggested_rloo_samples,
        }


def _hbm_gb(device) -> float:
    try:
        stats = device.memory_stats()
        return stats.get('bytes_limit', 0) / 1e9
    except Exception:
        kind = getattr(device, 'device_kind', '').lower()
        if 'v5 lite' in kind or 'v5e' in kind:
            return 16.0
        if 'v4' in kind:
            return 32.0
        return 8.0


def detect_environment() -> EnvironmentInfo:
    import jax
    devices = jax.devices()
    platform = jax.default_backend()
    kind = getattr(devices[0], 'device_kind', platform)
    hbm = _hbm_gb(devices[0])

    # batch scaling mirroring the reference's GPU-class table
    # (env_config.py:146-148: A100-80GB gets x25 batch multiplier)
    if platform == 'tpu':
        per_chip = 512 if hbm >= 16 else 256
        rloo = 8 if hbm >= 16 else 4
    elif platform == 'gpu':
        per_chip = 128 if hbm >= 38 else 64 if hbm >= 15 else 48
        rloo = 4
    else:
        per_chip = 32
        rloo = 2

    return EnvironmentInfo(
        platform=platform,
        device_kind=str(kind),
        n_devices=len(devices),
        n_hosts=jax.process_count(),
        host_cpu_count=os.cpu_count() or 1,
        hbm_gb_per_device=hbm,
        suggested_batch_size=per_chip * len(devices),
        suggested_rloo_samples=rloo,
        suggested_prefetch=2,
    )
