"""npz round-trip helpers.

Training dumps (latent_cache.npz) store bfloat16 arrays; plain ``np.load``
returns those as raw void ('V2') records unless ml_dtypes has registered
the dtype on THAT array, so every offline consumer needs the same coercion.
"""

from __future__ import annotations

import numpy as np


def as_f32(a: np.ndarray) -> np.ndarray:
    """Coerce an array loaded from npz (possibly raw-bfloat16) to float32."""
    a = np.asarray(a)
    if a.dtype.kind == 'V':
        import ml_dtypes
        a = a.view(ml_dtypes.bfloat16)
    return a.astype(np.float32)
