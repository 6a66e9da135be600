"""Common numeric helpers (``utils/common_utils.py`` equivalents)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(x):
    """[0, 1] -> [-1, 1] with clipping (common_utils.py:9)."""
    return jnp.clip(x * 2.0 - 1.0, -1.0, 1.0)


def unnormalize(x):
    """[-1, 1] -> [0, 1] with clipping (common_utils.py:15)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def split_list(a, n):
    """Split a list into n nearly-equal parts (common_utils.py:21) —
    used for sharding eval scenes across processes."""
    k, m = divmod(len(a), n)
    return [a[i * k + min(i, m):(i + 1) * k + min(i + 1, m)]
            for i in range(n)]


def huber(x, y, scaling: float = 0.1):
    """Smooth-L1 used for photometric losses (common_utils.py:183)."""
    diff_sq = (x - y) ** 2
    return (jnp.sqrt(jnp.clip(1 + diff_sq / (scaling ** 2), min=1e-4))
            - 1.0) * scaling


def to_uint8(img) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def hwc_to_chw(x):
    return np.moveaxis(np.asarray(x), -1, -3)


def chw_to_hwc(x):
    return np.moveaxis(np.asarray(x), -3, -1)
