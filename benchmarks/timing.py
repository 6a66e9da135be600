"""Reliable TPU timing under the axon relay.

``block_until_ready`` is a no-op through the relay (verified: an 8k bf16
matmul "finishes" in 25us => 43 PFLOPs), so the only trustworthy sync is
a device->host transfer that *depends* on the computation.  ``timeit``
chains N iterations (each feeding the next), fetches one scalar, and uses
a two-point measurement (N1 vs N2 iterations) so the fixed relay/transfer
overhead cancels:

    per_iter = (t(N2) - t(N1)) / (N2 - N1)
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _run_chained(step: Callable, carry, n: int):
    t0 = time.perf_counter()
    for _ in range(n):
        carry = step(carry)
    # force full queue drain with a dependent scalar fetch
    leaves = [x for x in jax.tree_util.tree_leaves(carry)
              if hasattr(x, "dtype")]
    s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves[:1])
    float(s)
    return time.perf_counter() - t0


def timeit(step: Callable, carry, n1: int = 5, n2: int = 25,
           warmup: int = 2) -> float:
    """Seconds per iteration of ``carry = step(carry)``."""
    _run_chained(step, carry, warmup)  # compile + warm
    t1 = _run_chained(step, carry, n1)
    t2 = _run_chained(step, carry, n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)
