"""Harmonic (positional) embeddings.

Functional re-implementation of the PyTorch3D-style HarmonicEmbedding the
reference vendors in ``utils/common_utils.py:68-179`` (log-spaced
frequencies, sin block then cos block, optional appended input).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def harmonic_frequencies(n_harmonic_functions: int = 6, omega_0: float = 1.0,
                         logspace: bool = True) -> np.ndarray:
    if logspace:
        freqs = 2.0 ** np.arange(n_harmonic_functions, dtype=np.float32)
    else:
        freqs = np.linspace(
            1.0, 2.0 ** (n_harmonic_functions - 1), n_harmonic_functions,
            dtype=np.float32)
    return freqs * omega_0


def harmonic_embedding(x: jnp.ndarray, frequencies,
                       append_input: bool = True) -> jnp.ndarray:
    """Embed ``x`` (..., D) -> (..., D * (2 * n_freqs + append_input)).

    Layout matches the reference exactly: [sin(f_i * x_d) interleaved per
    input dim, then cos, then x] (``utils/common_utils.py:136-151``).
    """
    freqs = jnp.asarray(frequencies, x.dtype)
    embed = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    parts = [jnp.sin(embed), jnp.cos(embed)]
    if append_input:
        parts.append(x)
    return jnp.concatenate(parts, axis=-1)


@dataclasses.dataclass(frozen=True)
class HarmonicEmbedding:
    """Convenience callable bundling frequencies + output-dim bookkeeping."""

    n_harmonic_functions: int = 6
    omega_0: float = 1.0
    logspace: bool = True
    append_input: bool = True

    @property
    def frequencies(self) -> np.ndarray:
        return harmonic_frequencies(
            self.n_harmonic_functions, self.omega_0, self.logspace)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return harmonic_embedding(x, self.frequencies, self.append_input)

    def get_output_dim(self, input_dims: int = 3) -> int:
        return input_dims * (2 * self.n_harmonic_functions
                             + int(self.append_input))
