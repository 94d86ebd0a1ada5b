"""Analytic DCT-II basis for the low-frequency trajectory prior.

The reference loads a precomputed 60x60 DCT matrix from
``../Data/DCT_Basis/60.mat`` and keeps the first DCT_NUM=5 rows
(global_optimization.py:131-136). We generate the orthonormal DCT-II
basis analytically so there is no data-file dependency.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dct_basis(n: int, k: int) -> jnp.ndarray:
    """Return [n, k] matrix whose columns are the first k orthonormal
    DCT-II basis vectors of length n.

    Column 0 is the constant vector, column j oscillates at frequency
    j/(2n). Matches the layout the reference uses after its
    ``mtx[:DCT_NUM].T`` transpose (global_optimization.py:134-136):
    trajectories [n] are reconstructed as ``basis @ coeffs[k]``.
    """
    t = np.arange(n)[:, None]           # sample index
    f = np.arange(k)[None, :]           # frequency index
    basis = np.cos(np.pi * (2 * t + 1) * f / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[:, 0] /= np.sqrt(2.0)
    return jnp.asarray(basis, dtype=jnp.float32)
