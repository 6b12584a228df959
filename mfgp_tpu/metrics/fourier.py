"""Fourier/Sobolev ergodic metric (cosine basis).

SURVEY C11 (reference/PhysicalExperimentCode/ergodicMetric.py): Fourier
coefficients of trajectory / target distributions on a rectangular domain,
Sobolev-weighted spectral distance, and incremental coefficient merging for
streaming trajectories. The basis evaluation is one (M, N) outer product
of cosines instead of the reference's per-coefficient loop
(reference/PhysicalExperimentCode/ergodicMetric.py:70-74).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def config_k(*specs):
    """Fourier index set. Each spec is (num_k, L) — number of coefficients
    and domain length per dimension
    (reference/PhysicalExperimentCode/ergodicMetric.py:24-38). Returns
    (prod(num_k), dim) scaled indices k_i/L_i."""
    ks = np.meshgrid(*[np.arange(0, s[0]) / s[1] for s in specs])
    return np.array([k.ravel() for k in ks]).T


def basis_norms(k):
    """Normalization h_k = sqrt(prod (2k + sin 2k)/(4k)), with the k=0 limit
    1 (reference/PhysicalExperimentCode/ergodicMetric.py:40-47)."""
    k = jnp.asarray(k)
    hk = jnp.where(k == 0, 1.0, (2.0 * k + jnp.sin(2.0 * k)) / (4.0 * k))
    return jnp.sqrt(jnp.prod(hk, axis=1))


def sobolev_weights(k):
    """lambda_k = (1 + |k|^2)^(-(d+1)/2)
    (reference/PhysicalExperimentCode/ergodicMetric.py:49-54)."""
    k = jnp.asarray(k)
    d = k.shape[1]
    return (1.0 + jnp.sum(k**2, axis=1)) ** (-(d + 1.0) / 2.0)


def fourier_basis(x, k):
    """Cosine basis F[m, n] = prod_d cos(pi * x[n,d] * k[m,d]).

    x: (N, d) points, k: (M, d) indices -> (M, N), the reference's ``fk``
    layout (reference/PhysicalExperimentCode/ergodicMetric.py:65-74), but as
    a single broadcast + product reduction.
    """
    x = jnp.asarray(x)
    k = jnp.asarray(k)
    return jnp.prod(jnp.cos(jnp.pi * x[None, :, :] * k[:, None, :]), axis=-1)


def fourier_coefficients(x, w, k, hk=None):
    """Coefficients c_k = mean_n(F[k, n] * w[n]) / h_k
    (reference/PhysicalExperimentCode/ergodicMetric.py:76-87).

    For a trajectory distribution pass w = ones (Dirac time statistics);
    for a target function over a grid pass the function values.
    """
    if hk is None:
        hk = basis_norms(k)
    w = jnp.asarray(w).reshape(-1)
    return jnp.mean(fourier_basis(x, k) * w[None, :], axis=1) / hk


def merge_coefficients(coef1, coef2, dur1, dur2):
    """Duration-weighted streaming merge
    (reference/PhysicalExperimentCode/ergodicMetric.py:89-96)."""
    tot = dur1 + dur2
    return (dur1 * coef1 + dur2 * coef2) / tot


def sobolev_norm(coef1, coef2, k):
    """Sobolev-weighted spectral distance
    (reference/PhysicalExperimentCode/ergodicMetric.py:98-104)."""
    return jnp.sum(sobolev_weights(k) * (jnp.asarray(coef1) - jnp.asarray(coef2)) ** 2)
