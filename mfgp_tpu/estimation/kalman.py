"""Kalman filtering as pure functions + `lax.scan` trajectory filters.

Replaces the reference's textbook KF pair (reference/GraceObservers.py:16-30)
and the per-row Python loop of its trajectory-estimate generator
(reference/trajectoryEstimateGenerator.py:51-72) with a single scanned,
jittable filter. One `lax.scan` covers a full 36k-step trajectory in one
device launch; vmap over the scan batches whole trajectory sweeps
(10 trajectories x 3 noise levels in the reference's study design).

Semantics preserved from the reference pipeline (C16 in SURVEY.md §2):

* 6-state constant-velocity model (x, y, z, vx, vy, vz), A(dt) integrating
  velocity into position, no control input (B=0).
* GPS gating: x/y position measurements only enter when the true depth is
  at the surface (``z <= atSurface``), via a time-varying H
  (reference/trajectoryEstimateGenerator.py:62-63).
* Process noise scaled per-step as Q*dt; velocity pseudo-measurements from
  finite differences of the ground-truth positions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def kf_update(x, P, z, H, R):
    """Linear measurement update (Joseph-free, matching the reference's
    ``(I-KH)P`` form, reference/GraceObservers.py:16-23)."""
    PHT = P @ H.T
    S = H @ PHT + R
    K = jnp.linalg.solve(S.T, PHT.T).T  # PH^T S^-1 without explicit inverse
    x = x + K @ (z - H @ x)
    P = (jnp.eye(P.shape[0], dtype=P.dtype) - K @ H) @ P
    return x, P


def kf_predict(x, u, A, B, P, Q):
    """Linear time update ``x <- Ax + Bu``, ``P <- APA^T + Q``
    (reference/GraceObservers.py:25-30). Pass ``B=None`` for no input."""
    x = A @ x
    if B is not None:
        x = x + B @ u
    P = A @ P @ A.T + Q
    return x, P


def kf_step(x, P, u, z, A, B, Q, H, R):
    """predict + update in one call (the per-tick pattern of every driver
    loop, e.g. reference/PhysicalExperimentCode/
    GraceExplorationExperiments_MFEGP.py:224-229)."""
    x, P = kf_predict(x, u, A, B, P, Q)
    return kf_update(x, P, z, H, R)


class KFModel(NamedTuple):
    """Constant-velocity 6-state model matrices (SURVEY C26 config values,
    reference/exploreSimSettings.py:143-152)."""

    P0: jax.Array  # (6, 6) initial covariance
    Q: jax.Array  # (6, 6) process noise (per unit time)
    R: jax.Array  # (6, 6) measurement noise
    meas_noise_std: jax.Array  # (6,) additive noise on simulated measurements
    at_surface: float  # GPS gate depth threshold

    @staticmethod
    def A(dt, dtype=jnp.float64):
        """x,y,z integrate vx,vy,vz."""
        A = jnp.eye(6, dtype=dtype)
        return A.at[0, 3].set(dt).at[1, 4].set(dt).at[2, 5].set(dt)


@partial(jax.jit, static_argnames=())
def filter_trajectory(model: KFModel, t, pos_true, key):
    """Run the full estimate-generation filter over a recorded trajectory.

    t: (T,) timestamps; pos_true: (T, 3) ground-truth positions; key: PRNG.

    Returns a dict of (T-1,)-shaped columns matching the reference's
    ``T<seed>_<vmn>.csv`` schema
    (reference/trajectoryEstimateGenerator.py:47: t,x,y,z,xh,yh,zh,
    sigx,sigy,sigz,xe,ye,ze). Step j consumes row j-1's position (the
    reference's off-by-one loop convention) and the finite-difference
    velocity between rows j-1 and j.
    """
    T = t.shape[0]
    dtype = pos_true.dtype
    dts = t[1:] - t[:-1]  # (T-1,)
    vels = (pos_true[1:] - pos_true[:-1]) / dts[:, None]  # (T-1, 3)
    noise = model.meas_noise_std[None, :] * jax.random.normal(
        key, (T - 1, 6), dtype)

    x0 = jnp.concatenate([pos_true[0], jnp.zeros(3, dtype)])[:, None]

    def step(carry, inp):
        x, P = carry
        pos_prev, vel, dt, eps = inp
        z = jnp.concatenate([pos_prev, vel])[:, None] + eps[:, None]
        gps = (pos_prev[2] <= model.at_surface).astype(dtype)
        H = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0], dtype)
                     * jnp.concatenate([jnp.array([gps, gps], dtype),
                                        jnp.ones(4, dtype)]))
        A = KFModel.A(dt, dtype)
        x, P = kf_predict(x, None, A, None, P, model.Q * dt)
        x, P = kf_update(x, P, z, H, model.R)
        diagP = jnp.diagonal(P)
        out = (x[:3, 0], diagP[:3], pos_prev - x[:3, 0])
        return (x, P), out

    (_, _), (xh, sig, err) = jax.lax.scan(
        step, (x0, model.P0), (pos_true[:-1], vels, dts, noise))
    return {
        "t": t[:-1], "pos": pos_true[:-1], "xh": xh, "sig": sig, "err": err,
    }


def fidelity_bin(cov_trace_half, fidlevels):
    """Fidelity label from localization covariance (SURVEY C18).

    ``covComp = 0.5 tr(P_xy)`` -> level 1 (best) / 2 / 3 against thresholds
    (reference/prepGPData.py:58-65). Vectorized over points.
    """
    c = jnp.asarray(cov_trace_half)
    return jnp.where(c < fidlevels[0], 1, jnp.where(c < fidlevels[1], 2, 3))
