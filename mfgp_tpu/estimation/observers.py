"""Rigid-body utilities and the glider body-velocity observer.

Covers SURVEY C6 (the live model-based observer,
reference/GraceObservers.py:140-215) and the rotation helpers
(reference/GraceObservers.py:32-57). The reference's dead observers
(SMO/HGSMO/velEstimator2/vyt*/fullStateObserver, SURVEY C7) are defined but
never called and contain undefined-variable bugs; they are deliberately not
ported — the extensible capability they represent is provided instead by the
:class:`Observer` protocol below, so new observers plug into the same
simulation loop.

All functions are pure jnp and jit/vmap-friendly; the observer integrates
with any host- or scan-driven loop.
"""

from __future__ import annotations

from typing import NamedTuple, Protocol

import jax
import jax.numpy as jnp


# -- rotations --------------------------------------------------------------
def skew(w):
    """Cross-product matrix (reference/GraceObservers.py:32-35)."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.array([[z, -wz, wy], [wz, z, -wx], [-wy, wx, z]])


def euler_to_rotm(roll, pitch, yaw):
    """ZYX Euler angles -> rotation matrix, matching the reference's
    convention (reference/GraceObservers.py:37-42)."""
    ca, sa = jnp.cos(roll), jnp.sin(roll)
    cb, sb = jnp.cos(pitch), jnp.sin(pitch)
    cg, sg = jnp.cos(yaw), jnp.sin(yaw)
    Rx = jnp.array([[1, 0, 0], [0, ca, sa], [0, -sa, ca]])
    Ry = jnp.array([[cb, 0, -sb], [0, 1, 0], [sb, 0, cb]])
    Rz = jnp.array([[cg, sg, 0], [-sg, cg, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def rotm_to_euler(R):
    """Rotation matrix -> (roll, pitch, yaw); branch-free version of
    reference/GraceObservers.py:44-51 (the reference returns None in the
    singular branch; we fall back to the standard gimbal-lock convention)."""
    sy = jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2)
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    pitch = jnp.arctan2(-R[2, 0], sy)
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    return roll, pitch, yaw


def flow_frame(alpha, beta):
    """Body->flow rotation (reference/GraceObservers.py:53-54)."""
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    return jnp.array([[ca * cb, -ca * sb, -sa],
                      [sb, cb, jnp.zeros_like(sa)],
                      [sa * cb, -sa * sb, cb]])


def euler_rate_matrix(roll, pitch):
    """Body rates -> Euler angle rates (reference/GraceObservers.py:56-57)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    tp, cp = jnp.tan(pitch), jnp.cos(pitch)
    return jnp.array([[1, tp * sr, tp * cr],
                      [0, cr, -sr],
                      [0, sr / cp, cr / cp]])


# -- glider hydrodynamic model ---------------------------------------------
class GliderParams(NamedTuple):
    """Hydrodynamic constants of the glider body-velocity observer.

    Field names follow the parameter unpacking order at
    reference/GraceObservers.py:157 (31-vector); only the entries the live
    observer actually reads are kept.
    """

    mc: float = 0.0  # chassis mass offset for ballast law
    lm: float = 0.0
    bc: float = 0.5  # ballast neutral position
    lp: float = 1.0  # pump position -> added mass scale
    g: float = 9.81
    m1: float = 1.0  # added-mass diagonal
    m2: float = 1.0
    m3: float = 1.0
    CD0: float = 0.2  # drag polar
    CaD: float = 1.0
    CdD: float = 0.1
    C_beta_FS: float = 0.5  # sideforce
    C_delta_FS: float = 0.1
    CL0: float = 0.0  # lift
    CaL: float = 5.0
    S: float = 0.01  # reference area
    rho: float = 1000.0  # water density


def buoyancy_mass(ppx, p: GliderParams):
    """Net ballast mass from pump position (reference/GraceObservers.py:172)."""
    return p.lp * (ppx - p.bc)


def body_velocity_observer(R, omega_b, vb_est, z, zhat, ppx, delta,
                           p: GliderParams, gains=(1.0, 1.0, 1.0)):
    """One derivative evaluation of the model-based body-velocity observer.

    Inputs: rotation matrix R (body->world), body rates omega_b (3,), current
    velocity estimate vb_est (3,), measured depth z, estimated depth zhat,
    pump position ppx, tail angle delta.
    Returns (dPos_est, dvb_est) world-position and body-velocity derivatives,
    reproducing the dynamics of reference/GraceObservers.py:140-215: drag /
    sideforce / lift in the flow frame, ballast gravity term, rigid-body
    Coriolis, and depth-error injection on both states.
    """
    v1, v2, v3 = vb_est[0], vb_est[1], vb_est[2]
    V = jnp.sqrt(v1**2 + v2**2 + v3**2)
    alpha = jnp.arctan2(v3, v1)
    beta = jnp.where(v2 == 0, 0.0, jnp.arcsin(jnp.where(V > 0, v2 / jnp.maximum(V, 1e-12), 0.0)))

    q = 0.5 * p.rho * V**2 * p.S
    D = q * (p.CD0 + p.CaD * alpha**2 + p.CdD * delta**2)
    FS = q * (p.C_beta_FS * beta + p.C_delta_FS * delta)
    L = q * (p.CL0 + p.CaL * alpha) * jnp.cos(alpha)

    R_bv = flow_frame(alpha, beta)
    F_ext = R_bv @ jnp.array([-D, FS, -L])
    M = jnp.diag(jnp.array([p.m1, p.m2, p.m3]))
    m0 = buoyancy_mass(ppx, p)
    k = jnp.array([0.0, 0.0, 1.0])
    coriolis = jnp.cross(M @ vb_est, omega_b)
    v_b_dot = jnp.linalg.solve(M, coriolis + m0 * p.g * (R.T @ k) + F_ext)

    K = jnp.diag(jnp.asarray(gains, vb_est.dtype))
    depth_err = jnp.array([0.0, 0.0, z - zhat])
    dPos_est = R @ vb_est + 0.5 * depth_err
    dvb_est = v_b_dot + K @ (R.T @ depth_err)
    return dPos_est, dvb_est


# -- extensible observer interface (replaces the reference's dead C7 zoo) ---
class Observer(Protocol):
    """An observer maps (state_estimate, measurements, dt) -> state_estimate.

    Implementations must be pure (jit/vmap-safe). The simulation loop and
    the drivers accept any Observer; `KalmanObserver` and
    `BodyVelocityObserver` are the two the reference exercises.
    """

    def init(self) -> jax.Array: ...

    def step(self, state, measurement, dt): ...


class BodyVelocityObserver(NamedTuple):
    """Euler-integrated wrapper of :func:`body_velocity_observer` for use in
    scanned loops (the reference integrates it at ~10 Hz in the driver's
    main loop, reference/PhysicalExperimentCode/
    GraceExplorationExperiments_MFEGP.py:851-870, with a NaN reset guard)."""

    params: GliderParams
    gains: tuple = (1.0, 1.0, 1.0)

    def init(self):
        return jnp.zeros(3)

    def step(self, vb_est, meas, dt):
        R, omega_b, z, zhat, ppx, delta = meas
        _, dvb = body_velocity_observer(R, omega_b, vb_est, z, zhat, ppx,
                                        delta, self.params, self.gains)
        vb_new = vb_est + dt * dvb
        # NaN-reset guard (reference/...MFEGP.py:855-858)
        return jnp.where(jnp.any(jnp.isnan(vb_new)), jnp.zeros_like(vb_new),
                         vb_new)
