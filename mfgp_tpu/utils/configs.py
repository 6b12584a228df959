"""Declarative configuration (SURVEY C26).

The reference's configuration is *executable* import-time module state
(reference/exploreSimSettings.py seeds the global RNG at import :90, builds
the agent :174-196, writes CSV headers; reference/PhysicalExperimentCode/
exploreExpSettings.py:216-298 likewise). Here the same parameter surface is
plain frozen dataclasses with the reference's parameter names kept, zero
side effects, and explicit constructors for derived objects (KF models,
agent configs, eval grids).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Tuple

import numpy as np

from mfgp_tpu.planning.primitives import AgentConfig


@dataclass(frozen=True)
class KFConfig:
    """6-state constant-velocity filter constants
    (reference/exploreSimSettings.py:143-153)."""

    p0: float = 0.001
    q_diag: Tuple[float, ...] = (0.005, 0.005, 0.005, 0.05, 0.05, 0.05)
    r_diag: Tuple[float, ...] = (0.1, 0.1, 0.05, 0.25, 0.25, 0.25)
    meas_noise: Tuple[float, ...] = (0.05, 0.05, 0.02, 0.2, 0.2, 0.2)
    at_surface: float = 0.2

    def model(self, dtype=np.float64):
        import jax.numpy as jnp

        from mfgp_tpu.estimation.kalman import KFModel

        return KFModel(
            P0=self.p0 * jnp.eye(6, dtype=dtype),
            Q=jnp.diag(jnp.asarray(self.q_diag, dtype)),
            R=jnp.diag(jnp.asarray(self.r_diag, dtype)),
            meas_noise_std=jnp.asarray(self.meas_noise, dtype),
            at_surface=self.at_surface,
        )


@dataclass(frozen=True)
class SimConfig:
    """Simulation-pipeline settings (reference/exploreSimSettings.py:88-206).

    Parameter names follow the reference so recorded artifacts and settings
    files line up 1:1.
    """

    seed: int = 0
    WS: Tuple[Tuple[float, float], ...] = ((0.0, 10.0), (0.0, 20.0))
    max_depth: float = 10.0
    vmn: float = 0.2  # velocity measurement noise (m/s)^2
    dt: float = 0.1
    at_surface: float = 0.2
    meas_noise: float = 0.125  # field measurement noise
    meas_rate: float = 0.2  # Hz, GP-data downsample (reference/prepGPData.py:17)
    t_cut: float = 3600.0  # dataset time cutoff (reference/GPTrainers.py:37)
    field_offset: float = 0.0
    # planner (reference/exploreSimSettings.py:198-205)
    B: float = 150.0
    BD: int = 10
    same_node_distance: float = 1.0
    max_iter: int = 100
    Rd: float = 5.0
    near_rad: float = 1.25
    step_size: float = 10.0
    goal_var: float = 4.0  # 2**2
    normalize_wmse: bool = True
    kf: KFConfig = field(default_factory=KFConfig)

    @property
    def fidlevels(self) -> Tuple[float, float, float]:
        """``(min(diff(WS)) * [.05,.15,.25])**2``
        (reference/exploreSimSettings.py:108)."""
        spans = [hi - lo for lo, hi in self.WS]
        m = min(spans)
        return tuple((m * f) ** 2 for f in (0.05, 0.15, 0.25))

    @property
    def kf_meas_noise(self) -> Tuple[float, ...]:
        """Measurement-noise std vector with the velocity-noise level
        spliced in (reference/exploreSimSettings.py:154)."""
        return (0.05, 0.05, 0.02, self.vmn, self.vmn, self.vmn)

    def kf_model(self, dtype=np.float64):
        return replace(self.kf, meas_noise=self.kf_meas_noise,
                       at_surface=self.at_surface).model(dtype)

    def test_points(self, nums=(10, 20, 10)) -> np.ndarray:
        """The 2000-point eval grid, Fortran raveled to match the
        reference's ``testPoints`` ordering
        (reference/exploreSimSettings.py:116-119)."""
        specs = [
            np.linspace(self.WS[0][0], self.WS[0][1], nums[0]),
            np.linspace(self.WS[1][0], self.WS[1][1], nums[1]),
            np.linspace(0.0, self.max_depth, nums[2]),
        ]
        grids = np.meshgrid(*specs)
        return np.array([g.ravel("F") for g in grids]).T

    def agent(self) -> AgentConfig:
        cfg = AgentConfig.sim_defaults()
        return replace(
            cfg,
            fid_levels=self.fidlevels,
            max_depth=self.max_depth,
        )


@dataclass(frozen=True)
class ExperimentConfig:
    """Physical-experiment-shaped settings (reference/PhysicalExperimentCode/
    exploreExpSettings.py) for the closed-loop simulator: the robot grid,
    budget, replan cadence, and model-variant switchboard."""

    sim: SimConfig = field(default_factory=SimConfig)
    B: float = 80.0  # robot energy budget (exploreExpSettings.py:253)
    BD: int = 10
    plan_wallclock: float = 45.0  # s per replan (exploreExpSettings.py:214)
    multi_fidelity: bool = True
    ergodic: bool = True  # False -> information-gain scoring
    alpha_auto: bool = False  # EID auto-alpha (exploreExpSettings.py:71)
    update_hyps: bool = True  # retrain at replan (exploreExpSettings.py:73)
    kernel: str = "rbf"  # physical drivers use "matern32"

    @property
    def variant(self) -> str:
        """The reference's 5-script experiment matrix as a name
        (SURVEY C25): MFEGP / MFGP / SFEGP / SFGP (+Manual separately)."""
        return (("MF" if self.multi_fidelity else "SF")
                + ("E" if self.ergodic else "") + "GP")


DEFAULT_SIM = SimConfig()
