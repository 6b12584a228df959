"""Training-set-size study (SURVEY C22, reference/HowManyPoints.py:62-109).

How many (grid-sampled) training points does the SFGP need for a target
test-grid RMSE on a WRBF field? The reference fits one model per size
serially; here every size in the sweep shares one jitted fit/predict pair
and the whole sweep can vmap over fields.

(The reference file also contains unused toy dynamics with undefined-var
bugs — graceSimple/Unicycle3D/singleIntegrator3D — dead code, not ported;
SURVEY §2 C22.)
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from mfgp_tpu.fields.wrbf import WRBFField, default_sim_field
from mfgp_tpu.models.gp import GP
from mfgp_tpu.utils.configs import SimConfig


def grid_samples(WS, max_depth, nums=(8, 16, 8)) -> np.ndarray:
    """The reference's 8x16x8 grid-sampled candidate training set."""
    axes = [np.linspace(WS[0][0], WS[0][1], nums[0]),
            np.linspace(WS[1][0], WS[1][1], nums[1]),
            np.linspace(0.0, max_depth, nums[2])]
    g = np.meshgrid(*axes)
    return np.array([a.ravel() for a in g]).T


def training_size_study(sizes: Sequence[int], cfg: SimConfig | None = None,
                        field: WRBFField | None = None, noise: float = 0.125,
                        seed: int = 0, optimize: bool = True,
                        restarts: int = 4):
    """RMSE on the sim test grid vs number of training points.

    Returns a list of dicts {n, rmse, nlml}. Training points are drawn
    without replacement from the dense candidate grid (matching the
    reference's random grid subset), targets from the WRBF field + noise.
    """
    cfg = cfg or SimConfig()
    field = field or default_sim_field(cfg.WS, cfg.max_depth)
    rng = np.random.default_rng(seed)
    cand = grid_samples(cfg.WS, cfg.max_depth)
    y_cand = np.asarray(field(jnp.asarray(cand)))
    y_cand = y_cand + noise * rng.standard_normal(y_cand.shape[0])
    tp = cfg.test_points()
    f_true = np.asarray(field(jnp.asarray(tp)))

    out = []
    for n in sizes:
        idx = rng.choice(cand.shape[0], size=min(n, cand.shape[0]),
                         replace=False)
        gp = GP(cand[idx], y_cand[idx], jitter=1e-6)
        if optimize:
            gp.optimize_restarts(n_restarts=restarts, maxiter=150,
                                 seed=seed)
        mu, _ = gp.predict(tp)
        rmse = float(np.sqrt(np.mean((np.asarray(mu) - f_true) ** 2)))
        out.append({"n": int(len(idx)), "rmse": rmse,
                    "nlml": -gp.log_likelihood()})
    return out
