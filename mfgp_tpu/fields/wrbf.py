"""Synthetic scalar fields (weighted radial point sources).

SURVEY C15: the reference's WRBF field
(reference/exploreSimSettings.py:74-86) — sum of Gaussian point sources
with per-axis weights — plus the random-field generator used by the data
pipeline (reference/measFieldData.py:30-32) and reader/writer for the
``FieldSettings<seed>.txt`` artifact format
(reference/exploreSimSettings.py:40-72,103-107).

The field evaluation is one (M, S) broadcast — vmap-free, jittable, and
batched over grid points by construction (the reference loops per point in
``vectorWRBFField``).
"""

from __future__ import annotations

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class WRBFField(NamedTuple):
    """``f(x) = sum_i L * exp(-(s * |(x - p_i) o w|)^2)``.

    p: (S, 3) source locations; L: amplitude; s: sharpness; w: (3,) axis
    weights (reference/exploreSimSettings.py:74-79).
    """

    p: jax.Array
    L: jax.Array
    s: jax.Array
    w: jax.Array
    offset: float = 0.0

    def __call__(self, x) -> jax.Array:
        """Evaluate at (M, 3) points -> (M,). Accepts (3,) for one point."""
        x = jnp.atleast_2d(jnp.asarray(x))
        d = self.s * jnp.linalg.norm(
            (x[:, None, :] - self.p[None, :, :]) * self.w, axis=2)
        return jnp.sum(self.L * jnp.exp(-(d**2)), axis=1) + self.offset

    def column(self, x) -> jax.Array:
        """(M, 1)-shaped output, the reference's ``vectorWRBFField`` shape
        (reference/exploreSimSettings.py:82-86)."""
        return self(x)[:, None]

    def point_fn(self):
        """Host-side ``f(x, y, z) -> float`` closure in plain numpy — for
        per-tick sensor reads in the robot runtime loop, where a device
        round-trip per sample would be pure latency."""
        p = np.asarray(self.p)
        L, s = float(self.L), float(self.s)
        w = np.asarray(self.w)
        off = float(self.offset)

        def f(x, y, z):
            d = s * np.linalg.norm((np.array([x, y, z]) - p) * w, axis=1)
            return float(np.sum(L * np.exp(-(d**2))) + off)

        return f


def default_sim_field(WS, max_depth, dtype=jnp.float64) -> WRBFField:
    """The fixed 5-source sim field (reference/exploreSimSettings.py:100-101)."""
    xm, ym = WS[0][1], WS[1][1]
    p = jnp.asarray([
        [0.7 * xm, 0.7 * ym, 0.5 * max_depth],
        [0.3 * xm, 0.2 * ym, max_depth],
        [0.1 * xm, 0.9 * ym, max_depth],
        [0.6 * xm, 0.1 * ym, 0.3 * max_depth],
        [0.1 * xm, 0.1 * ym, max_depth],
    ], dtype)
    w = 0.5 * jnp.asarray([3.0, 2.0, 1.0], dtype)
    return WRBFField(p=p, L=jnp.asarray(10.0, dtype), s=jnp.asarray(0.5, dtype), w=w)


def random_field(rng: np.random.Generator, WS, max_depth) -> WRBFField:
    """Random 5-source field with the reference pipeline's distributions
    (reference/measFieldData.py:30-31): uniform source placement (source 1
    pinned to the bottom, source 3 at 0.3*maxDepth), L ~ U(0,10),
    s ~ U(0,0.5), w ~ 0.5*U(0,5)^3.

    Host-side numpy RNG on purpose: field draws happen once per dataset in
    the pipeline, and the reference's artifact format stores the drawn
    values, not the seed state.
    """
    xm, ym = WS[0][1], WS[1][1]
    zs = [rng.random() * max_depth, max_depth, rng.random() * max_depth,
          0.3 * max_depth, rng.random() * max_depth]
    p = np.array([[rng.random() * xm, rng.random() * ym, z] for z in zs])
    L = 10 * rng.random()
    s = 0.5 * rng.random()
    w = 0.5 * np.array([5 * rng.random(), 5 * rng.random(), 5 * rng.random()])
    return WRBFField(p=jnp.asarray(p), L=jnp.asarray(L), s=jnp.asarray(s),
                     w=jnp.asarray(w))


def write_field_settings(path, field: WRBFField, WS=None, max_depth=None,
                         meas_noise=None):
    """Write a ``FieldSettings`` artifact in the reference's exact text
    format so its parsers/plotters can read our outputs
    (reference/measFieldData.py:35-42)."""
    L = float(field.L); s = float(field.s)
    w = np.asarray(field.w); p = np.asarray(field.p)
    with open(path, "w") as f:
        f.write("Type: WRBFField\n")
        if WS is not None:
            f.write("WS: " + str(np.asarray(WS)) + "\n")
        if max_depth is not None:
            f.write("maxDepth: " + str(max_depth) + "\n")
        f.write("L,s,w: " + str((L, s, w)) + "\n")
        f.write("sources:\n" + str(p) + "\n")
        if meas_noise is not None:
            f.write("measNois:" + str(meas_noise) + "\n")


def parse_field_settings(path) -> WRBFField:
    """Read a ``FieldSettings`` artifact (ours or the reference's).

    Same grammar as reference/exploreSimSettings.py:40-72: an ``L,s,w:``
    tuple line (parsed without ``eval`` — the reference evals it) and a
    ``sources:`` block of bracketed rows terminated by the next ``key:``
    line.
    """
    lines = open(path).read().splitlines()
    lsw_line = next(l for l in lines if l.startswith("L,s,w:"))
    body = lsw_line.split(":", 1)[1].strip()
    nums = [float(v) for v in re.findall(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", body)]
    L, s, w = nums[0], nums[1], np.array(nums[2:5])

    src_rows = []
    grab = False
    for line in lines:
        if line.strip().startswith("sources:"):
            grab = True
            tail = line.split(":", 1)[1].strip()
            if tail:
                src_rows.append(tail.replace("[", "").replace("]", ""))
            continue
        if grab:
            if re.match(r"^\w+:", line):
                break
            src_rows.append(line.replace("[", "").replace("]", ""))
    p = np.loadtxt("\n".join(r for r in src_rows if r.strip()).splitlines())
    p = np.atleast_2d(p)
    return WRBFField(p=jnp.asarray(p), L=jnp.asarray(L), s=jnp.asarray(s),
                     w=jnp.asarray(w))
