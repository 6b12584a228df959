"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfgp_tpu.models.gp import GP
from mfgp_tpu.models.mfgp import MFGP, stack_fidelity_lists
from mfgp_tpu.models import mfgp as mf
from mfgp_tpu.ops.linalg import weighted_mse
from mfgp_tpu.parallel import (fit_sharded, make_mesh,
                               make_sharded_ar1_cross_cov,
                               make_sharded_gp_predict,
                               make_sharded_mfgp_predict,
                               make_sharded_weighted_mse)
from mfgp_tpu.parallel.train import make_mfgp_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh(8)


@pytest.fixture
def problem(rng):
    N, D, M = 40, 3, 37  # deliberately not divisible by the shard count
    X = rng.normal(size=(N, D))
    y = np.sin(X.sum(axis=1))
    fid = rng.integers(0, 3, N)
    grid = rng.normal(size=(M, D))
    return X, fid, y, grid


def test_mesh_shape(mesh):
    assert mesh.shape["dp"] * mesh.shape["mp"] == 8
    assert make_mesh(1).shape == {"dp": 1, "mp": 1}


def test_sharded_gp_predict_matches_local(mesh, problem):
    X, _, y, grid = problem
    gp = GP(X, y, jitter=1e-10)
    mu_l, var_l = gp.predict(grid)
    mu_s, var_s = make_sharded_gp_predict(mesh)(gp.params, gp.state,
                                                jnp.asarray(grid))
    np.testing.assert_allclose(mu_s, mu_l, rtol=1e-12)
    np.testing.assert_allclose(var_s, var_l, rtol=1e-10, atol=1e-12)


def test_sharded_mfgp_predict_matches_local(mesh, problem):
    X, fid, y, grid = problem
    m = MFGP(X, fid, y, jitter=1e-10)
    grid_fid = np.full(grid.shape[0], 2, np.int32)
    mu_l, var_l = m.predict(grid)
    mu_s, var_s = make_sharded_mfgp_predict(mesh)(
        m.params, m.state, jnp.asarray(grid), jnp.asarray(grid_fid))
    np.testing.assert_allclose(mu_s, mu_l, rtol=1e-12)
    np.testing.assert_allclose(var_s, var_l, rtol=1e-10, atol=1e-12)


def test_sharded_wmse_matches_local(mesh, rng):
    M = 37
    A = rng.normal(size=(M, M))
    Sigma = A @ A.T + M * np.eye(M)
    err = rng.normal(size=M)
    w_local = float(weighted_mse(jnp.asarray(err), jnp.asarray(Sigma)))
    w_shard = float(make_sharded_weighted_mse(mesh)(jnp.asarray(err),
                                                    jnp.asarray(Sigma)))
    assert abs(w_local - w_shard) < 1e-12 * max(1.0, abs(w_local))


def test_sharded_cross_cov_matches_local(mesh, problem, rng):
    X, fid, y, grid = problem
    m = MFGP(X, fid, y)
    grid_fid = rng.integers(0, 3, grid.shape[0]).astype(np.int32)
    from mfgp_tpu.ops import kernels as k

    K_local = k.ar1_cov(jnp.asarray(grid), jnp.asarray(grid_fid),
                        jnp.asarray(X), jnp.asarray(fid, jnp.int32),
                        m.params.variances, m.params.lengthscales,
                        m.params.rhos)
    K_shard = make_sharded_ar1_cross_cov(mesh)(
        jnp.asarray(grid), jnp.asarray(grid_fid), jnp.asarray(X),
        jnp.asarray(fid, jnp.int32), m.params)
    np.testing.assert_allclose(K_shard, K_local, rtol=1e-13)


def test_train_step_improves_and_selects_best(mesh, problem):
    X, fid, y, grid = problem
    init_fn, step_fn, prepare_grid = make_mfgp_train_step(
        mesh, learning_rate=0.05)
    gpad, gfpad, M = prepare_grid(grid)
    state = init_fn(jax.random.key(0), 8, 3, X.shape[1], jnp.float64)
    Xj = jnp.asarray(X)
    fj = jnp.asarray(fid, jnp.int32)
    yj = jnp.asarray(y)
    first = None
    for i in range(25):
        state, losses, mu, var = step_fn(state, Xj, fj, yj, gpad, gfpad)
        if first is None:
            first = float(jnp.min(losses))
    assert np.isfinite(np.asarray(losses)).all()
    assert float(jnp.min(losses)) < first  # batched Adam made progress
    assert np.isfinite(np.asarray(mu[:M])).all()
    assert (np.asarray(var[:M]) > 0).all()
    # rhos stayed fixed (reference kern.scale.fix([1,1]))
    np.testing.assert_array_equal(np.asarray(state.params.rhos),
                                  np.ones((8, 2)))


def test_fit_sharded_driver(mesh, problem):
    X, fid, y, grid = problem
    best, losses, mu, var = fit_sharded(mesh, X, fid, y, grid, steps=10,
                                        dtype=jnp.float64)
    assert mu.shape == (grid.shape[0],)
    assert np.isfinite(np.asarray(losses)).all()
    # best params reproduce a finite NLML locally
    val = mf.nlml(best, jnp.asarray(X), jnp.asarray(fid, jnp.int32),
                  jnp.asarray(y), jitter=1e-6)
    assert np.isfinite(float(val))
