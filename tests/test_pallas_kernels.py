"""Pallas fused-covariance kernel tests (interpret mode on CPU).

The compiled TPU path is exercised by bench/verify drives on hardware;
these tests pin exact semantics against the XLA composition.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mfgp_tpu.ops import kernels as k
from mfgp_tpu.ops.pallas_kernels import TILE, ar1_cov_fused, rbf_cov_fused


@pytest.fixture
def problem(rng):
    N, M, D, F = 300, 270, 3, 3  # deliberately not TILE-aligned
    X1 = rng.normal(size=(N, D)).astype(np.float32)
    X2 = rng.normal(size=(M, D)).astype(np.float32)
    f1 = rng.integers(0, F, N).astype(np.int32)
    f2 = rng.integers(0, F, M).astype(np.int32)
    var = jnp.asarray([2.0, 1.5, 0.7], jnp.float32)
    ls = jnp.asarray(rng.uniform(0.5, 2, (F, D)), jnp.float32)
    rho = jnp.asarray([1.1, 0.9], jnp.float32)
    return X1, f1, X2, f2, var, ls, rho


def test_ar1_fused_matches_xla(problem):
    X1, f1, X2, f2, var, ls, rho = problem
    K_ref = np.asarray(k.ar1_cov(
        jnp.asarray(X1), jnp.asarray(f1), jnp.asarray(X2), jnp.asarray(f2),
        var, ls, rho))
    K_pal = np.asarray(ar1_cov_fused(X1, f1, X2, f2, var, ls, rho,
                                     interpret=True))
    np.testing.assert_allclose(K_pal, K_ref, atol=1e-5)


def test_ar1_fused_gram_with_noise(problem, rng):
    X1, f1, _, _, var, ls, rho = problem
    noise = rng.uniform(0.1, 0.5, X1.shape[0]).astype(np.float32)
    K_ref = np.asarray(k.ar1_cov(
        jnp.asarray(X1), jnp.asarray(f1), jnp.asarray(X1), jnp.asarray(f1),
        var, ls, rho)) + np.diag(noise)
    K_pal = np.asarray(ar1_cov_fused(X1, f1, X1, f1, var, ls, rho,
                                     noise_diag=noise, interpret=True))
    np.testing.assert_allclose(K_pal, K_ref, atol=1e-5)
    # noise landed ONLY on the diagonal
    off = K_pal - np.asarray(ar1_cov_fused(X1, f1, X1, f1, var, ls, rho,
                                           interpret=True))
    np.testing.assert_allclose(off, np.diag(noise), atol=1e-6)


def test_rbf_fused_matches_xla(problem):
    X1, _, X2, _, _, _, _ = problem
    ls = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    K_ref = np.asarray(k.rbf(jnp.asarray(X1), jnp.asarray(X2), 1.7, ls))
    K_pal = np.asarray(rbf_cov_fused(X1, X2, 1.7, ls, interpret=True))
    np.testing.assert_allclose(K_pal, K_ref, atol=1e-5)


def test_tile_aligned_shapes(rng):
    """Exact-multiple-of-TILE shapes take the no-padding path."""
    N = TILE
    X = rng.normal(size=(N, 3)).astype(np.float32)
    f = np.zeros(N, np.int32)
    var = jnp.asarray([1.0], jnp.float32)
    ls = jnp.ones((1, 3), jnp.float32)
    rho = jnp.zeros((0,), jnp.float32)
    K_ref = np.asarray(k.rbf(jnp.asarray(X), jnp.asarray(X), 1.0,
                             jnp.ones(3)))
    K_pal = np.asarray(ar1_cov_fused(X, f, X, f, var, ls, rho,
                                     interpret=True))
    np.testing.assert_allclose(K_pal, K_ref, atol=1e-5)


def test_covariance_dispatch(rng, monkeypatch):
    """ops.covariance routes forward assembly: XLA on CPU/f64, Pallas on
    TPU/f32/rbf (VERDICT r1 item 3: fused kernel default on the hot path)."""
    import jax
    import jax.numpy as jnp

    from mfgp_tpu.ops import covariance as cov
    from mfgp_tpu.ops import kernels as _k

    # decision logic
    assert not cov.use_pallas(jnp.float64, "rbf")  # f64 -> XLA
    assert not cov.use_pallas(jnp.float32, "cosine")  # kernel -> XLA
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cov.use_pallas(jnp.float32, "rbf")
    # matern32 (fused since r3) additionally gates on the one-time TPU
    # smoke probe; auto mode consults the cached probe result
    monkeypatch.setitem(cov._MATERN_PROBE, "ok", True)
    assert cov.use_pallas(jnp.float32, "matern32")
    monkeypatch.setitem(cov._MATERN_PROBE, "ok", False)
    assert not cov.use_pallas(jnp.float32, "matern32")  # probe fallback
    monkeypatch.setenv("MFGP_TPU_MATERN_PALLAS", "1")
    assert cov.use_pallas(jnp.float32, "matern32")  # forced on
    monkeypatch.setenv("MFGP_TPU_MATERN_PALLAS", "0")
    assert not cov.use_pallas(jnp.float32, "matern32")  # forced off
    monkeypatch.delenv("MFGP_TPU_MATERN_PALLAS")
    monkeypatch.setenv("MFGP_TPU_DISABLE_PALLAS", "1")
    assert not cov.use_pallas(jnp.float32, "rbf")  # kill switch
    monkeypatch.undo()

    # XLA path equals the raw kernels composition
    X = rng.normal(size=(17, 3))
    fid = rng.integers(0, 3, 17)
    v = jnp.asarray([1.5, 1.0, 0.5])
    ls = jnp.ones((3, 3)) * 1.3
    rhos = jnp.asarray([0.9, 0.8])
    noises = jnp.asarray([0.1, 0.05, 0.01])
    Kn = cov.mf_train_cov(v, ls, rhos, noises, jnp.asarray(X),
                          jnp.asarray(fid), 1e-6, "rbf")
    K = _k.ar1_cov(X, fid, X, fid, v, ls, rhos, "rbf")
    ref = np.asarray(K) + np.diag(np.asarray(noises)[fid] + 1e-6)
    np.testing.assert_allclose(np.asarray(Kn), ref, rtol=1e-12)
    C = cov.sf_cross_cov(2.0, jnp.ones(3), jnp.asarray(X),
                         jnp.asarray(X[:5]), "matern32")
    np.testing.assert_allclose(
        np.asarray(C), np.asarray(_k.KERNELS["matern32"](X, X[:5], 2.0,
                                                         jnp.ones(3))),
        rtol=1e-12)


@pytest.mark.parametrize("kernel", ["rbf", "matern32"])
def test_ar1_custom_vjp_gradients_match_autodiff(rng, kernel):
    """The fused covariance's custom VJP (Pallas forward in interpret mode
    here, closed-form contraction backward) matches plain autodiff through
    the XLA composition for ALL parameters — variances, lengthscales, AND
    rhos (which even the analytic NLML path treats as fixed) — for both
    base kernels."""
    import jax
    import jax.numpy as jnp

    from mfgp_tpu.ops import covariance as cov
    from mfgp_tpu.ops import kernels as _k

    N, D, F = 23, 3, 3
    X = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    fid = jnp.asarray(rng.integers(0, F, N), jnp.int32)
    R = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)  # asymmetric Ct
    v = jnp.asarray([1.5, 0.9, 0.4], jnp.float32)
    ls = jnp.asarray(rng.uniform(0.8, 2.0, (F, D)), jnp.float32)
    rhos = jnp.asarray([0.9, 0.7], jnp.float32)

    def loss_fused(v, ls, rhos):
        return jnp.sum(R * cov._ar1_train_cov_fused(kernel, v, ls, rhos,
                                                    X, fid))

    def loss_xla(v, ls, rhos):
        return jnp.sum(R * _k.ar1_cov(X, fid, X, fid, v, ls, rhos, kernel))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(v, ls, rhos)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(v, ls, rhos)
    for a, b, name in zip(g1, g2, ("variances", "lengthscales", "rhos")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    # values agree too
    np.testing.assert_allclose(
        np.asarray(cov._ar1_train_cov_fused(kernel, v, ls, rhos, X, fid)),
        np.asarray(_k.ar1_cov(X, fid, X, fid, v, ls, rhos, kernel)),
        rtol=1e-5, atol=1e-5)


def test_sf_cov_diff_gradients(rng, monkeypatch):
    """Single-fidelity custom-VJP path (F=1 reuse) matches autodiff."""
    import jax
    import jax.numpy as jnp

    from mfgp_tpu.ops import covariance as cov
    from mfgp_tpu.ops import kernels as _k

    X = jnp.asarray(rng.normal(size=(19, 3)), jnp.float32)
    R = jnp.asarray(rng.normal(size=(19, 19)), jnp.float32)
    ls = jnp.asarray([1.1, 0.9, 1.4], jnp.float32)

    # force the fused branch off-TPU (interpret mode handles execution)
    monkeypatch.setattr(cov, "use_pallas", lambda *a: True)

    def loss_fused(v, ls):
        return jnp.sum(R * cov.sf_cov_diff(v, ls, X, "rbf"))

    def loss_xla(v, ls):
        return jnp.sum(R * _k.KERNELS["rbf"](X, X, v, ls))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(jnp.float32(1.7), ls)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(jnp.float32(1.7), ls)
    np.testing.assert_allclose(float(g1[0]), float(g2[0]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[1]).reshape(-1),
                               np.asarray(g2[1]), rtol=2e-4, atol=2e-4)


def test_ar1_fused_matern32_matches_xla(problem):
    """The fused kernel's matern32 base equals the XLA composition
    (kernels.matern32 semantics incl. the sqrt guard)."""
    X1, f1, X2, f2, var, ls, rho = problem
    K_ref = np.asarray(k.ar1_cov(
        jnp.asarray(X1), jnp.asarray(f1), jnp.asarray(X2), jnp.asarray(f2),
        var, ls, rho, "matern32"))
    K_pal = np.asarray(ar1_cov_fused(X1, f1, X2, f2, var, ls, rho,
                                     interpret=True, kern="matern32"))
    np.testing.assert_allclose(K_pal, K_ref, atol=1e-5)


@pytest.mark.parametrize("kernel", ["rbf", "matern32"])
def test_syrk_grad_fused_matches_xla_contractions(rng, kernel):
    """syrk_grad_fused (interpret mode) reproduces the XLA analytic
    contraction path's (g_logvar, g_logls, g_lognoise) — the fused
    kernel's first CPU-verifiable parity test, for BOTH base kernels
    (matern32 contracts a second per-fidelity matrix in-kernel since its
    lengthscale derivative is not proportional to the covariance)."""
    import jax.numpy as jnp

    from mfgp_tpu.models import mfgp as mm
    from mfgp_tpu.ops.pallas_kernels import syrk_grad_fused

    N, D, F = 180, 3, 2
    X = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    fid = jnp.asarray(rng.integers(0, F, N), jnp.int32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    params = mm.MFGPParams(
        jnp.log(jnp.asarray([1.4, 0.8], jnp.float32)),
        jnp.log(jnp.asarray(rng.uniform(0.7, 1.8, (F, D)), jnp.float32)),
        jnp.asarray([0.9], jnp.float32),
        jnp.log(jnp.asarray([0.05, 0.02], jnp.float32)))
    # CPU backend -> use_pallas False -> the XLA contraction branch runs
    val, grad, L, alpha, Linv = mm._nlml_vg_core(
        params, X, fid, y, kernel, 1e-6, inv_mode="highest")
    assert Linv is not None
    g_v, g_l, g_n = syrk_grad_fused(
        Linv, alpha, X, fid, params.variances, params.lengthscales,
        params.rhos, params.noises, interpret=True, tile=128, kern=kernel)
    np.testing.assert_allclose(np.asarray(g_v),
                               np.asarray(grad.log_variances),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_l),
                               np.asarray(grad.log_lengthscales),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_n),
                               np.asarray(grad.log_noises),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kernel", ["rbf", "matern32"])
def test_model_fused_grad_branch_matches_solve_path(rng, kernel,
                                                    monkeypatch):
    """The models' fused-gradient branches (GP F=1 and MFGP), forced on
    off-TPU via use_pallas + interpret mode, match the triangular-solve
    analytic gradient for both base kernels."""
    import jax
    import jax.numpy as jnp

    from mfgp_tpu.models import gp as gm
    from mfgp_tpu.models import mfgp as mm
    from mfgp_tpu.ops import covariance as cov

    monkeypatch.setattr(cov, "use_pallas", lambda *a: True)

    N, D, F = 150, 3, 2
    X = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)

    gp_params = gm.GPParams(jnp.log(jnp.float32(1.3)),
                            jnp.log(jnp.asarray(
                                rng.uniform(0.7, 1.5, D), jnp.float32)),
                            jnp.log(jnp.float32(0.05)))
    v0, g0, *_ = gm._gp_vg_core(gp_params, X, y, 0.0, kernel, 1e-6,
                                inv_mode=None)
    v1, g1, *_ = gm._gp_vg_core(gp_params, X, y, 0.0, kernel, 1e-6,
                                inv_mode="highest")
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)

    fid = jnp.asarray(rng.integers(0, F, N), jnp.int32)
    mf_params = mm.MFGPParams(
        jnp.log(jnp.asarray([1.4, 0.8], jnp.float32)),
        jnp.log(jnp.asarray(rng.uniform(0.7, 1.8, (F, D)), jnp.float32)),
        jnp.asarray([0.9], jnp.float32),
        jnp.log(jnp.asarray([0.05, 0.02], jnp.float32)))
    v0, g0, *_ = mm._nlml_vg_core(mf_params, X, fid, y, kernel, 1e-6,
                                  inv_mode=None)
    v1, g1, *_ = mm._nlml_vg_core(mf_params, X, fid, y, kernel, 1e-6,
                                  inv_mode="highest")
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kernel", ["rbf", "matern32"])
@pytest.mark.parametrize("shape", [(96, 48), (70, 33)])
def test_posterior_fused_matches_composition(rng, kernel, shape):
    """posterior_fused (interpret mode) reproduces mu = K*^T alpha and
    quad = colsum((Linv K*)^2) from the XLA cross-covariance, including
    tile-padded shapes (padded train lanes carry zero folded weight so
    their K* rows vanish exactly)."""
    from mfgp_tpu.ops.covariance import mf_cross_cov
    from mfgp_tpu.ops.pallas_kernels import posterior_fused

    N, M = shape
    D, F = 3, 3
    X = rng.random((N, D)).astype(np.float32) * 5
    fid = rng.integers(0, F, N).astype(np.int32)
    Xs = rng.random((M, D)).astype(np.float32) * 5
    fid_s = np.full(M, F - 1, np.int32)
    var = jnp.asarray([1.5, 1.0, 0.5], jnp.float32)
    ls = jnp.asarray(rng.uniform(0.5, 2, (F, D)), jnp.float32)
    rho = jnp.asarray([0.9, 0.8], jnp.float32)
    Linv = np.tril(rng.random((N, N)).astype(np.float32))
    alpha = rng.random(N).astype(np.float32)

    mu, quad = posterior_fused(
        jnp.asarray(Linv), jnp.asarray(alpha), jnp.asarray(X),
        jnp.asarray(fid), jnp.asarray(Xs), jnp.asarray(fid_s),
        var, ls, rho, interpret=True, kern=kernel, tile_n=32, tile_g=16)

    Kxs = np.asarray(mf_cross_cov(var, ls, rho, jnp.asarray(X),
                                  jnp.asarray(fid), jnp.asarray(Xs),
                                  jnp.asarray(fid_s), kernel=kernel))
    V = Linv @ Kxs
    mu_ref = Kxs.T @ np.asarray(alpha, np.float64)
    quad_ref = np.sum(V.astype(np.float64) ** 2, axis=0)
    np.testing.assert_allclose(np.asarray(mu), mu_ref,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(quad), quad_ref,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kernel", ["rbf", "matern32"])
def test_predict_fused_matches_predict_blocked_inv(rng, kernel):
    """models.mfgp.predict_fused == predict_blocked_inv on a real
    conditioned state (same MFGPStateInv, noise included)."""
    import scipy.linalg as sla

    from mfgp_tpu.models import mfgp as mm

    N, M, D, F = 90, 40, 3, 3
    X = rng.random((N, D)).astype(np.float32) * 4
    fid = rng.integers(0, F, N).astype(np.int32)
    y = rng.normal(size=N).astype(np.float32)
    Xs = rng.random((M, D)).astype(np.float32) * 4
    fid_s = np.full(M, F - 1, np.int32)
    params = mm.MFGPParams(
        jnp.log(jnp.asarray([1.4, 0.9, 0.6], jnp.float32)),
        jnp.log(jnp.asarray(rng.uniform(0.8, 1.8, (F, D)), jnp.float32)),
        jnp.asarray([0.9, 0.8], jnp.float32),
        jnp.log(jnp.asarray([0.05, 0.03, 0.02], jnp.float32)))
    Kn = np.asarray(mm._assemble_noisy_cov(params, jnp.asarray(X),
                                           jnp.asarray(fid), 1e-6, kernel),
                    np.float64)
    L = np.linalg.cholesky(Kn)
    Linv = sla.solve_triangular(L, np.eye(N), lower=True)
    alpha = sla.cho_solve((L, True), np.asarray(y, np.float64))
    state = mm.MFGPStateInv(jnp.asarray(X), jnp.asarray(fid),
                            jnp.asarray(y),
                            jnp.asarray(Linv, jnp.float32),
                            jnp.asarray(alpha, jnp.float32))

    mu_f, var_f = mm.predict_fused(params, state, jnp.asarray(Xs),
                                   jnp.asarray(fid_s), kernel=kernel,
                                   interpret=True)
    mu_b, var_b = mm.predict_blocked_inv(params, state, jnp.asarray(Xs),
                                         jnp.asarray(fid_s), kernel=kernel,
                                         block_size=16)
    # both paths are f32 end-to-end: tolerance covers summation-order noise
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_b),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_b),
                               rtol=5e-4, atol=5e-5)
