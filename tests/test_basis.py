"""Unit tests for spectral basis primitives against analytic truths."""

import numpy as np
import pytest

from anap3_tpu.ops import basis as B


@pytest.mark.parametrize("n_points", [5, 9, 17, 33])
def test_cgl_nodes_endpoints_and_order(n_points):
    x = B.cgl_nodes(n_points)
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    # x_j = -cos(pi j / N)
    j = np.arange(n_points)
    np.testing.assert_allclose(x, -np.cos(np.pi * j / (n_points - 1)), atol=1e-15)


@pytest.mark.parametrize("basis_cls", [B.ChebyshevLobatto, B.LegendreLobatto])
@pytest.mark.parametrize("n_points", [8, 16, 24])
def test_diff_matrix_exact_on_polynomials(basis_cls, n_points):
    basis = basis_cls(domain=(0.0, 1.0))
    x = basis.nodes(n_points)
    D = basis.diff_matrix(n_points)
    # exact for every monomial of degree <= N
    for deg in range(n_points):
        f = x**deg
        df = deg * x ** max(deg - 1, 0) if deg > 0 else np.zeros_like(x)
        np.testing.assert_allclose(D @ f, df, atol=1e-7 * max(1.0, n_points**2))


def test_diff_matrix_constant_row_sum_zero():
    D = B.chebyshev_diff_matrix(17)
    np.testing.assert_allclose(D @ np.ones(17), 0.0, atol=1e-13)


@pytest.mark.parametrize("n_points", [4, 9, 16, 25])
def test_clenshaw_curtis_weights(n_points):
    w = B.clenshaw_curtis_weights(n_points)
    assert np.isclose(w.sum(), 2.0)
    x = B.cgl_nodes(n_points)
    # exact for polynomials of degree <= N
    for deg in range(n_points):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)  # int_{-1}^{1} x^deg dx
        np.testing.assert_allclose(w @ x**deg, exact, atol=1e-12)


@pytest.mark.parametrize("n_points", [4, 9, 16])
def test_lgl_weights(n_points):
    w = B.lgl_weights(n_points)
    x = B.lgl_nodes(n_points)
    assert np.isclose(w.sum(), 2.0)
    # LGL exact up to degree 2N-1
    for deg in range(2 * (n_points - 1) - 1):
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(w @ x**deg, exact, atol=1e-12)


def test_spectral_diff_exponential_accuracy():
    basis = B.ChebyshevLobatto(domain=(-1.0, 1.0))
    errs = []
    for n in (8, 16, 32):
        x = basis.nodes(n + 1)
        D = basis.diff_matrix(n + 1)
        err = np.max(np.abs(D @ np.sin(np.pi * x) - np.pi * np.cos(np.pi * x)))
        errs.append(err)
    assert errs[1] < errs[0] * 1e-3
    assert errs[2] < 1e-10


def test_fourier_diff_matrix():
    n = 16
    D = B.fourier_diff_matrix(n, 0.0, 2 * np.pi)
    x = B.fourier_nodes(n)
    np.testing.assert_allclose(D @ np.sin(3 * x), 3 * np.cos(3 * x), atol=1e-10)
    Dc = B.fourier_diff_matrix(n, 0.0, 2 * np.pi, representation="complex")
    np.testing.assert_allclose(np.real(Dc @ np.sin(3 * x)), 3 * np.cos(3 * x),
                               atol=1e-10)


def test_spectral_interpolate_exactness():
    x = B.cgl_nodes(12)
    f = 3 * x**5 - 2 * x**2 + 1
    xe = np.linspace(-1, 1, 41)
    fe = B.spectral_interpolate(x, f, xe)
    np.testing.assert_allclose(fe, 3 * xe**5 - 2 * xe**2 + 1, atol=1e-11)
    # chebyshev basis variant
    fe_c = B.spectral_interpolate(x, f, xe, basis="chebyshev")
    np.testing.assert_allclose(fe_c, 3 * xe**5 - 2 * xe**2 + 1, atol=1e-11)


def test_inner_to_full_interp_matrix():
    nodes = B.cgl_nodes(13)
    M = B.inner_to_full_interp_matrix(nodes)
    inner = nodes[1:-1]
    f_inner = inner**7 - inner**3  # degree <= n_inner-1 = 10
    f_full = M @ f_inner
    np.testing.assert_allclose(f_full, nodes**7 - nodes**3, atol=1e-9)


def test_legendre_mass_matrix_integrates():
    basis = B.LegendreLobatto(domain=(-1.0, 1.0))
    n = 8
    M = basis.mass_matrix(n + 1)
    x = basis.nodes(n + 1)
    # ones^T M ones = length of interval
    np.testing.assert_allclose(np.ones(n + 1) @ M @ np.ones(n + 1), 2.0, atol=1e-10)
    # quadratic: int x^2 = 2/3
    np.testing.assert_allclose(np.ones(n + 1) @ M @ x**2, 2.0 / 3.0, atol=1e-10)


class TestQuadratureIntegrals:
    def test_spectral_energy_of_analytic_field(self):
        """Quadrature-weighted energy matches the closed-form integral."""
        import jax.numpy as jnp
        from anap3_tpu.models.params import SpectralParameters
        from anap3_tpu.models import spectral_sg as core

        p = SpectralParameters(nx=20, ny=20, basis_type="chebyshev",
                               corner_treatment="smoothing", dtype="float64")
        ops, grid = core.build_spectral_ops(p)
        X, Y = np.meshgrid(grid["x_nodes"], grid["y_nodes"], indexing="ij")
        u = np.sin(np.pi * X) * np.sin(np.pi * Y)
        # E = 0.5 * int u^2 dA = 0.5 * (1/2)(1/2) = 1/8
        E = 0.5 * float(np.sum(np.asarray(ops.W2d) * u * u))
        assert E == pytest.approx(1.0 / 8.0, rel=1e-10)

    def test_spectral_enstrophy_of_analytic_field(self):
        import jax.numpy as jnp
        from anap3_tpu.models.params import SpectralParameters
        from anap3_tpu.models import spectral_sg as core

        p = SpectralParameters(nx=24, ny=24, basis_type="chebyshev",
                               corner_treatment="smoothing", dtype="float64")
        ops, grid = core.build_spectral_ops(p)
        X, Y = np.meshgrid(grid["x_nodes"], grid["y_nodes"], indexing="ij")
        # u = sin(pi x) sin(pi y), v = 0 -> omega = -du/dy = -pi sin(pi x) cos(pi y)
        u = jnp.asarray(np.sin(np.pi * X) * np.sin(np.pi * Y))
        v = jnp.zeros_like(u)
        omega = np.asarray(core.vorticity(ops, u, v))
        Z = 0.5 * float(np.sum(np.asarray(ops.W2d) * omega * omega))
        assert Z == pytest.approx(0.5 * np.pi**2 * 0.25, rel=1e-8)
