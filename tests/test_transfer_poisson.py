"""Tests for transfer operators and tensor-product Poisson solvers."""

import numpy as np
import pytest
import jax.numpy as jnp

from anap3_tpu.ops import basis as B
from anap3_tpu.ops import transfer as T
from anap3_tpu.ops.poisson import (
    SeparablePoisson,
    fd_dirichlet_poisson,
    fv_neumann_pressure_poisson,
    spectral_dirichlet_poisson,
)


class TestTransfer:
    def test_prolongation_exact_for_coarse_polynomials(self):
        n_c, n_f = 9, 17
        P = T.fft_prolongation_matrix(n_c, n_f)
        x_c = np.cos(np.pi * np.arange(n_c) / (n_c - 1))
        x_f = np.cos(np.pi * np.arange(n_f) / (n_f - 1))
        f_c = 2 * x_c**6 - x_c**3 + 0.5
        np.testing.assert_allclose(P @ f_c, 2 * x_f**6 - x_f**3 + 0.5, atol=1e-12)

    def test_polynomial_equals_fft_prolongation(self):
        P_fft = T.fft_prolongation_matrix(9, 17)
        P_poly = T.polynomial_prolongation_matrix(9, 17)
        np.testing.assert_allclose(P_fft, P_poly, atol=1e-10)

    def test_restriction_preserves_low_modes(self):
        n_f, n_c = 17, 9
        R = T.fft_restriction_matrix(n_f, n_c)
        x_f = np.cos(np.pi * np.arange(n_f) / (n_f - 1))
        x_c = np.cos(np.pi * np.arange(n_c) / (n_c - 1))
        f_f = x_f**5 - x_f  # degree < n_c, survives truncation exactly
        np.testing.assert_allclose(R @ f_f, x_c**5 - x_c, atol=1e-12)

    def test_prolong_restrict_roundtrip_identity(self):
        n_c, n_f = 9, 17
        P = T.fft_prolongation_matrix(n_c, n_f)
        R = T.fft_restriction_matrix(n_f, n_c)
        np.testing.assert_allclose(R @ P, np.eye(n_c), atol=1e-11)

    def test_injection_restriction_nested(self):
        n_f, n_c = 17, 9
        R = T.injection_restriction_matrix(n_f, n_c)
        u_f = np.arange(n_f, dtype=float)
        np.testing.assert_allclose(R @ u_f, u_f[::2])


class TestPoisson:
    def test_spectral_dirichlet_poisson_manufactured(self):
        n = 24
        basis = B.ChebyshevLobatto(domain=(0.0, 1.0))
        x = basis.nodes(n + 1)
        D = basis.diff_matrix(n + 1)
        Dxx = D @ D
        solver = spectral_dirichlet_poisson(Dxx, Dxx, dtype=jnp.float64)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u_exact = np.sin(np.pi * X) * np.sin(2 * np.pi * Y)
        f = -(np.pi**2 + 4 * np.pi**2) * u_exact
        u = np.asarray(solver.solve(jnp.asarray(f[1:-1, 1:-1])))
        np.testing.assert_allclose(u, u_exact[1:-1, 1:-1], atol=1e-9)

    def test_fd_dirichlet_poisson_manufactured(self):
        n = 64
        h = 1.0 / (n - 1)
        x = np.linspace(0, 1, n)
        solver = fd_dirichlet_poisson(n - 2, n - 2, h, h, dtype=jnp.float64)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
        f = -2 * np.pi**2 * u_exact
        u = np.asarray(solver.solve(jnp.asarray(f[1:-1, 1:-1])))
        # second-order accuracy
        assert np.max(np.abs(u - u_exact[1:-1, 1:-1])) < 5e-4

    def test_fv_neumann_pressure_poisson_matches_dense_pinned_solve(self):
        """The mean-free tensor solve must equal the reference's pinned sparse
        solve (row/col 0 zeroed, p0 = 0) for a consistent RHS."""
        nx = ny = 12
        dx, dy = 1.0 / nx, 1.0 / ny
        rho = 1.0
        solver = fv_neumann_pressure_poisson(nx, ny, dx, dy, rho, dtype=jnp.float64)

        # dense assembly, matching conductance form
        n = nx * ny
        A = np.zeros((n, n))
        Dfx, Dfy = rho * dy / dx, rho * dx / dy
        for j in range(ny):
            for i in range(nx):
                c = j * nx + i
                for (jn, inn, Df) in ((j, i + 1, Dfx), (j + 1, i, Dfy)):
                    if inn < nx and jn < ny:
                        nb = jn * nx + inn
                        A[c, c] += Df
                        A[nb, nb] += Df
                        A[c, nb] -= Df
                        A[nb, c] -= Df
        rng = np.random.default_rng(0)
        rhs = rng.normal(size=(ny, nx))
        rhs -= rhs.mean()  # consistent RHS
        rhs_flat = rhs.ravel().copy()
        # pinned reference solve
        A_p = A.copy()
        A_p[0, :] = 0.0
        A_p[:, 0] = 0.0
        A_p[0, 0] = 1.0
        rhs_pinned = rhs_flat.copy()
        rhs_pinned[0] = 0.0
        p_ref = np.linalg.solve(A_p, rhs_pinned).reshape(ny, nx)

        p = np.asarray(solver.solve(jnp.asarray(rhs)))
        p = p - p[0, 0]  # gauge
        np.testing.assert_allclose(p, p_ref, atol=1e-9)

    def test_separable_poisson_is_jittable_and_vmappable(self):
        import jax

        n = 10
        Ax = np.diag(-2.0 * np.ones(n)) + np.diag(np.ones(n - 1), 1) + np.diag(
            np.ones(n - 1), -1)
        solver = SeparablePoisson.build(Ax, Ax, dtype=jnp.float64)
        rng = np.random.default_rng(1)
        batch = jnp.asarray(rng.normal(size=(4, n, n)))
        sols = jax.vmap(solver.solve)(batch)
        L = np.kron(Ax, np.eye(n)) + np.kron(np.eye(n), Ax)
        for k in range(4):
            ref = np.linalg.solve(L, np.asarray(batch[k]).ravel()).reshape(n, n)
            np.testing.assert_allclose(np.asarray(sols[k]), ref, atol=1e-9)


class TestIterativeRefinement:
    def test_f32_refinement_reduces_residual(self):
        """One refinement step recovers most f32 transform roundoff."""
        rng = np.random.default_rng(3)
        nx = ny = 96
        P = fv_neumann_pressure_poisson(nx, ny, 1.0 / nx, 1.0 / ny,
                                        dtype=jnp.float32)
        f = rng.standard_normal((ny, nx)).astype(np.float32)
        f -= f.mean()
        f = jnp.asarray(f)

        def resid(u):
            r = f - P.apply(u)
            r = r - jnp.mean(r)
            return float(jnp.linalg.norm(r)) / float(jnp.linalg.norm(f))

        r0 = resid(P.solve(f))
        r1 = resid(P.solve_refined(f, 1))
        assert r1 < r0
        assert r1 < 5e-6

    def test_symmetric_build_uses_orthogonal_basis(self):
        P = fd_dirichlet_poisson(32, 32, 0.1, 0.1, dtype=jnp.float64)
        V = np.asarray(P.Vx)
        np.testing.assert_allclose(V.T @ V, np.eye(32), atol=1e-12)
        np.testing.assert_allclose(np.asarray(P.Vx_inv), V.T)

    def test_refine_noop_for_exact_f64(self):
        P = fd_dirichlet_poisson(16, 16, 0.1, 0.1, dtype=jnp.float64)
        f = jnp.asarray(np.random.default_rng(0).standard_normal((16, 16)))
        u0 = P.solve(f)
        u1 = P.solve_refined(f, 0)
        np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
