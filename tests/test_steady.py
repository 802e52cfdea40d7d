"""Steady Newton-Krylov (PTC) solver tests — models/steady.py.

The reference has no steady solver (its only route is the RK4/AC march,
src/solvers/spectral/sg.py:410-449); these tests pin the new capability:
exact linearization (jvp == finite differences), convergence of the PTC
loop to the discrete steady state in tens of steps, agreement with the
Botella & Peyret benchmark at tiny N, and the warm-start plumbing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from anap3_tpu.models import spectral_sg as core
from anap3_tpu.models.steady import (NewtonSolver, _SteadyProblem,
                                     _StokesPreconditioner, ptc_solve)


def _build(Re=100.0, n=16, **kw):
    from anap3_tpu.models.params import SpectralParameters

    p = SpectralParameters(Re=Re, nx=n, ny=n, dtype="float64", **kw)
    ops, grid = core.build_spectral_ops(p, dtype=jnp.float64)
    return p, ops, grid


class TestLinearization:
    def test_jvp_matches_finite_differences(self):
        _, ops, _ = _build(Re=250.0, n=12, corner_treatment="smoothing")
        prob = _SteadyProblem(ops)
        rng = np.random.default_rng(7)
        x = rng.standard_normal(prob.n_tot) * 0.1
        t = rng.standard_normal(prob.n_tot) * 1e-7
        fd = (np.asarray(prob.F(jnp.asarray(x + t))) -
              np.asarray(prob.F(jnp.asarray(x - t)))) / 2.0
        an = np.asarray(prob.jvp(jnp.asarray(x), jnp.asarray(t)))
        assert np.linalg.norm(fd - an) / np.linalg.norm(an) < 1e-6

    def test_jvp_matches_fd_singular_mode(self):
        # the singular subtraction adds constant-field convection terms;
        # the jvp must linearize the TOTAL-velocity convection correctly
        _, ops, _ = _build(Re=100.0, n=12, corner_treatment="singular")
        prob = _SteadyProblem(ops)
        rng = np.random.default_rng(3)
        x = np.asarray(prob.state_to_x(core.initial_state(ops)))
        x = x + rng.standard_normal(prob.n_tot) * 0.01
        t = rng.standard_normal(prob.n_tot) * 1e-7
        fd = (np.asarray(prob.F(jnp.asarray(x + t))) -
              np.asarray(prob.F(jnp.asarray(x - t)))) / 2.0
        an = np.asarray(prob.jvp(jnp.asarray(x), jnp.asarray(t)))
        assert np.linalg.norm(fd - an) / np.linalg.norm(an) < 1e-6

    def test_residual_flat_matches_core(self):
        _, ops, _ = _build(Re=100.0, n=12)
        prob = _SteadyProblem(ops)
        st = core.initial_state(ops)
        x = prob.state_to_x(st)
        Fu, Fv, Fp = prob.unflatten(prob.F(x))
        R_u, R_v, R_p = core.residuals(ops, st.u, st.v, st.p)
        np.testing.assert_allclose(np.asarray(Fu), np.asarray(R_u)[1:-1, 1:-1])
        np.testing.assert_allclose(np.asarray(Fv), np.asarray(R_v)[1:-1, 1:-1])
        np.testing.assert_allclose(np.asarray(Fp), np.asarray(R_p))


class TestPTCSolve:
    def test_converges_and_state_is_steady(self):
        _, ops, grid = _build(Re=100.0, n=16, corner_treatment="smoothing")
        prob = _SteadyProblem(ops)
        pre = _StokesPreconditioner(prob, grid)
        x0 = np.asarray(prob.state_to_x(core.initial_state(ops)))
        x, converged, diverged, steps = ptc_solve(
            prob, pre, x0, tol_rms=1e-9, max_steps=30, gmres_vectors=40,
            dt0=0.05, dt_max=3e3)
        assert converged and not diverged
        assert steps < 20
        st = prob.x_to_state(x)
        R_u, R_v, R_p = core.residuals(ops, st.u, st.v, st.p)
        assert float(jnp.max(jnp.abs(R_u[1:-1, 1:-1]))) < 1e-7
        assert float(jnp.max(jnp.abs(R_p))) < 1e-7

    def test_history_contract(self):
        _, ops, grid = _build(Re=100.0, n=12)
        prob = _SteadyProblem(ops)
        pre = _StokesPreconditioner(prob, grid)
        x0 = np.asarray(prob.state_to_x(core.initial_state(ops)))
        hist = {k: [] for k in ("rel_iter", "u_eq", "v_eq", "continuity",
                                "energy", "enstrophy", "palinstrophy")}
        x, converged, _, steps = ptc_solve(
            prob, pre, x0, tol_rms=1e-8, max_steps=30, gmres_vectors=40,
            dt0=0.05, dt_max=3e3, history=hist,
            conserved=lambda x_: tuple(map(float, core.conserved_quantities(
                ops, *prob.x_to_state(x_)[:2]))))
        assert converged
        assert len(hist["rel_iter"]) == steps
        assert len(hist["energy"]) == steps
        # residual norms must collapse monotonically-ish to ~0
        assert hist["u_eq"][-1] < 1e-5 * max(hist["u_eq"][0], 1e-30) + 1e-6
        # final energy physically sensible for Re=100
        assert 0.01 < hist["energy"][-1] < 0.06


class TestNewtonSolver:
    def test_sharp_lid_matches_botella_re100(self):
        # Botella & Peyret Re=100 (data/validation/botella/
        # botella_Re100_vortex.csv): psi_min = -0.1034339. The exact N=20
        # sharp-lid steady state lands within 1e-3 of it — below the
        # smoothed-lid floor (~0.01) by an order of magnitude.
        s = NewtonSolver(Re=100.0, nx=20, ny=20,
                         corner_treatment="singular", tolerance=1e-8,
                         basis_type="chebyshev")
        s.solve()
        assert s.metrics.converged
        assert s.metrics.iterations < 15
        assert abs(s.metrics.psi_min + 0.1034339) < 1.5e-3
        assert abs(s.metrics.final_energy - 0.0344) < 2e-3

    def test_forces_float64(self):
        s = NewtonSolver(Re=100.0, nx=12, ny=12, dtype="float32")
        assert s.params.dtype == "float64"
        assert s.ops.Dx.dtype == jnp.float64

    def test_warm_start_roundtrip(self, tmp_path):
        s = NewtonSolver(Re=100.0, nx=14, ny=14, tolerance=1e-8)
        s.solve()
        assert s.metrics.converged
        path = tmp_path / "state.npz"
        np.savez(path, u=np.asarray(s.state.u), v=np.asarray(s.state.v),
                 p=np.asarray(s.state.p))
        s2 = NewtonSolver(Re=100.0, nx=14, ny=14, tolerance=1e-8,
                          initial_state_path=str(path))
        s2.solve()
        # warm from the converged state: zero PTC steps needed
        assert s2.metrics.converged
        assert s2.metrics.iterations == 0
        np.testing.assert_allclose(np.asarray(s2.state.u),
                                   np.asarray(s.state.u), atol=1e-12)

    def test_warm_start_shape_mismatch_raises(self, tmp_path):
        path = tmp_path / "bad.npz"
        np.savez(path, u=np.zeros((9, 9)), v=np.zeros((9, 9)),
                 p=np.zeros((7, 7)))
        s = NewtonSolver(Re=100.0, nx=14, ny=14,
                         initial_state_path=str(path))
        with pytest.raises(ValueError, match="does not match"):
            s.solve()

    def test_prelude_marching(self):
        s = NewtonSolver(Re=100.0, nx=14, ny=14, tolerance=1e-8,
                         newton_prelude=25)
        s.solve()
        assert s.metrics.converged


class TestSteadyFixtures:
    """data/steady/*.npz are EXACT discrete steady states (RMS <= 1e-9)."""

    def test_re1000_fixture_residual(self, repo_root):
        d = np.load(repo_root / "data/steady/sharp_Re1000_N128.npz")
        from anap3_tpu.models.params import SpectralParameters

        p = SpectralParameters(Re=1000.0, nx=128, ny=128, dtype="float64",
                               corner_treatment="singular")
        ops, _ = core.build_spectral_ops(p, dtype=jnp.float64)
        u, v = core.enforce_bc(ops, jnp.asarray(d["u"]), jnp.asarray(d["v"]))
        R_u, R_v, R_p = core.residuals(ops, u, v, jnp.asarray(d["p"]))
        n2 = float(jnp.sum(R_u[1:-1, 1:-1] ** 2) +
                   jnp.sum(R_v[1:-1, 1:-1] ** 2) + jnp.sum(R_p ** 2))
        assert np.sqrt(n2 / (3 * 127 * 127)) < 1e-8

    @pytest.mark.slow
    def test_re1000_fixture_matches_botella(self, repo_root):
        s = NewtonSolver(
            Re=1000.0, nx=128, ny=128, corner_treatment="singular",
            tolerance=1e-8,
            initial_state_path=str(repo_root /
                                   "data/steady/sharp_Re1000_N128.npz"))
        s.solve()
        assert s.metrics.converged
        assert s.metrics.iterations <= 1  # already steady
        # Botella & Peyret N=160: psi_min = -0.1189366, omega = 2.067753
        assert abs(s.metrics.psi_min + 0.1189366) < 2e-4
        assert abs(abs(s.metrics.omega_center) - 2.067753) < 2e-3


class TestNewtonPolish:
    def test_sg_polish_reaches_exact_steady_state(self):
        from anap3_tpu.models.spectral import SGSolver

        s = SGSolver(Re=100.0, nx=16, ny=16, dtype="float64",
                     tolerance=1e-3, newton_polish=True, chunk_size=200)
        s.solve()
        assert s.metrics.converged
        assert s.metrics.polish_steps > 0
        assert s.metrics.steady_residual_rms < 1e-9
        # the polished state really is steady
        R_u, R_v, R_p = core.residuals(s.ops, s.state.u, s.state.v, s.state.p)
        assert float(jnp.max(jnp.abs(R_u[1:-1, 1:-1]))) < 1e-7
        # polish rows extend the recorded history (visible in plots)
        assert s.time_series.rel_iter_residual[-1] < 1e-6

    def test_fsg_polish(self):
        from anap3_tpu.models.spectral import FSGSolver

        s = FSGSolver(Re=100.0, nx=16, ny=16, n_levels=2, dtype="float64",
                      tolerance=1e-3, newton_polish=True, chunk_size=200)
        s.solve()
        assert s.metrics.polish_steps > 0
        assert s.metrics.steady_residual_rms < 1e-9

    def test_polish_off_by_default(self):
        from anap3_tpu.models.spectral import SGSolver

        s = SGSolver(Re=100.0, nx=12, ny=12, dtype="float64",
                     tolerance=1e-3, chunk_size=200)
        s.solve()
        assert s.metrics.polish_steps == 0
        assert s.metrics.steady_residual_rms == 0.0
