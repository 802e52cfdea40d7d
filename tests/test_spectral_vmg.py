"""Tests for the FAS V-cycle (VMG) and full-multigrid (FMG) solvers."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models.spectral import SGSolver
from anap3_tpu.models.spectral_vmg import (FMGSolver, VMGSolver,
                                           build_vmg_levels, make_v_cycle)
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.transfer import nodal_injection_matrix, nodal_interpolation_matrix


def make_params(**over):
    # Re=25 keeps the FAS resolution floor (~2.4*sqrt(Re) = 12) satisfied
    # by the [24, 12] hierarchy that is cheap enough for unit tests.
    base = dict(name="spectral_vmg", Re=25.0, nx=24, ny=24,
                basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
                corner_treatment="smoothing", corner_smoothing=0.15,
                tolerance=1e-8, max_iterations=40000, n_levels=2,
                coarse_tolerance_factor=1.0, dtype="float64", chunk_size=200)
    base.update(over)
    return SpectralParameters(**base)


class TestInnerGridTransfers:
    def test_nodal_injection_picks_nested_nodes(self):
        """Coarse INNER nodes are the odd fine inner indices (not even) —
        the regression that made the naive CGL-count injection diverge."""
        from anap3_tpu.ops.basis import make_basis

        bx = make_basis("chebyshev", (0.0, 1.0))
        x_f = bx.nodes(25)[1:-1]   # 23 inner nodes
        x_c = bx.nodes(13)[1:-1]   # 11 inner nodes
        R = nodal_injection_matrix(x_f, x_c)
        picked = np.argmax(R, axis=1)
        np.testing.assert_array_equal(picked, np.arange(1, 23, 2))
        np.testing.assert_allclose(R @ x_f, x_c, atol=1e-14)

    def test_nodal_interpolation_exact_on_polynomials(self):
        from anap3_tpu.ops.basis import make_basis

        bx = make_basis("chebyshev", (0.0, 1.0))
        x_f = bx.nodes(25)[1:-1]
        x_c = bx.nodes(13)[1:-1]
        P = nodal_interpolation_matrix(x_c, x_f)
        f_c = 4 * x_c**5 - x_c**2
        np.testing.assert_allclose(P @ f_c, 4 * x_f**5 - x_f**2, atol=1e-9)


class TestLegendreTransfers:
    """Non-Chebyshev grids get basis-aware transfers (the DCT path is only
    valid on CGL nodes, and LGL grids do not nest)."""

    def test_modal_restriction_exact_and_truncating(self):
        from anap3_tpu.ops.basis import jacobi_poly, make_basis
        from anap3_tpu.ops.transfer import modal_restriction_matrix

        bx = make_basis("legendre", (0.0, 1.0))
        xf, xc = bx.nodes(25), bx.nodes(13)
        R = modal_restriction_matrix(xf, xc)
        rng = np.random.RandomState(7)
        coeffs = rng.randn(13)  # degree 12 polynomial
        np.testing.assert_allclose(R @ np.polyval(coeffs, xf),
                                   np.polyval(coeffs, xc), atol=1e-12)
        # a pure Legendre mode above the coarse order is DROPPED, not aliased
        mode15 = jacobi_poly(2 * xf - 1, 0.0, 0.0, 15)
        assert np.abs(R @ mode15).max() < 1e-12

    def test_legendre_levels_use_nodal_operators(self):
        from anap3_tpu.ops.basis import make_basis

        params = make_params(basis_type="legendre")
        levels = build_vmg_levels(params)
        assert len(levels) == 2
        bx = make_basis("legendre", (0.0, 1.0))
        x_f, x_c = bx.nodes(25), bx.nodes(13)
        # prolongation must reproduce a degree-12 polynomial exactly on the
        # LGL fine grid (the DCT matrix would not — wrong nodes)
        f_c = np.polyval(np.arange(5.0), x_c)
        f_f = np.polyval(np.arange(5.0), x_f)
        P = np.asarray(levels[0].pro_full)
        np.testing.assert_allclose(P @ f_c, f_f, atol=1e-10)
        # solution restriction = exact resample on polynomial data
        Inj = np.asarray(levels[0].inj_full)
        np.testing.assert_allclose(Inj @ f_f, f_c, atol=1e-10)

    def test_legendre_vmg_matches_legendre_sg(self):
        vmg = VMGSolver(params=make_params(basis_type="legendre"))
        vmg.solve()
        assert vmg.metrics.converged
        sg = SGSolver(params=make_params(
            name="spectral", basis_type="legendre", tolerance=1e-6,
            max_iterations=60000, chunk_size=500))
        sg.solve()
        np.testing.assert_allclose(np.asarray(vmg.state.u),
                                   np.asarray(sg.state.u), atol=2e-3)
        assert vmg.metrics.psi_min == pytest.approx(sg.metrics.psi_min,
                                                    abs=5e-4)


class TestVCycle:
    def test_levels_build(self):
        levels = build_vmg_levels(make_params(nx=48, ny=48, n_levels=3))
        assert [lv.n for lv in levels] == [48, 24, 12]
        assert levels[-1].inj_full is None  # coarsest has no further transfer

    def test_levels_respect_fas_floor(self):
        # Re=100 -> floor 24: a 48-fine hierarchy stops at 24, never 12
        levels = build_vmg_levels(make_params(Re=100.0, nx=48, ny=48,
                                              n_levels=5))
        assert [lv.n for lv in levels] == [48, 24]
        # Re=1000 -> floor 76: nothing below 96 qualifies
        levels = build_vmg_levels(make_params(Re=1000.0, nx=96, ny=96,
                                              n_levels=5))
        assert [lv.n for lv in levels] == [96]

    def test_single_cycle_reduces_residual(self):
        params = make_params()
        levels = build_vmg_levels(params)
        v_cycle = make_v_cycle(levels)
        state = core.initial_state(levels[0].ops)
        # burn in a few plain steps so the field is nontrivial
        for _ in range(20):
            state, _ = core.sg_step(levels[0].ops, state)

        def resid_norm(s):
            R_u, R_v, _ = core.residuals(levels[0].ops, s.u, s.v, s.p)
            Ru = np.asarray(R_u)[1:-1, 1:-1]
            Rv = np.asarray(R_v)[1:-1, 1:-1]
            return float(np.linalg.norm(Ru) + np.linalg.norm(Rv))

        r0 = resid_norm(state)
        state, m = v_cycle(state)
        state, m = v_cycle(state)
        assert np.isfinite(np.asarray(state.u)).all()
        assert resid_norm(state) < r0

    def test_nonfinite_coarse_correction_rejected(self):
        """A NaN coarse correction must be dropped, leaving the cycle equal
        to plain nu1+nu2 fine smoothing (divergence-tolerant cycles; the
        [160,80] Re=1000 f32 coarse-transient blowup motivated this)."""
        import dataclasses

        params = make_params()
        levels = build_vmg_levels(params)
        assert len(levels) == 2
        # poison the COARSE level: nu=NaN makes every coarse smoothing step
        # (and hence the prolongated correction) non-finite
        levels[1].ops = dataclasses.replace(
            levels[1].ops, nu=jnp.asarray(float("nan"), levels[1].ops.nu.dtype))
        v_cycle = make_v_cycle(levels)
        state = core.initial_state(levels[0].ops)
        for _ in range(20):
            state, _ = core.sg_step(levels[0].ops, state)

        cycled, _ = v_cycle(state)
        assert np.isfinite(np.asarray(cycled.u)).all()
        assert np.isfinite(np.asarray(cycled.p)).all()

        ref = state
        from anap3_tpu.models.spectral_vmg import VMGSolver as _V
        for _ in range(_V.NU1 + _V.NU2):
            ref, _ = core.sg_step(levels[0].ops, ref)
        # atol: lax.scan inside the cycle fuses differently from the eager
        # reference loop — identical math, last-ulp differences only
        np.testing.assert_allclose(np.asarray(cycled.u), np.asarray(ref.u),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(cycled.v), np.asarray(ref.v),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(cycled.p), np.asarray(ref.p),
                                   atol=1e-13)

    def test_vmg_matches_sg_steady_state(self):
        vmg = VMGSolver(params=make_params())
        vmg.solve()
        assert vmg.metrics.converged
        sg = SGSolver(params=make_params(name="spectral", tolerance=1e-6,
                                         max_iterations=60000, chunk_size=500))
        sg.solve()
        np.testing.assert_allclose(np.asarray(vmg.state.u),
                                   np.asarray(sg.state.u), atol=2e-3)
        assert vmg.metrics.psi_min == pytest.approx(sg.metrics.psi_min,
                                                    abs=5e-4)

    def test_cold_start_prelude_above_ceiling(self, monkeypatch, caplog):
        """Above VMG_COLD_START_MAX_N a rest-started solve warm-starts
        itself with the nested-iteration cascade (round 4; previously it
        only warned) and still converges to the SG steady state."""
        import logging

        from anap3_tpu.models import spectral_vmg as vmgmod

        monkeypatch.setattr(vmgmod, "VMG_COLD_START_MAX_N", 12)
        vmg = VMGSolver(params=make_params())
        with caplog.at_level(logging.INFO, logger=vmgmod.__name__):
            vmg.solve()
        assert any("warm-starting from the nested-iteration cascade"
                   in r.message for r in caplog.records)
        assert any("warm-start prelude done" in r.message
                   for r in caplog.records)
        assert vmg.metrics.converged
        sg = SGSolver(params=make_params(name="spectral", tolerance=1e-6,
                                         max_iterations=60000,
                                         chunk_size=500))
        sg.solve()
        np.testing.assert_allclose(np.asarray(vmg.state.u),
                                   np.asarray(sg.state.u), atol=2e-3)

    def test_cold_start_prelude_divergence_fallback(self, monkeypatch):
        """A diverged prelude level must not crash the final prolongation
        (round-4 review: an early break left the state several levels
        below the finest and NaN-contaminated): the cascade falls back to
        the level's finite warm start and prolongates through every
        remaining transfer pair."""
        from anap3_tpu.models import spectral_vmg as vmgmod
        from anap3_tpu.models.runner import IterationResult

        p = make_params(nx=48, ny=48, n_levels=3)  # [48, 24, 12] at Re=25
        vmg = VMGSolver(params=p)
        levels = vmgmod.build_vmg_levels(p)
        assert len(levels) == 3

        def fake_rfp(step, get_uv, state, **kw):
            bad = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), state)
            return IterationResult(state=bad, iterations=5, converged=False,
                                   diverged=True, wall_time=0.0, history={})

        monkeypatch.setattr(vmgmod, "run_fixed_point", fake_rfp)
        st, total = vmg._cold_start_warm_state(levels, 1e-6, 100)
        assert st.u.shape == levels[0].ops.bc_u.shape  # finest level
        assert bool(jnp.all(jnp.isfinite(st.u)))
        assert total == 5  # broke after the first (coarsest) level

    def test_warm_started_state_skips_prelude(self, monkeypatch, caplog):
        """A non-rest initial state must go straight to V-cycles."""
        import logging

        from anap3_tpu.models import spectral_vmg as vmgmod

        monkeypatch.setattr(vmgmod, "VMG_COLD_START_MAX_N", 12)
        vmg = VMGSolver(params=make_params(max_iterations=40))
        vmg.state = vmg.state._replace(
            v=vmg.state.v.at[5, 5].set(1e-3))
        with caplog.at_level(logging.INFO, logger=vmgmod.__name__):
            vmg.solve()
        assert not any("nested-iteration cascade" in r.message
                       for r in caplog.records)

    def test_vmg_cheaper_than_sg(self):
        """Fine-grid-equivalent work must be far below single-grid."""
        vmg = VMGSolver(params=make_params())
        vmg.solve()
        sg = SGSolver(params=make_params(name="spectral", tolerance=1e-6,
                                         max_iterations=60000, chunk_size=500))
        sg.solve()
        fine_steps_vmg = vmg.metrics.iterations * (VMGSolver.NU1 + VMGSolver.NU2)
        assert fine_steps_vmg < 0.5 * sg.metrics.iterations


class TestFMG:
    def test_fmg_converges_and_matches(self):
        fmg = FMGSolver(params=make_params(name="spectral_fmg",
                                           coarse_tolerance_factor=10.0))
        fmg.solve()
        assert fmg.metrics.converged
        sg = SGSolver(params=make_params(name="spectral", tolerance=1e-6,
                                         max_iterations=60000, chunk_size=500))
        sg.solve()
        assert fmg.metrics.psi_min == pytest.approx(sg.metrics.psi_min,
                                                    abs=5e-4)


class TestFMGDivergenceReporting:
    def test_diverged_level_reported_and_fine_shaped(self, monkeypatch):
        """A diverged FMG run must report diverged=True with a fine-shaped
        NaN state and REAL quadrature history (round-2 fix: previously
        hardcoded diverged=False with zero-energy placeholders)."""
        import anap3_tpu.models.spectral_vmg as vmg_mod
        from anap3_tpu.models.runner import IterationResult

        def fake_run(step, get_uv, state, **kwargs):
            bad = jax.tree.map(lambda a: jnp.full_like(a, jnp.nan), state)
            return IterationResult(state=bad, iterations=7, converged=False,
                                   diverged=True, wall_time=0.0,
                                   history={})

        monkeypatch.setattr(vmg_mod, "run_fixed_point", fake_run)
        solver = FMGSolver(params=make_params(nx=24, ny=24, n_levels=2))
        solver.solve()
        assert solver.metrics.converged is False
        u = np.asarray(solver.state.u)
        assert u.shape == (25, 25)  # fine-shaped despite coarse-level abort
        assert np.isnan(u).all()
        # history carries the real (NaN) quadrature values, not 0.0 fillers
        assert not np.isfinite(solver.time_series.energy[-1])

    def test_vmg_passes_convergence_metric(self, monkeypatch):
        import anap3_tpu.models.spectral_vmg as vmg_mod

        seen = []
        real = vmg_mod.run_fixed_point

        def spy(*args, **kwargs):
            seen.append(kwargs.get("convergence_metric", "rel_iter"))
            return real(*args, **kwargs)

        monkeypatch.setattr(vmg_mod, "run_fixed_point", spy)
        solver = VMGSolver(params=make_params(
            nx=24, ny=24, tolerance=1e-3, max_iterations=4000,
            convergence_metric="residual"))
        solver.solve()
        assert seen and all(m == "residual" for m in seen)


class TestFasFloor:
    def test_floor_values(self):
        from anap3_tpu.models.spectral_vmg import (cell_peclet,
                                                   default_coarsest_n,
                                                   fas_coarsest_n)

        # FSG-cascade Pe guard (unchanged semantics)
        assert cell_peclet(1000.0, 24) == pytest.approx(65.4, abs=0.1)
        assert default_coarsest_n(100.0) == 12
        assert default_coarsest_n(1000.0) == 15
        # FAS resolution floor ~2.4*sqrt(Re): brackets measured round-2
        assert fas_coarsest_n(25.0) == 12
        assert fas_coarsest_n(100.0) == 24
        assert 48 < fas_coarsest_n(1000.0) <= 96
        # round-5 high-Re re-bracketing (VERDICT r4 #8, measured
        # 2026-08-20, see FAS_RESOLUTION_COEFF docstring): at Re=3200
        # cold [192,96] AND [192,64] converge unbiased, so the rule's
        # 136 is a conservative sufficient condition (>=2x above the
        # true floor); at Re=10000 a forced [192,96] DIVERGES (Pe 164 >
        # 110), so the production max(FAS, Pe) coarsest = 240 is
        # confirmed on the failing side.
        assert fas_coarsest_n(3200.0) == 136
        from anap3_tpu.models.spectral_vmg import (PE_COARSEST_MAX,
                                                   cell_peclet)
        assert cell_peclet(10000.0, 96) > PE_COARSEST_MAX
        assert max(fas_coarsest_n(10000.0),
                   default_coarsest_n(10000.0)) == 240

    def test_forced_orders_ladder(self):
        """--orders experiment hook: explicit (incl. non-nested) ladders
        build valid transfers; singular mode rejects non-nested pairs."""
        from anap3_tpu.models.spectral_vmg import build_vmg_levels

        p = make_params(Re=1000.0, nx=48, ny=48)
        lv = build_vmg_levels(p, orders=[48, 32])   # non-nested pair
        assert [l.n for l in lv] == [48, 32]
        assert lv[0].inj_full.shape == (33, 49)
        assert lv[0].pro_full.shape == (49, 33)
        with pytest.raises(ValueError):
            build_vmg_levels(p, orders=[32, 48])    # not fine-to-coarse
        p_sing = make_params(Re=1000.0, nx=48, ny=48)
        p_sing.corner_treatment = "singular"
        with pytest.raises(ValueError):
            build_vmg_levels(p_sing, orders=[48, 32])

    def test_warning_fires_on_degenerate_hierarchy(self, caplog):
        import logging

        solver = VMGSolver(params=make_params(Re=1000.0, nx=24, ny=24,
                                              max_iterations=40))
        with caplog.at_level(logging.WARNING):
            solver.solve()
        assert any("single level" in r.message for r in caplog.records)

    def test_no_warning_with_admissible_hierarchy(self, caplog):
        import logging

        solver = VMGSolver(params=make_params(Re=25.0, nx=24, ny=24,
                                              max_iterations=40))
        with caplog.at_level(logging.WARNING):
            solver.solve()
        assert not any("single level" in r.message for r in caplog.records)
