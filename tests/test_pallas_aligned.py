"""Bordered-core aligned chunk kernel (ops/pallas_aligned.py), interpret mode.

Parity contract: the aligned kernel must reproduce the tiled chunk kernel
(ops/pallas_tiled.py) on state and metric rows to x3-roundoff tolerance —
the border decomposition is EXACT in real arithmetic (borders are per-run
constants), so any drift beyond f32 dot-order noise is a bug.

N must be a multiple of 128, so these tests run the real headline size in
interpret mode — the heavy ones are in the slow tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
from anap3_tpu.ops.pallas_aligned import (make_aligned_chunk_runner,
                                          aligned_supported)


def mk_ops(Re=400.0, n=128, **kw):
    p = SpectralParameters(Re=float(Re), nx=n, ny=n, dtype="float32", **kw)
    return core.build_spectral_ops(p, dtype=jnp.float32)[0]


class TestSupport:
    def test_aligned_supported(self):
        assert aligned_supported(128)
        assert aligned_supported(256)
        # generalized tier (round 4): any sublane-aligned core up to 320
        assert aligned_supported(96)
        assert aligned_supported(192)
        assert aligned_supported(320)
        assert not aligned_supported(129)  # core not sublane-aligned
        assert not aligned_supported(24)   # below the tier floor
        assert not aligned_supported(384)  # VMEM ceiling
        # singular mode reaches the tier's own ceiling (round 5: the
        # nine extra constant fields fit the raised vmem_limit_bytes the
        # plain tier already uses above N=256; measured on a v5e)
        assert aligned_supported(256, singular=True)
        assert aligned_supported(320, singular=True)
        assert not aligned_supported(384, singular=True)

    def test_rejects_unsupported_order(self):
        with pytest.raises(ValueError, match="N % 8"):
            make_aligned_chunk_runner(mk_ops(n=92), 4, 1e-6, 10,
                                      interpret=True)

    def test_fused_paths_selects_aligned_tier(self):
        from anap3_tpu.models.spectral import make_fused_paths

        ops = mk_ops(n=128)
        p = SpectralParameters(Re=400.0, nx=128, ny=128, dtype="float32")
        step, factory = make_fused_paths(ops, p, 1e-6)
        assert factory is not None
        names = (factory.__code__.co_names
                 + factory.__code__.co_freevars)
        assert "make_aligned_chunk_runner" in names


class TestParity:
    def test_matches_tiled_kernel(self):
        """3 steps from the cold start: state + all metric columns match
        the tiled kernel to x3 dot-order tolerance."""
        ops = mk_ops(Re=400.0)
        st = core.initial_state(ops)
        chunk = 3
        ref = make_tiled_chunk_runner(ops, chunk, 1e-30, 10, interpret=True)
        ali = make_aligned_chunk_runner(ops, chunk, 1e-30, 10,
                                        interpret=True)
        rs, rdone, _, _, rrows, _ = ref(st, jnp.int32(0),
                                        jnp.float32(np.inf))
        as_, adone, _, _, arows, _ = ali(st, jnp.int32(0),
                                         jnp.float32(np.inf))
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(as_.v), np.asarray(rs.v),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(as_.p), np.asarray(rs.p),
                                   rtol=2e-5, atol=1e-6)
        R, A = np.asarray(rrows), np.asarray(arows)
        # all 7 columns: rel_iter, residual norms, conserved quantities
        np.testing.assert_allclose(A, R, rtol=2e-4)
        assert bool(adone) == bool(rdone)
        # reassembled borders are the BC constants
        au = np.asarray(as_.u)
        np.testing.assert_array_equal(au[:, -1], np.asarray(ops.bc_u)[:, -1])
        np.testing.assert_array_equal(au[-1, :-1], 0.0)
        np.testing.assert_array_equal(np.asarray(as_.v)[-1, :], 0.0)

    def test_generalized_size_matches_tiled(self):
        """N=96 (the north-star size): core is NOT a 128 multiple —
        exercises the size-generic decomposition (round 4)."""
        ops = mk_ops(Re=400.0, n=96)
        st = core.initial_state(ops)
        ref = make_tiled_chunk_runner(ops, 2, 1e-30, 10, interpret=True)
        ali = make_aligned_chunk_runner(ops, 2, 1e-30, 10, interpret=True)
        rs, *_r = ref(st, jnp.int32(0), jnp.float32(np.inf))
        as_, *_a = ali(st, jnp.int32(0), jnp.float32(np.inf))
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(as_.v), np.asarray(rs.v),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(_a[-2]), np.asarray(_r[-2]),
                                   rtol=2e-4)  # all metric rows

    def test_decimated_residual_norms_hold(self):
        """metrics_every > 1: residual-norm columns are sampled on the
        metrics cadence (held in between); the rel column stays fresh."""
        ops = mk_ops(Re=400.0, n=96)
        st = core.initial_state(ops)
        a1 = make_aligned_chunk_runner(ops, 6, 1e-30, 10, interpret=True,
                                       metrics_every=1)
        a3 = make_aligned_chunk_runner(ops, 6, 1e-30, 10, interpret=True,
                                       metrics_every=3)
        *_1, rows1, _ = a1(st, jnp.int32(0), jnp.float32(np.inf))
        *_3, rows3, _ = a3(st, jnp.int32(0), jnp.float32(np.inf))
        R1, R3 = np.asarray(rows1), np.asarray(rows3)
        # rel_iter column is computed every step in both
        np.testing.assert_array_equal(R1[:, 0], R3[:, 0])
        # sampled steps (idx % 3 == 0) match the every-step kernel
        np.testing.assert_array_equal(R1[[0, 3], 1:4], R3[[0, 3], 1:4])
        # in-between steps hold the last sampled values
        for i in (1, 2):
            np.testing.assert_array_equal(R3[i, 1:4], R3[0, 1:4])
        for i in (4, 5):
            np.testing.assert_array_equal(R3[i, 1:4], R3[3, 1:4])

    def test_misaligned_chunk_phase_never_records_zeros(self):
        """Chunk length NOT a metrics_every multiple: the second chunk
        starts at a global idx off the cadence, and the zero-initialized
        held carries must NOT leak into the rows (round-4 review bug:
        idx 6,7 recorded energy 0.0). The first step of every chunk now
        runs a fresh pass."""
        ops = mk_ops(Re=400.0, n=96)
        st = core.initial_state(ops)
        run = make_aligned_chunk_runner(ops, 6, 1e-30, 10, interpret=True,
                                        metrics_every=4)
        st, *_, rows0, _ = run(st, jnp.int32(0), jnp.float32(np.inf))
        *_mid, rows1, _ = run(st, jnp.int32(6), jnp.float32(np.inf))
        R = np.asarray(rows1)
        assert np.all(R[:, 4] > 0.0)  # energy column: no zero carries
        assert np.all(R[:, 1:4] > 0.0)  # residual norms likewise
        # idx 6,7 hold the FRESH chunk-start pass (idx 6), then the
        # cadence fires at idx 8
        np.testing.assert_array_equal(R[1, 4:7], R[0, 4:7])
        assert R[2, 4] != R[1, 4]

    @pytest.mark.slow
    def test_sharp_lid_parity(self):
        """corner_treatment=none puts a nonzero value at the lid corner
        (lidb != 0) — exercises every border-constant path."""
        ops = mk_ops(Re=100.0, corner_treatment="none")
        st = core.initial_state(ops)
        ref = make_tiled_chunk_runner(ops, 2, 1e-30, 10, interpret=True)
        ali = make_aligned_chunk_runner(ops, 2, 1e-30, 10, interpret=True)
        rs, *_r = ref(st, jnp.int32(0), jnp.float32(np.inf))
        as_, *_a = ali(st, jnp.int32(0), jnp.float32(np.inf))
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(_a[-2]), np.asarray(_r[-2]),
                                   rtol=2e-4)  # rows

    def test_singular_mode_matches_tiled(self):
        """corner_treatment=singular: nonzero constants on EVERY border plus
        the sampled singular fields — the full generalized-constant path."""
        ops = mk_ops(Re=1000.0, corner_treatment="singular")
        st = core.initial_state(ops)
        ref = make_tiled_chunk_runner(ops, 3, 1e-30, 10, interpret=True)
        ali = make_aligned_chunk_runner(ops, 3, 1e-30, 10, interpret=True)
        rs, rdone, _, _, rrows, _ = ref(st, jnp.int32(0),
                                        jnp.float32(np.inf))
        as_, adone, _, _, arows, _ = ali(st, jnp.int32(0),
                                         jnp.float32(np.inf))
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(as_.v), np.asarray(rs.v),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(as_.p), np.asarray(rs.p),
                                   rtol=2e-5, atol=2e-6)
        # all 7 columns incl. the total-field conserved quantities
        np.testing.assert_allclose(np.asarray(arows), np.asarray(rrows),
                                   rtol=5e-4)
        assert bool(adone) == bool(rdone)
        # reassembled borders are the (nonzero) smooth-remainder constants
        np.testing.assert_array_equal(np.asarray(as_.u)[-1, :],
                                      np.asarray(ops.bc_u)[-1, :])
        np.testing.assert_array_equal(np.asarray(as_.v)[:, -1],
                                      np.asarray(ops.bc_v)[:, -1])

    def test_singular_generalized_size_matches_tiled(self):
        """Singular constants at N=96 (non-128-multiple core): the
        generalized singular border completions stay exact."""
        ops = mk_ops(Re=1000.0, n=96, corner_treatment="singular")
        st = core.initial_state(ops)
        ref = make_tiled_chunk_runner(ops, 2, 1e-30, 10, interpret=True)
        ali = make_aligned_chunk_runner(ops, 2, 1e-30, 10, interpret=True)
        rs, *_r = ref(st, jnp.int32(0), jnp.float32(np.inf))
        as_, *_a = ali(st, jnp.int32(0), jnp.float32(np.inf))
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(as_.v), np.asarray(rs.v),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(_a[-2]), np.asarray(_r[-2]),
                                   rtol=5e-4)

    def test_fused_paths_selects_aligned_for_singular(self):
        from anap3_tpu.models.spectral import make_fused_paths

        p = SpectralParameters(Re=1000.0, nx=128, ny=128, dtype="float32",
                               corner_treatment="singular")
        ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
        step, factory = make_fused_paths(ops, p, 1e-6)
        assert factory is not None
        names = (factory.__code__.co_names
                 + factory.__code__.co_freevars)
        assert "make_aligned_chunk_runner" in names

    def test_tau_step_matches_tiled_tau_step(self):
        """FAS-forced single step (VMG smoothing): state + metrics match
        make_tiled_sg_step(with_tau=True) at x6 to f32 dot-order noise,
        with a nonzero interior tau."""
        from anap3_tpu.ops.pallas_aligned import make_aligned_tau_step
        from anap3_tpu.ops.pallas_tiled import make_tiled_sg_step

        ops = mk_ops(Re=400.0, n=96)
        st = core.initial_state(ops)
        nf = 97
        rng = np.random.default_rng(0)
        t_u = np.zeros((nf, nf), np.float32)
        t_v = np.zeros((nf, nf), np.float32)
        t_u[1:-1, 1:-1] = rng.normal(0, 1e-3, (nf - 2, nf - 2))
        t_v[1:-1, 1:-1] = rng.normal(0, 1e-3, (nf - 2, nf - 2))
        t_p = rng.normal(0, 1e-3, (nf - 2, nf - 2)).astype(np.float32)
        tau = (jnp.asarray(t_u), jnp.asarray(t_v), jnp.asarray(t_p))

        ref = make_tiled_sg_step(ops, algorithm="x6", with_tau=True,
                                 interpret=True)
        ali = make_aligned_tau_step(ops, algorithm="x6", interpret=True)
        rs, rm = ref(st, tau)
        as_, am = ali(st, tau)
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(as_.v), np.asarray(rs.v),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(as_.p), np.asarray(rs.p),
                                   rtol=1e-5, atol=1e-7)
        for k in rm:
            np.testing.assert_allclose(float(am[k]), float(rm[k]),
                                       rtol=2e-4, err_msg=k)
        # borders of the reassembled state are the BC constants
        np.testing.assert_array_equal(np.asarray(as_.u)[:, -1],
                                      np.asarray(ops.bc_u)[:, -1])

    def test_tau_step_singular_matches_tiled(self):
        from anap3_tpu.ops.pallas_aligned import make_aligned_tau_step
        from anap3_tpu.ops.pallas_tiled import make_tiled_sg_step

        ops = mk_ops(Re=1000.0, n=96, corner_treatment="singular")
        st = core.initial_state(ops)
        zer = (jnp.zeros_like(st.u), jnp.zeros_like(st.v),
               jnp.zeros_like(st.p))
        ref = make_tiled_sg_step(ops, algorithm="x6", with_tau=True,
                                 interpret=True)
        ali = make_aligned_tau_step(ops, algorithm="x6", interpret=True)
        rs, rm = ref(st, zer)
        as_, am = ali(st, zer)
        np.testing.assert_allclose(np.asarray(as_.u), np.asarray(rs.u),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(as_.v), np.asarray(rs.v),
                                   rtol=1e-5, atol=1e-7)
        for k in rm:
            np.testing.assert_allclose(float(am[k]), float(rm[k]),
                                       rtol=5e-4, err_msg=k)

    def test_fused_tau_steps_select_aligned(self):
        """build_fused_tau_steps routes aligned-size levels to the
        bordered-core tau step (use_pallas=true opens the TPU gate)."""
        from anap3_tpu.models.spectral_vmg import (VMGSolver,
                                                   build_vmg_levels,
                                                   build_fused_tau_steps)

        s = VMGSolver(Re=100.0, nx=48, ny=48, dtype="float32",
                      basis_type="chebyshev", n_levels=2, multigrid="fsg",
                      use_pallas="true")
        levels = build_vmg_levels(s.params)
        steps = build_fused_tau_steps(s, levels)
        assert steps is not None and set(steps) == {0, 1}
        for fn in steps.values():
            names = fn.__code__.co_names + fn.__code__.co_freevars
            assert "call" in names or "mat_list" in names

    @pytest.mark.slow
    def test_residual_criterion_and_ref_norm(self):
        """The 'residual' criterion threads ref_norm identically."""
        ops = mk_ops(Re=400.0)
        st = core.initial_state(ops)
        kw = dict(convergence_metric="residual", interpret=True)
        ref = make_tiled_chunk_runner(ops, 12, 1e-30, 10, **kw)
        ali = make_aligned_chunk_runner(ops, 12, 1e-30, 10, **kw)
        *_r, rnorm_r = ref(st, jnp.int32(0), jnp.float32(np.inf))
        *_a, rnorm_a = ali(st, jnp.int32(0), jnp.float32(np.inf))
        assert np.isfinite(float(rnorm_a))  # set at the warmup iteration
        np.testing.assert_allclose(float(rnorm_a), float(rnorm_r),
                                   rtol=2e-4)

    @pytest.mark.slow
    def test_nan_divergence_freezes(self):
        ops = mk_ops(Re=400.0)
        st = core.initial_state(ops)
        bad = st._replace(u=st.u * jnp.float32(jnp.nan))
        ali = make_aligned_chunk_runner(ops, 5, 1e-30, 10, interpret=True)
        s, done, conv_iter, converged, rows, _ = ali(bad, jnp.int32(0),
                                                     jnp.float32(np.inf))
        assert bool(done) and not bool(converged)
        assert int(conv_iter) == 1
        # post-freeze rows are NaN-marked
        assert np.all(np.isnan(np.asarray(rows)[1:, 0]))
