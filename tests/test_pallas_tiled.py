"""Interpret-mode tests for the large-N tiled Pallas kernels.

Run on CPU via pallas interpret mode; the real-TPU throughput numbers are
recorded in STATUS.md (round 2). Parity targets: the x6 algorithm matches
the XLA step to f32 roundoff; the x3 algorithm (production default) matches
to its documented ~1e-5 decomposition error.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.models.runner import make_chunk_runner
from anap3_tpu.ops.pallas_tiled import (MAX_TILED_N, make_tiled_chunk_runner,
                                        make_tiled_sg_step)


def make_ops(N=16, Re=100.0):
    p = SpectralParameters(name="spectral", Re=Re, nx=N, ny=N,
                           basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
                           corner_treatment="smoothing", corner_smoothing=0.15,
                           dtype="float32")
    ops, _ = core.build_spectral_ops(p)
    return ops


class TestTiledStep:
    @pytest.mark.parametrize("algorithm,atol", [("x6", 5e-7), ("x3", 5e-5)])
    def test_matches_xla_step(self, algorithm, atol):
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        step = make_tiled_sg_step(ops, interpret=True, algorithm=algorithm)
        s_r, s_t = state, state
        for _ in range(5):
            s_r, m_r = core.sg_step(ops, s_r)
            s_t, m_t = step(s_t)
        assert float(jnp.max(jnp.abs(s_r.u - s_t.u))) < atol
        assert float(jnp.max(jnp.abs(s_r.v - s_t.v))) < atol
        assert float(jnp.max(jnp.abs(s_r.p - s_t.p))) < atol
        for key in ("u_eq", "v_eq", "continuity", "energy"):
            np.testing.assert_allclose(float(m_t[key]), float(m_r[key]),
                                       rtol=50 * atol)

    def test_padding_isolated(self):
        """nf=17 pads to 32: padded cells must remain exactly zero."""
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        step = make_tiled_sg_step(ops, interpret=True, algorithm="x6")
        s = state
        for _ in range(3):
            s, _ = step(s)
        # outputs are cropped; shapes must be the solver's own
        assert s.u.shape == (17, 17)
        assert s.p.shape == (15, 15)
        assert bool(jnp.isfinite(s.u).all())

    def test_block_tiling_matches_single_block(self):
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        s_one = make_tiled_sg_step(ops, interpret=True, blk=None,
                                   algorithm="x6")(state)[0]
        s_blk = make_tiled_sg_step(ops, interpret=True, blk=8,
                                   algorithm="x6")(state)[0]
        np.testing.assert_allclose(np.asarray(s_one.u), np.asarray(s_blk.u),
                                   atol=1e-6)

    def test_fit_blk_rounds_down_to_divisor(self):
        """Requested block heights that do not divide nfp round DOWN to a
        divisor instead of inflating the padding (nfp stays 32-granular)."""
        from anap3_tpu.ops.pallas_tiled import _fit_blk

        assert _fit_blk(288, 64) == 48
        assert _fit_blk(288, 32) == 32
        assert _fit_blk(160, 64) == 40
        assert _fit_blk(32, None) == 32
        assert _fit_blk(352, 32) == 32

    def test_blocked_chunk_runner_matches_whole_height(self):
        """The blocked row phase (used by singular N>192 and the VMG N=320
        tau tier) is bit-compatible with the whole-height kernel, metric
        rows included."""
        from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner

        ops = make_ops(N=16)
        state = core.initial_state(ops)
        a = make_tiled_chunk_runner(ops, 3, 1e-30, 10, interpret=True,
                                    algorithm="x6")
        b = make_tiled_chunk_runner(ops, 3, 1e-30, 10, interpret=True,
                                    algorithm="x6", blk=8)
        sa, *_ra = a(state, jnp.int32(0), jnp.float32(np.inf))
        sb, *_rb = b(state, jnp.int32(0), jnp.float32(np.inf))
        np.testing.assert_allclose(np.asarray(sa.u), np.asarray(sb.u),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(_ra[-2]), np.asarray(_rb[-2]),
                                   rtol=1e-5)

    def test_order_cap(self):
        ops = make_ops(N=16)
        with pytest.raises(ValueError):
            # fake a too-large order by lying about the cap
            import anap3_tpu.ops.pallas_tiled as t

            orig = t.MAX_TILED_N_RAISED
            try:
                t.MAX_TILED_N_RAISED = 8
                make_tiled_sg_step(ops, interpret=True)
            finally:
                t.MAX_TILED_N_RAISED = orig


class TestTiledChunkRunner:
    def test_matches_scan_runner(self):
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        CH, TOL = 30, 1e-3
        ref = make_chunk_runner(lambda s: core.sg_step(ops, s),
                                lambda s: (s.u, s.v), CH, TOL, 10)
        tiled = make_tiled_chunk_runner(ops, CH, TOL, 10, interpret=True,
                                        algorithm="x6")
        rn = jnp.asarray(jnp.inf, jnp.float32)
        sr, st = state, state
        for c in range(2):
            sr, dr, cir, cvr, rowsr, _ = ref(sr, jnp.int32(c * CH), rn)
            st, dt_, cit, cvt, rowst, _ = tiled(st, jnp.int32(c * CH), rn)
            assert bool(dr) == bool(dt_)
            assert int(cir) == int(cit)
            np.testing.assert_allclose(np.asarray(st.u), np.asarray(sr.u),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(rowst)[:, 0],
                                       np.asarray(rowsr)[:, 0], rtol=1e-4)

    def test_convergence_freeze(self):
        """Once converged inside a chunk, the state freezes (done flag)."""
        ops = make_ops(N=12)
        state = core.initial_state(ops)
        tiled = make_tiled_chunk_runner(ops, 50, 1e30, 10, interpret=True,
                                        algorithm="x6")
        rn = jnp.asarray(jnp.inf, jnp.float32)
        st, done, conv_iter, converged, rows, _ = tiled(
            state, jnp.int32(0), rn)
        # absurd tolerance: converges right at the warmup gate (iter 11)
        assert bool(done) and bool(converged)
        assert int(conv_iter) == 11
        # rows after convergence are NaN-frozen
        assert np.isnan(np.asarray(rows)[12:, 0]).all()

    def test_x3_close_to_x6(self):
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        rn = jnp.asarray(jnp.inf, jnp.float32)
        r3 = make_tiled_chunk_runner(ops, 40, 1e-12, 10, interpret=True,
                                     algorithm="x3")
        r6 = make_tiled_chunk_runner(ops, 40, 1e-12, 10, interpret=True,
                                     algorithm="x6")
        s3, *_ = r3(state, jnp.int32(0), rn)
        s6, *_ = r6(state, jnp.int32(0), rn)
        rel = float(jnp.linalg.norm(s3.u - s6.u)
                    / (jnp.linalg.norm(s6.u) + 1e-30))
        assert rel < 1e-3


class TestResidualMetricChunk:
    def test_matches_scan_runner_residual(self):
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        CH, TOL = 40, 1e-2
        ref = make_chunk_runner(lambda s: core.sg_step(ops, s),
                                lambda s: (s.u, s.v), CH, TOL, 10,
                                convergence_metric="residual")
        tiled = make_tiled_chunk_runner(ops, CH, TOL, 10, interpret=True,
                                        algorithm="x6",
                                        convergence_metric="residual")
        rn_r = jnp.asarray(jnp.inf, jnp.float32)
        rn_t = jnp.asarray(jnp.inf, jnp.float32)
        sr, st = state, state
        for c in range(3):
            sr, dr, cir, cvr, rowsr, rn_r = ref(sr, jnp.int32(c * CH), rn_r)
            st, dt_, cit, cvt, rowst, rn_t = tiled(st, jnp.int32(c * CH), rn_t)
            assert bool(dr) == bool(dt_)
            assert int(cir) == int(cit)
            np.testing.assert_allclose(float(rn_t), float(rn_r), rtol=1e-5)
            if bool(dr):
                break
        np.testing.assert_allclose(np.asarray(st.u), np.asarray(sr.u),
                                   atol=1e-6)


class TestMetricsCadence:
    def test_metrics_every_carries_values(self):
        ops = make_ops(N=16)
        state = core.initial_state(ops)
        rn = jnp.asarray(jnp.inf, jnp.float32)
        r1 = make_tiled_chunk_runner(ops, 24, 1e-12, 10, interpret=True,
                                     algorithm="x6")
        r4 = make_tiled_chunk_runner(ops, 24, 1e-12, 10, interpret=True,
                                     algorithm="x6", metrics_every=4)
        s1, *_rest1 = r1(state, jnp.int32(0), rn)
        rows1 = _rest1[3]
        s4, *_rest4 = r4(state, jnp.int32(0), rn)
        rows4 = _rest4[3]
        # states identical (metrics cadence never touches the dynamics)
        np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(s4.u))
        # sampled rows match exactly; in-between rows carry the last sample
        e1 = np.asarray(rows1)[:, 4]
        e4 = np.asarray(rows4)[:, 4]
        np.testing.assert_allclose(e4[::4], e1[::4], rtol=1e-6)
        np.testing.assert_array_equal(e4[1], e4[0])
        np.testing.assert_array_equal(e4[5], e4[4])
        # convergence-relevant columns stay per-step exact
        np.testing.assert_allclose(np.asarray(rows4)[:, 0],
                                   np.asarray(rows1)[:, 0], rtol=1e-6)
