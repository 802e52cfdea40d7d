"""Lane-batched ALIGNED kernel (ops/pallas_lanes_aligned.py), interpret mode.

Parity contract: each lane of the batched kernel must reproduce the B=1
bordered-core aligned kernel (ops/pallas_aligned.py) bit-exactly in state
and in the convergence-relevant metric columns at the same metrics_every
(matmul row-blocks are independent, so batching the right-side dots across
lanes cannot change any per-lane value).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_aligned import make_aligned_chunk_runner
from anap3_tpu.ops.pallas_lanes_aligned import (
    make_aligned_lane_runner, aligned_lanes_supported,
    suggest_aligned_lane_count, _validate_aligned_lanes)


def mk_ops(Re, n=96, **kw):
    p = SpectralParameters(Re=float(Re), nx=n, ny=n, dtype="float32", **kw)
    return core.build_spectral_ops(p, dtype=jnp.float32)[0]


def batch_states(ops_list):
    states = [core.initial_state(o) for o in ops_list]
    return states, jax.tree.map(lambda *a: jnp.stack(a), *states)


class TestSupport:
    def test_supported_batches(self):
        assert aligned_lanes_supported([mk_ops(100.0), mk_ops(400.0)])
        # singular lanes run the aligned lane kernel too (round 5)
        assert aligned_lanes_supported(
            [mk_ops(1000.0, n=128, corner_treatment="singular")])
        # ... but only in a uniform corner mode across the batch
        assert not aligned_lanes_supported(
            [mk_ops(1000.0, n=96, corner_treatment="singular"),
             mk_ops(1000.0, n=96)])
        # unsupported core size falls back (N=12 below the tier floor)
        assert not aligned_lanes_supported([mk_ops(100.0, n=12)])

    def test_validate_rejects_mixed_operators(self):
        with pytest.raises(ValueError, match="shared operators"):
            _validate_aligned_lanes([mk_ops(100.0, n=96),
                                     mk_ops(100.0, n=104)])

    def test_lane_budget(self):
        assert suggest_aligned_lane_count(128, 8) == 8
        assert suggest_aligned_lane_count(320, 64) < 64
        # calibration regression: N=96 B=64 measured OOM at 138.55 MB of
        # the v5e's 128 MB VMEM (2.17 MB/lane); B=32 measured working
        assert suggest_aligned_lane_count(96, 64) < 40
        assert suggest_aligned_lane_count(96, 32) == 32

    def test_maybe_lane_runner_prefers_aligned(self):
        """The sweep dispatch entry point selects the aligned lane kernel
        for eligible batches (use_pallas=true forces the TPU gate open)."""
        from anap3_tpu.ops.pallas_lanes import maybe_lane_runner

        ops_list = [mk_ops(100.0), mk_ops(400.0)]
        p = SpectralParameters(Re=100.0, nx=96, ny=96, dtype="float32")
        p.use_pallas = "true"
        factory = maybe_lane_runner(ops_list, p)
        assert factory is not None
        names = (factory.__code__.co_names + factory.__code__.co_freevars)
        assert "make_aligned_lane_runner" in names


class TestLaneParity:
    def test_lanes_match_b1_aligned(self):
        Res = [100.0, 400.0, 1000.0]
        ops_list = [mk_ops(Re) for Re in Res]
        chunk, tol, warmup = 4, 1e-30, 10
        fn = make_aligned_lane_runner(ops_list, chunk, tol, warmup,
                                      interpret=True)
        states, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        assert rows.shape == (chunk, 3, 7)
        for b, o in enumerate(ops_list):
            ref = make_aligned_chunk_runner(o, chunk, tol, warmup,
                                            interpret=True)
            rs, rdone, rconv, rever, rrows, _ = ref(
                states[b], jnp.int32(0), jnp.float32(np.inf))
            # states bit-identical
            assert jnp.array_equal(s.u[b], rs.u)
            assert jnp.array_equal(s.v[b], rs.v)
            assert jnp.array_equal(s.p[b], rs.p)
            A, R = np.asarray(rows)[:, b, :], np.asarray(rrows)
            # rel + residual norms + energy bit-identical
            np.testing.assert_array_equal(A[:, :5], R[:, :5])
            # enstrophy/palinstrophy: f32 rounding from batched-dot order
            np.testing.assert_allclose(A[:, 5:], R[:, 5:], rtol=1e-5)
            assert bool(done[b]) == bool(rdone)

    def test_packed_lanes_match_b1_aligned(self):
        """B=4 lanes of N=96 engage the COLUMN-PACKED left dots
        (4*96 = 384 = 3 exact 128-lane tiles); per-lane state must stay
        bit-identical to the B=1 aligned kernel (column blocks of a matmul
        are independent)."""
        Res = [100.0, 250.0, 500.0, 1000.0]
        self._check_packed_parity(Res)

    def test_partial_group_packed_lanes_match_b1_aligned(self):
        """B=6 at N=96 = one packed group of 4 + 2 per-lane leftover lanes
        (round 5: groups are fixed-width, gsz=4, so B % gsz lanes run the
        per-lane left2 path); every lane must still match B=1 bit-exactly."""
        Res = [100.0, 250.0, 400.0, 550.0, 700.0, 1000.0]
        self._check_packed_parity(Res)

    def _check_packed_parity(self, Res):
        ops_list = [mk_ops(Re) for Re in Res]
        chunk, tol, warmup = 3, 1e-30, 10
        fn = make_aligned_lane_runner(ops_list, chunk, tol, warmup,
                                      interpret=True)
        states, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        for b, o in enumerate(ops_list):
            ref = make_aligned_chunk_runner(o, chunk, tol, warmup,
                                            interpret=True)
            rs, *_m, rrows, _ = ref(states[b], jnp.int32(0),
                                    jnp.float32(np.inf))
            assert jnp.array_equal(s.u[b], rs.u)
            assert jnp.array_equal(s.v[b], rs.v)
            assert jnp.array_equal(s.p[b], rs.p)
            np.testing.assert_array_equal(
                np.asarray(rows)[:, b, :5], np.asarray(rrows)[:, :5])

    def test_singular_lanes_match_b1_aligned(self):
        """Sharp-lid lanes: per-lane parity to the B=1 aligned singular
        kernel — u/p bit-identical; v bit-identical except 1-2 ulp XLA
        fusion-order noise confined to positions where v itself is machine
        noise (the midline row, where the antisymmetric corner flows
        cancel and |v| ~ 1e-16 on a ~1e-2 field); convergence metric
        columns exact."""
        Res = [100.0, 400.0]
        ops_list = [mk_ops(Re, corner_treatment="singular") for Re in Res]
        chunk, tol, warmup = 4, 1e-30, 10
        fn = make_aligned_lane_runner(ops_list, chunk, tol, warmup,
                                      interpret=True)
        states, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        for b, o in enumerate(ops_list):
            ref = make_aligned_chunk_runner(o, chunk, tol, warmup,
                                            interpret=True)
            rs, rdone, rconv, rever, rrows, _ = ref(
                states[b], jnp.int32(0), jnp.float32(np.inf))
            assert jnp.array_equal(s.u[b], rs.u)
            assert jnp.array_equal(s.p[b], rs.p)
            V, RV = np.asarray(s.v[b]), np.asarray(rs.v)
            mism = V != RV
            if mism.any():
                assert np.abs(V - RV).max() < 1e-15
                assert np.abs(RV[mism]).max() < 1e-9
            A, R = np.asarray(rows)[:, b, :], np.asarray(rrows)
            np.testing.assert_array_equal(A[:, :5], R[:, :5])
            np.testing.assert_allclose(A[:, 5:], R[:, 5:], rtol=1e-5)
            assert bool(done[b]) == bool(rdone)

    def test_varying_lane_scalars_and_metrics_cadence(self):
        """CFL/beta/lid varying per lane, decimated metrics: sampled steps
        match the B=1 aligned kernel at the same cadence."""
        ops_list = [mk_ops(100.0, CFL=1.0), mk_ops(100.0, beta_squared=3.0),
                    mk_ops(100.0, corner_smoothing=0.3)]
        chunk = 5
        fn = make_aligned_lane_runner(ops_list, chunk, 1e-30, 10,
                                      interpret=True, metrics_every=2)
        states, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        for b, o in enumerate(ops_list):
            ref = make_aligned_chunk_runner(o, chunk, 1e-30, 10,
                                            interpret=True, metrics_every=2)
            rs, *_m, rrows, _ = ref(states[b], jnp.int32(0),
                                    jnp.float32(np.inf))
            assert jnp.array_equal(s.u[b], rs.u)
            assert jnp.array_equal(s.v[b], rs.v)
            np.testing.assert_array_equal(
                np.asarray(rows)[:, b, :5], np.asarray(rrows)[:, :5])


class TestLaneStateMachine:
    def test_nan_lane_freezes_others_continue(self):
        ops_list = [mk_ops(100.0), mk_ops(1000.0)]
        states, batched = batch_states(ops_list)
        bad = batched._replace(
            u=batched.u.at[1].set(jnp.float32(jnp.nan)))
        fn = make_aligned_lane_runner(ops_list, 3, 1e-30, 10,
                                      interpret=True)
        s, done, conv, ever, rows = fn(bad, jnp.int32(0))
        assert bool(done[1]) and not bool(ever[1])
        assert int(conv[1]) == 1
        assert not bool(done[0])
        # healthy lane advanced and stayed finite
        assert bool(jnp.isfinite(s.u[0]).all())
        # frozen lane's post-freeze rows are NaN-marked
        assert np.all(np.isnan(np.asarray(rows)[1:, 1, 0]))
