"""Lane-batched chunk kernel (ops/pallas_lanes.py), interpret mode on CPU.

Parity contract: each lane of the batched kernel must reproduce the B=1
tiled chunk kernel (ops/pallas_tiled.py) bit-exactly in state and in the
convergence-relevant metric columns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
from anap3_tpu.ops.pallas_lanes import (make_lane_chunk_runner,
                                        suggest_lane_count, _validate_lanes)


def mk_ops(Re, n=12, **kw):
    p = SpectralParameters(Re=float(Re), nx=n, ny=n, dtype="float32", **kw)
    return core.build_spectral_ops(p, dtype=jnp.float32)[0]


def batch_states(ops_list):
    states = [core.initial_state(o) for o in ops_list]
    return states, jax.tree.map(lambda *a: jnp.stack(a), *states)


class TestLaneParity:
    def test_lanes_match_b1_tiled_kernel(self):
        Res = [100.0, 400.0, 1000.0]
        ops_list = [mk_ops(Re) for Re in Res]
        chunk, tol, warmup = 30, 1e-30, 10
        fn = make_lane_chunk_runner(ops_list, chunk, tol, warmup,
                                    interpret=True)
        states, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        assert rows.shape == (chunk, 3, 7)
        for b, o in enumerate(ops_list):
            ref = make_tiled_chunk_runner(o, chunk, tol, warmup,
                                          interpret=True)
            rs, rdone, rconv, rever, rrows, _ = ref(
                states[b], jnp.int32(0), jnp.float32(np.inf))
            # states bit-identical
            assert jnp.array_equal(s.u[b], rs.u)
            assert jnp.array_equal(s.v[b], rs.v)
            assert jnp.array_equal(s.p[b], rs.p)
            A, R = np.asarray(rows)[:, b, :], np.asarray(rrows)
            # convergence-relevant columns bit-identical
            np.testing.assert_array_equal(A[:, :5], R[:, :5])
            # enstrophy/palinstrophy: f32 rounding from batched-dot order
            np.testing.assert_allclose(A[:, 5:], R[:, 5:], rtol=1e-5)
            assert bool(done[b]) == bool(rdone)

    @pytest.mark.slow  # ~16 s; lanes_match_b1 covers the parity in the fast tier
    def test_varying_lane_scalars(self):
        """CFL/beta/lid varying per lane (main._BATCHABLE_VARYING)."""
        ops_list = [mk_ops(100.0, CFL=1.0), mk_ops(100.0, CFL=1.5),
                    mk_ops(100.0, beta_squared=3.0),
                    mk_ops(100.0, corner_smoothing=0.3)]
        fn = make_lane_chunk_runner(ops_list, 20, 1e-30, 10, interpret=True)
        _, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        for b, o in enumerate(ops_list):
            ref = make_tiled_chunk_runner(o, 20, 1e-30, 10, interpret=True)
            rs, *_ = ref(jax.tree.map(lambda x: x[b], s)._replace(
                u=core.initial_state(o).u, v=core.initial_state(o).v,
                p=core.initial_state(o).p), jnp.int32(0),
                jnp.float32(np.inf))
            # first chunk from scratch for the reference
            assert jnp.array_equal(s.u[b], rs.u)


class TestLaneStateMachine:
    def test_converged_lane_freezes_others_continue(self):
        ops_list = [mk_ops(100.0), mk_ops(1000.0)]
        # huge tolerance: both converge right after warmup, at iter 11
        fn = make_lane_chunk_runner(ops_list, 25, 1e30, 10, interpret=True)
        _, batched = batch_states(ops_list)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        assert bool(done[0]) and bool(done[1])
        assert list(np.asarray(conv)) == [11, 11]
        assert bool(ever[0]) and bool(ever[1])
        # post-convergence rows are NaN
        assert np.all(np.isnan(np.asarray(rows)[12:, :, 0]))

    def test_nan_lane_isolated(self):
        ops_list = [mk_ops(100.0), mk_ops(400.0)]
        fn = make_lane_chunk_runner(ops_list, 20, 1e-30, 10, interpret=True)
        states, batched = batch_states(ops_list)
        bad = batched._replace(
            u=batched.u.at[1].set(jnp.float32(jnp.nan)))
        s, done, conv, ever, rows = fn(bad, jnp.int32(0))
        assert bool(done[1]) and not bool(ever[1])  # diverged, not converged
        assert not bool(done[0])
        # healthy lane matches its B=1 run exactly
        ref = make_tiled_chunk_runner(ops_list[0], 20, 1e-30, 10,
                                      interpret=True)
        rs, *_ = ref(states[0], jnp.int32(0), jnp.float32(np.inf))
        assert jnp.array_equal(s.u[0], rs.u)
        # the diverged lane froze after one committed step: interior NaN
        # (boundary rows keep their BC values, as in the B=1 kernel),
        # and it matches the B=1 kernel fed the same NaN state
        intr = np.asarray(ops_list[1].interior, bool)
        assert np.all(np.isnan(np.asarray(s.u[1])[intr]))
        ref1 = make_tiled_chunk_runner(ops_list[1], 20, 1e-30, 10,
                                       interpret=True)
        rs1, rdone1, *_ = ref1(
            states[1]._replace(u=states[1].u * jnp.float32(jnp.nan)),
            jnp.int32(0), jnp.float32(np.inf))
        assert bool(rdone1)
        np.testing.assert_array_equal(np.asarray(s.u[1])[intr],
                                      np.asarray(rs1.u)[intr])


class TestLaneGuards:
    def test_suggest_lane_count(self):
        assert suggest_lane_count(128, 8) >= 8
        assert suggest_lane_count(128, 64) < 64  # VMEM-bounded
        assert suggest_lane_count(32, 64) == 64  # small N fits many
        assert suggest_lane_count(320, 1) == 1

    def test_validate_rejects_mismatched_operators(self):
        a = mk_ops(100.0, n=12)
        b = mk_ops(100.0, n=12)
        bad = jax.tree.map(lambda x: x, b)
        bad.bc_v = b.bc_v + 1.0  # violates the cavity BC structure
        with pytest.raises(ValueError, match="BC structure"):
            _validate_lanes([a, bad])

    def test_sweep_runner_integration(self):
        """run_batched_sweep with the lane factory reproduces the vmapped
        reference runner lane-for-lane."""
        from anap3_tpu.parallel.sweep import run_batched_sweep, stack_ops

        ops_list = [mk_ops(100.0), mk_ops(400.0)]
        _, states = batch_states(ops_list)
        ops = stack_ops(ops_list)
        kw = dict(tolerance=1e-3, max_iterations=400, chunk=50)
        ref = run_batched_sweep(core.sg_step, lambda s: (s.u, s.v),
                                ops, states, **kw)
        res = run_batched_sweep(
            None, lambda s: (s.u, s.v), ops, states, **kw,
            chunk_runner=lambda c, t, w: make_lane_chunk_runner(
                ops_list, c, t, w, interpret=True))
        assert list(res.iterations) == list(ref.iterations)
        assert list(res.converged) == list(ref.converged)
        np.testing.assert_allclose(np.asarray(res.states.u),
                                   np.asarray(ref.states.u),
                                   rtol=2e-5, atol=2e-6)

    def test_maybe_lane_runner_gating(self):
        """The shared dispatch helper: factory on eligible batches, None on
        CPU-auto / mesh / mismatched lanes / VMEM overflow."""
        from anap3_tpu.ops.pallas_lanes import maybe_lane_runner

        ops_list = [mk_ops(100.0), mk_ops(400.0)]
        p = SpectralParameters(Re=100.0, nx=12, ny=12, dtype="float32")
        # auto on the CPU backend -> vmapped path
        assert maybe_lane_runner(ops_list, p) is None
        # forced on -> factory (construction only; execution needs TPU)
        p_on = SpectralParameters(Re=100.0, nx=12, ny=12, dtype="float32",
                                  use_pallas=True)
        assert callable(maybe_lane_runner(ops_list, p_on))
        # a mesh always opts out (the kernel is single-device)
        assert maybe_lane_runner(ops_list, p_on, mesh=object()) is None
        # mismatched lane operators -> None (not an exception)
        other = mk_ops(100.0, n=16)
        assert maybe_lane_runner([ops_list[0], other], p_on) is None
