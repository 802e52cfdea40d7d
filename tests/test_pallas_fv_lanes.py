"""Lane-batched FV-SIMPLE kernel (ops/pallas_fv_lanes.py), interpret mode.

Parity contract: each lane of the batched kernel reproduces the B=1 fused
FV chunk kernel (ops/pallas_fv.py) to fp rounding — same per-lane
reduction shapes/order and independent matmul row blocks, but XLA may
fuse the stacked-shape multiply-add chains differently (measured 1-2
ulp/iteration) — with EXACT agreement of the convergence flags and
iteration counts at convergence-relevant tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from anap3_tpu.models.fv import FVState, build_fv_ops
from anap3_tpu.models.params import FVParameters
from anap3_tpu.ops.pallas_fv import make_pallas_fv_chunk_runner
from anap3_tpu.ops.pallas_fv_lanes import (
    make_fv_lane_runner, fv_lanes_supported, suggest_fv_lane_count)


def mk(Re, n=16, **over):
    base = dict(
        name="fv", Re=float(Re), nx=n, ny=n, convection_scheme="TVD",
        limiter="MUSCL", alpha_uv=0.4, alpha_p=0.2, linear_solver_tol=1e-9,
        tolerance=1e-6, max_iterations=5000, corner_treatment="none",
        dtype="float32")
    base.update(over)
    p = FVParameters(**base)
    ops, _ = build_fv_ops(p)
    return p, ops


def zero_state(n, B=None):
    z = jnp.zeros
    if B is None:
        return FVState(u=z((n, n), jnp.float32), v=z((n, n), jnp.float32),
                       p=z((n, n), jnp.float32),
                       mx=z((n, n - 1), jnp.float32),
                       my=z((n - 1, n), jnp.float32))
    return FVState(u=z((B, n, n), jnp.float32),
                   v=z((B, n, n), jnp.float32),
                   p=z((B, n, n), jnp.float32),
                   mx=z((B, n, n - 1), jnp.float32),
                   my=z((B, n - 1, n), jnp.float32))


class TestSupport:
    def test_supported(self):
        ps = [mk(Re) for Re in (100.0, 400.0)]
        assert fv_lanes_supported([p for p, _ in ps], [o for _, o in ps])
        # mixed grids are rejected
        p2, o2 = mk(400.0, n=24)
        assert not fv_lanes_supported([ps[0][0], p2], [ps[0][1], o2])
        # MUSCL-sharp stays on the XLA path
        p3, o3 = mk(400.0, limiter="MUSCL-sharp")
        assert not fv_lanes_supported([ps[0][0], p3], [ps[0][1], o3])

    def test_lane_budget(self):
        assert suggest_fv_lane_count(128, 8) >= 8
        assert suggest_fv_lane_count(128, 1000) < 1000

    def test_mixed_alpha_allowed(self):
        ps = [mk(100.0), mk(400.0, alpha_uv=0.5, alpha_p=0.3)]
        assert fv_lanes_supported([p for p, _ in ps], [o for _, o in ps])


class TestLaneParity:
    def test_lanes_match_b1_chunk(self):
        """3 lanes (varying Re and relaxation) vs three B=1 runs: states
        and metric rows to fp-rounding tolerance, flags exact."""
        cfgs = [mk(100.0), mk(250.0), mk(400.0, alpha_uv=0.5)]
        params_list = [p for p, _ in cfgs]
        ops_list = [o for _, o in cfgs]
        CH, TOL, W = 3, 1e-30, 10
        fn = make_fv_lane_runner(params_list, ops_list, CH, TOL, W,
                                 bicgstab_iters=8, interpret=True)
        batched = zero_state(16, B=3)
        s, done, conv, ever, rows = fn(batched, jnp.int32(0))
        rn = jnp.asarray(jnp.inf, jnp.float32)
        tight = dict(rtol=3e-5, atol=1e-8)
        for b, (p, o) in enumerate(cfgs):
            ref = make_pallas_fv_chunk_runner(p, o, CH, TOL, W,
                                              bicgstab_iters=8,
                                              interpret=True)
            rs, rd, rci, rcv, rrows, _ = ref(zero_state(16), jnp.int32(0),
                                             rn)
            np.testing.assert_allclose(s.u[b], rs.u, **tight)
            np.testing.assert_allclose(s.v[b], rs.v, **tight)
            np.testing.assert_allclose(s.p[b], rs.p, **tight)
            np.testing.assert_allclose(s.mx[b], rs.mx, **tight)
            np.testing.assert_allclose(s.my[b], rs.my, **tight)
            assert bool(done[b]) == bool(rd)
            assert int(conv[b]) == int(rci)
            np.testing.assert_allclose(np.asarray(rows)[:, b, :],
                                       np.asarray(rrows), rtol=1e-3,
                                       atol=1e-7)

    def test_second_chunk_continues(self):
        """start_iter threading and state round-trip across chunk calls."""
        cfgs = [mk(100.0), mk(400.0)]
        params_list = [p for p, _ in cfgs]
        ops_list = [o for _, o in cfgs]
        CH, TOL, W = 2, 1e-30, 10
        fn = make_fv_lane_runner(params_list, ops_list, CH, TOL, W,
                                 bicgstab_iters=4, interpret=True)
        s = zero_state(16, B=2)
        s, *_ = fn(s, jnp.int32(0))
        s, done, conv, ever, rows = fn(s, jnp.int32(CH))
        rn = jnp.asarray(jnp.inf, jnp.float32)
        for b, (p, o) in enumerate(cfgs):
            ref = make_pallas_fv_chunk_runner(p, o, CH, TOL, W,
                                              bicgstab_iters=4,
                                              interpret=True)
            rs = zero_state(16)
            rs, *_r = ref(rs, jnp.int32(0), rn)
            rs, rd, rci, rcv, rrows, _ = ref(rs, jnp.int32(CH), rn)
            np.testing.assert_allclose(s.u[b], rs.u, rtol=3e-5, atol=1e-8)
            np.testing.assert_allclose(s.v[b], rs.v, rtol=3e-5, atol=1e-8)
            np.testing.assert_allclose(np.asarray(rows)[:, b, :],
                                       np.asarray(rrows), rtol=1e-3,
                                       atol=1e-7)


class TestLaneConvergence:
    def test_lanes_converge_and_freeze(self):
        """Lanes converge at their own iterations (per-lane machine) and
        converged lanes freeze (state stops changing)."""
        cfgs = [mk(50.0), mk(400.0)]
        params_list = [p for p, _ in cfgs]
        ops_list = [o for _, o in cfgs]
        CH, TOL, W = 60, 2e-3, 10
        fn = make_fv_lane_runner(params_list, ops_list, CH, TOL, W,
                                 bicgstab_iters=8, interpret=True)
        s = zero_state(16, B=2)
        it = 0
        for _ in range(12):
            s, done, conv, ever, rows = fn(s, jnp.int32(it))
            it += CH
            if bool(done.all()):
                break
        assert bool(done.all()), "both lanes should converge at this tol"
        assert bool(ever.all())
        c0, c1 = int(conv[0]), int(conv[1])
        assert c0 > 0 and c1 > 0 and c0 != c1
        # chunks are self-contained (done resets per call — the host
        # runner accumulates): a re-run re-converges immediately and the
        # within-chunk freeze holds the state to sub-tolerance drift
        s2, done2, conv2, ever2, _ = fn(s, jnp.int32(it))
        assert bool(done2.all()) and bool(ever2.all())
        drift = float(jnp.max(jnp.abs(s2.u - s.u)))
        assert drift < 10 * TOL
