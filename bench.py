#!/usr/bin/env python
"""Throughput benchmark: spectral RK4 pseudo-timesteps/sec at N=128.

This is the BASELINE.json primary metric ("timesteps/sec at spectral
N=128"). The reference publishes no wall-time numbers (BASELINE.md), so
``vs_baseline`` is measured against a faithful numpy float64 implementation
of the same RK4/AC step — the per-iteration cost model of the reference's
pure-numpy hot loop (sg.py:278-449) — run on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import faulthandler
import json
import signal
import sys
import time
from pathlib import Path

# debuggability through the remote-TPU tunnel: stage markers go to stderr
# (the driver parses only the stdout JSON line), and SIGUSR1 dumps all
# thread stacks if a stage wedges.
faulthandler.register(signal.SIGUSR1, all_threads=True)


def _stage(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

N = 128
STEPS_PER_CALL = 5000  # production chunk_size (conf/solver/spectral/sg.yaml)
TARGET_SECONDS = 6.0


def _sync(x) -> float:
    """Hard device sync via a host transfer.

    This image's remote-TPU platform can return from
    ``jax.block_until_ready`` before deeply-queued work has executed
    (measured: 10 chained 1000-step chunks "completed" in 2 ms), which
    fabricates throughput numbers. A device->host copy of a reduction
    cannot lie: the scalar's value depends on every queued step.
    """
    import jax.numpy as jnp

    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def _enable_compile_cache():
    """Persistent XLA compile cache — first-compile over the remote-compile
    tunnel costs minutes; cached reruns cost milliseconds."""
    from anap3_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(Path(__file__).resolve().parent / ".jax_cache")


# bf16 MXU peak TFLOP/s by device kind (first substring match wins).
_PEAK_BF16_TFLOPS = (
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
    ("v6", 918.0), ("trillium", 918.0), ("v4", 275.0), ("v3", 123.0),
)


def _peak_tflops(device_str: str) -> float | None:
    d = device_str.lower()
    for key, peak in _PEAK_BF16_TFLOPS:
        if key in d:
            return peak
    return None


def _roofline(n: int, steps_per_sec: float, lanes: int = 1,
              algorithm: str = "x3", macs_per_step: float = None) -> dict:
    """Achieved TFLOP/s and model-FLOPs utilization for a spectral stage.

    FLOP model (per RK4 step, per lane, aligned bordered-core kernel):
    each stage runs 3 left dots of 2N*N*N MACs (DX2/PX2 stacks), 2 right
    dots of N*N*2N (DY2), and 2 pressure-gradient dots of N^3 — 12 N^3
    MACs/stage, 48 N^3 per step (decimated metrics/residual strips add
    <1% at metrics_every=16 and are excluded). ``useful`` counts logical
    f32 math; ``mxu`` counts the bf16 passes the x3 decomposition issues
    (3 per logical dot). MFU is mxu vs the device's bf16 peak — the gap
    that remains IS the optimization headroom (VPU elementwise, loop
    state machine, issue overhead).
    """
    import jax

    per_step = 48.0 * n ** 3 if macs_per_step is None else macs_per_step
    macs = per_step * lanes * steps_per_sec
    useful = 2.0 * macs / 1e12
    mult = {"x3": 3.0, "x6": 6.0, "f32": 6.0}.get(algorithm, 3.0)
    out = {"tflops_useful": round(useful, 2),
           "tflops_mxu": round(useful * mult, 2)}
    peak = _peak_tflops(str(jax.devices()[0]))
    if peak:
        out["mfu_pct"] = round(100.0 * useful * mult / peak, 1)
        # contraction-axis lane padding (Mosaic pads the k dim of every
        # stage dot to the 128-lane tile): at N % 128 != 0 the MXU
        # processes ceil(N/128)*128 lanes per pass but only N are useful,
        # capping the MODEL-flop MFU below 100% no matter how perfect the
        # kernel — N=192 caps at 75.0, N=320 at 83.3 (VERDICT r4 #7;
        # unavoidable for a single solve: the k axis IS the state row
        # count). `mfu_of_pad_ceiling_pct` is MFU against that bound —
        # the kernel-quality number comparable across sizes.
        k_pad = -(-n // 128) * 128
        ceiling = 100.0 * n / k_pad
        out["mfu_pad_ceiling_pct"] = round(ceiling, 1)
        out["mfu_of_pad_ceiling_pct"] = round(
            100.0 * out["mfu_pct"] / ceiling, 1)
    return out


def bench_device() -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from anap3_tpu.models.params import SpectralParameters
    from anap3_tpu.models import spectral_sg as core

    params = SpectralParameters(
        name="spectral", Re=1000.0, nx=N, ny=N, basis_type="chebyshev",
        CFL=1.5, beta_squared=5.0, corner_treatment="smoothing",
        corner_smoothing=0.15, dtype="float32",
    )
    ops, _ = core.build_spectral_ops(params)
    state = core.initial_state(ops)

    # Production TPU path (ops/pallas_aligned.py bordered-core kernel at
    # N in {128, 256}, ops/pallas_tiled.py otherwise; x3 matmul algorithm):
    # whole chunks of RK4 steps fused into single Mosaic kernels, including
    # the per-step convergence state machine — exactly what SGSolver runs
    # on TPU float32 with matmul_algorithm=auto (chunk_size 5000 is the
    # conf/solver/spectral/sg.yaml production default). Falls back to the
    # XLA per-step scan where Pallas is unavailable.
    step_kind = "pallas-aligned-x3-chunk"
    try:
        if jax.default_backend() != "tpu":
            # pallas_call only fails at first execution, which is outside
            # this try — gate eagerly so the CPU fallback takes the scan
            raise RuntimeError("pallas kernels need the TPU backend")
        from anap3_tpu.ops.pallas_aligned import (aligned_supported,
                                                  make_aligned_chunk_runner)
        from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner

        if aligned_supported(N):
            # metrics_every=16 matches the production tier selection
            # (models/spectral.py ALIGNED_METRICS_EVERY)
            runner = make_aligned_chunk_runner(ops, STEPS_PER_CALL, 1e-12,
                                               10, algorithm="x3",
                                               metrics_every=16)
        else:
            step_kind = "pallas-tiled-x3-chunk"
            runner = make_tiled_chunk_runner(ops, STEPS_PER_CALL, 1e-12, 10,
                                             algorithm="x3")

        def run_chunk(state, it, ref):
            new_state, done, conv, cv, rows, ref = runner(state, it, ref)
            return new_state
    except Exception:  # unsupported size/platform -> XLA path
        step_kind = "xla"

        @jax.jit
        def _scan(state):
            def body(s, _):
                s, _m = core.sg_step(ops, s)
                return s, ()
            s, _ = jax.lax.scan(body, state, None, length=STEPS_PER_CALL)
            return s

        def run_chunk(state, it, ref):
            return _scan(state)

    ref = jnp.asarray(jnp.inf, jnp.float32)

    # compile + warmup
    t0 = time.time()
    state = run_chunk(state, jnp.int32(0), ref)
    _sync(state.u)
    compile_s = time.time() - t0

    # timed region: at least TARGET_SECONDS of steady-state stepping.
    # Sync every few calls to keep the dispatch queue bounded while still
    # overlapping host dispatch with device execution.
    n_calls = 0
    it = STEPS_PER_CALL
    t0 = time.time()
    while time.time() - t0 < TARGET_SECONDS:
        state = run_chunk(state, jnp.int32(it), ref)
        it += STEPS_PER_CALL
        n_calls += 1
        if n_calls % 40 == 0:
            _sync(state.u)
    _sync(state.u)
    elapsed = time.time() - t0
    steps = n_calls * STEPS_PER_CALL
    rate = steps / elapsed
    extras = {
        "device": str(jax.devices()[0]),
        "step_kind": step_kind,
        "compile_seconds": round(compile_s, 2),
        "steps_timed": steps,
        "final_u_finite": bool(np.isfinite(np.asarray(state.u)).all()),
        **{k: v for k, v in _roofline(N, rate).items()},
    }
    return rate, extras


def bench_numpy_reference(max_steps: int = 30) -> float:
    """Reference-equivalent numpy float64 RK4/AC step cost on this host."""
    from anap3_tpu.models.params import SpectralParameters
    from anap3_tpu.ops import basis as B
    from anap3_tpu.ops.corner import lid_profile

    params = SpectralParameters(nx=N, ny=N, basis_type="chebyshev",
                                corner_treatment="smoothing")
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    x = bx.nodes(N + 1)
    Dx = bx.diff_matrix(N + 1)
    Dxx = Dx @ Dx
    Ix = B.inner_to_full_interp_matrix(x)
    nf = N + 1
    nu = 1.0 / 1000.0
    beta_sq = 5.0
    u = np.zeros((nf, nf))
    v = np.zeros((nf, nf))
    p = np.zeros((nf - 2, nf - 2))
    u_lid = lid_profile(x, "smoothing", 0.15, 1.0, 1.0)
    dx_min = np.min(np.diff(x))

    def enforce(u, v):
        u[0, :] = 0; u[-1, :] = 0; u[:, 0] = 0; u[:, -1] = u_lid
        v[0, :] = 0; v[-1, :] = 0; v[:, 0] = 0; v[:, -1] = 0
        return u, v

    def residuals(u, v, p):
        du_dx = Dx @ u
        du_dy = u @ Dx.T
        dv_dx = Dx @ v
        dv_dy = v @ Dx.T
        lap_u = Dxx @ u + u @ Dxx.T
        lap_v = Dxx @ v + v @ Dxx.T
        p_full = Ix @ p @ Ix.T
        dp_dx = Dx @ p_full
        dp_dy = p_full @ Dx.T
        R_u = -(u * du_dx + v * du_dy) - dp_dx + nu * lap_u
        R_v = -(u * dv_dx + v * dv_dy) - dp_dy + nu * lap_v
        R_p = -beta_sq * (du_dx + dv_dy)[1:-1, 1:-1]
        return R_u, R_v, R_p

    u, v = enforce(u, v)
    # one warm step
    t0 = time.time()
    steps = 0
    while steps < max_steps and time.time() - t0 < TARGET_SECONDS:
        u_max = max(np.max(np.abs(u)), 1.0)
        v_max = max(np.max(np.abs(v)), 1e-10)
        lam = ((u_max + np.sqrt(u_max**2 + beta_sq)) / dx_min
               + nu / dx_min**2) * 2.0
        dt = 1.5 / lam
        u0, v0, p0 = u.copy(), v.copy(), p.copy()
        for alpha in (0.25, 1 / 3, 0.5, 1.0):
            R_u, R_v, R_p = residuals(u, v, p)
            u = u0 + alpha * dt * R_u
            v = v0 + alpha * dt * R_v
            p = p0 + alpha * dt * R_p
            u, v = enforce(u, v)
        steps += 1
    return steps / (time.time() - t0)


def bench_lanes(n: int = None, b_req: int = 8, window: float = 10.0,
                key_b: bool = False) -> dict:
    """Aggregate sweep throughput: B lanes of N=``n`` in ONE lane-batched
    Pallas program — the production multirun path for fused-kernel-eligible
    sweep groups (main.run_multirun_batched). Round 4 dispatches the
    lane-batched ALIGNED bordered-core kernel (ops/pallas_lanes_aligned.py,
    metrics_every=16, matching maybe_lane_runner's production selection);
    the padded tiled lane kernel is the fallback."""
    import jax
    import jax.numpy as jnp

    from anap3_tpu.models.params import SpectralParameters
    from anap3_tpu.models import spectral_sg as core
    from anap3_tpu.ops import pallas_lanes as PL
    from anap3_tpu.ops import pallas_lanes_aligned as PLA

    N = n if n is not None else globals()["N"]
    B = PLA.suggest_aligned_lane_count(N, b_req)
    Res = np.linspace(400.0, 1100.0, B)
    ops_list = []
    states = []
    for Re in Res:
        p = SpectralParameters(
            name="spectral", Re=float(Re), nx=N, ny=N,
            basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
            corner_treatment="smoothing", corner_smoothing=0.15,
            dtype="float32")
        o, _ = core.build_spectral_ops(p)
        ops_list.append(o)
        states.append(core.initial_state(o))
    batched = jax.tree.map(lambda *a: jnp.stack(a), *states)

    CHUNK = 2000
    if PLA.aligned_lanes_supported(ops_list):
        lane_kind = "pallas-lanes-aligned-x3"
        runner = PLA.make_aligned_lane_runner(ops_list, CHUNK, 1e-12, 10,
                                              metrics_every=16)
    else:
        lane_kind = "pallas-lanes-tiled-x3"
        runner = PL.make_lane_chunk_runner(ops_list, CHUNK, 1e-12, 10)
    # First call compiles the B-lane Mosaic program; through this image's
    # remote-compile tunnel that can take seconds (cached) to tens of
    # minutes (cold tunnel under load, measured 2026-08-19). Run it on a
    # daemon thread with a hard bound so a slow compile degrades this
    # stage instead of hanging the whole benchmark; a completed compile
    # lands in the persistent cache, so the next run is fast regardless.
    import threading

    box = {}
    t0 = time.time()

    def _warm():
        out = runner(batched, jnp.asarray(0, jnp.int32))
        _sync(out[0].u)
        box["out"] = out

    th = threading.Thread(target=_warm, daemon=True)
    th.start()
    th.join(timeout=float(__import__("os").environ.get(
        "BENCH_LANES_COMPILE_TIMEOUT", "900")))
    if "out" not in box:
        raise TimeoutError(
            f"lane kernel compile exceeded bound ({time.time() - t0:.0f}s); "
            "rerun once the persistent cache holds it")
    out = box["out"]
    compile_s = time.time() - t0

    # >= 10 s timed window (VERDICT r3: a 4 s window left the lane number
    # arguable as measurement noise) with a recorded sync cadence so runs
    # with different cadences are never compared as equivalent.
    SYNC_EVERY = 4
    s, it = out[0], CHUNK
    t0 = time.time()
    n_chunks = 0
    while time.time() - t0 < window:
        out = runner(s, jnp.asarray(it, jnp.int32))
        s, it = out[0], it + CHUNK
        n_chunks += 1
        # Bound the dispatch queue: a lane chunk takes O(100ms) of device
        # time while dispatch costs ~1ms, so an unsynced loop enqueues
        # a backlog the final sync then drains for tens of minutes
        # (observed 2026-08-19: bench wedged >18 min at this stage).
        if n_chunks % SYNC_EVERY == 0:
            _sync(s.u)
    _sync(s.u)
    wall = time.time() - t0
    rate = B * n_chunks * CHUNK / wall
    pre = "sweep_lane" if n is None else f"sweep_lane_N{N}"
    if key_b:  # distinct key family for extra-B stages at the same N
        pre = f"{pre}_B{B}"
    return {
        f"sweep_lane_steps_per_sec_N{N}_B{B}": round(rate, 1),
        f"{pre}_kind": lane_kind,
        f"{pre}_per_lane_steps_per_sec": round(rate / B, 1),
        f"{pre}_window_seconds": round(wall, 1),
        f"{pre}_sync_every_chunks": SYNC_EVERY,
        f"{pre}_compile_seconds": round(compile_s, 2),
        f"{pre}s_finite": bool(np.isfinite(np.asarray(s.u)).all()),
        **{f"{pre}_" + k: v
           for k, v in _roofline(N, rate / B, lanes=B).items()},
    }


def _measure_vpu_tflops(seconds: float = 2.0) -> float:
    """Measured f32 elementwise peak (TFLOP/s) via a VMEM-resident Pallas
    FMA chain — the denominator for the FV stencil roofline.

    The chain alternates ``x*a + b`` and ``x*x + b`` so no two steps are
    jointly affine (an affine pair folds: measured 31 TFLOP/s folded vs
    14.1 honest on v5e, 2026-08-20). Convention: FMA = 2 flops — the same
    convention the FV flop model uses. The 14.1 TFLOP/s v5e result matches
    8x128 lanes x 4 ALUs x 2 (FMA) at ~1.7 GHz.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # KNOWN VARIANCE: one call is only ~38 us of compute, so tunnel
    # dispatch hiccups can depress a whole window (a 2.1 TFLOP/s reading
    # was observed under load 2026-08-21 vs the 14.1 honest peak); a
    # 16x-heavier chain would fix it but its kernel is uncached and the
    # remote compile can exceed the whole bench budget — treat readings
    # far below 14 as load artifacts (fv_compute_sol_pct inherits them)
    M, INNER = 256, 4096

    def kernel(x_ref, a_ref, b_ref, o_ref):
        a, b = a_ref[...], b_ref[...]

        def body(_i, x):
            x = x * a + b
            x = x * x + b
            return x

        o_ref[...] = jax.lax.fori_loop(0, INNER // 2, body, x_ref[...])

    @jax.jit
    def run(x, a, b):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        )(x, a, b)

    a = jnp.full((M, M), 0.5, jnp.float32)
    b = jnp.full((M, M), 0.25, jnp.float32)
    x = run(jnp.full((M, M), 0.5, jnp.float32), a, b)
    _sync(x)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        calls = 0
        while time.time() - t0 < seconds / 3:
            x = run(x, a, b)
            calls += 1
        _sync(x)
        best = max(best, 2.0 * M * M * INNER * calls
                   / (time.time() - t0) / 1e12)
    return best


def _fv_flop_model(n: int, k_inner: int, n_refine: int) -> tuple[float, float]:
    """(vpu_flops, mxu_macs) per fused SIMPLE iteration.

    Hand count of ops/pallas_fv.py:_make_iterate arithmetic (1 flop per
    elementwise op, FMA = 2 — the _measure_vpu_tflops convention; shifts
    and selects-by-mask counted 1, data movement 0):

    - per BiCGSTAB iteration (joint u/v): 5 dot2 reductions (4 N^2 each),
      2 A() applies (18 N^2), preconditioner + vector updates + freeze
      selects (~34 N^2)  ->  ~96 N^2
    - outside the loop: initial residuals/rhs (~40), momentum
      coefficients + deferred correction (~50), Rhie-Chow + mdot (~30),
      divergence/means (~15), corrections (~20), gradients (2x cell + 3x
      fd ghost, ~80), metrics quadratures (~35)  ->  ~270 N^2

    MXU: the direct pressure solve is 4 dense (N,N)@(N,N) dots per
    psolve call -> 4 N^3 MACs, (1 + n_refine) calls, plus the refinement
    residual's 2 N^3 (A1 @ p', p' @ A2^T)  ->  (4 + 6*n_refine) N^3.
    """
    vpu = (96.0 * k_inner + 270.0) * n * n
    mxu = (4.0 + 6.0 * n_refine) * n ** 3
    return vpu, mxu


def bench_fv() -> dict:
    """FV-SIMPLE iterations/sec at N=128 on the PRODUCTION path.

    Measures ops/pallas_fv.py:make_pallas_fv_chunk_runner — whole chunks
    of SIMPLE iterations plus the convergence state machine in ONE kernel
    launch, state resident in VMEM across iterations — which is exactly
    what FVSolver.solve dispatches on TPU (models/fv.py:380-385). Rounds
    2-4 measured the one-kernel-per-iteration step inside a host-side
    scan, which pays an HBM state round-trip + launch per iteration and
    read 30.6k it/s where the production runner does ~43k (measured
    2026-08-20: chunk 500 and 2000 both 42.9-43.0k it/s).

    The comparable number is the float64 CPU rate of THIS solver (the
    reference's scipy/PyAMG loop is strictly slower than our vectorized
    CPU path): N=128 Re=100 converges in 11,488 iters / 48.4 s on this
    image's CPU = 237 it/s (recorded 2026-08-16, see STATUS.md).
    """
    import jax
    import jax.numpy as jnp

    from anap3_tpu.models.params import FVParameters
    from anap3_tpu.models.fv import build_fv_ops, fv_step, FVState

    params = FVParameters(
        name="fv", Re=100.0, nx=N, ny=N, convection_scheme="TVD",
        limiter="MUSCL", alpha_uv=0.4, alpha_p=0.2, linear_solver_tol=1e-9,
        corner_treatment="none", dtype="auto")
    from anap3_tpu.models.params import resolve_dtype

    params.dtype = resolve_dtype(params.dtype)
    ops, _ = build_fv_ops(params)
    dt = jnp.dtype(params.dtype)
    st0 = FVState(u=jnp.zeros((N, N), dt), v=jnp.zeros((N, N), dt),
                  p=jnp.zeros((N, N), dt), mx=jnp.zeros((N, N - 1), dt),
                  my=jnp.zeros((N - 1, N), dt))

    # production chunk/tolerance/warmup (conf/solver/fv.yaml chunk_size,
    # runner.WARMUP_ITERS) so the compiled program is byte-identical to a
    # real solve's and the persistent compile cache is shared with
    # bench_fv_walls. Convergence mid-window is harmless for timing: done
    # lanes keep iterating (the kernel computes then discards), so the
    # per-iteration work is unchanged.
    CHUNK, SYNC_EVERY = 1000, 4
    step_kind = "pallas-chunk"
    try:
        from anap3_tpu.ops.pallas_fv import make_pallas_fv_chunk_runner
        from anap3_tpu.models.runner import WARMUP_ITERS

        if params.dtype != "float32" or jax.default_backend() != "tpu":
            raise ValueError("fused FV kernel is the TPU float32 path")
        chunk_fn = make_pallas_fv_chunk_runner(
            params, ops, CHUNK, params.tolerance, WARMUP_ITERS,
            bicgstab_iters=int(params.fv_inner_iters))

        def run_chunk(state):
            s, *_rest = chunk_fn(state, jnp.int32(0), jnp.float32(1.0))
            return s
    except Exception:
        step_kind = "xla"
        CHUNK, SYNC_EVERY = 50, 64

        @jax.jit
        def run_chunk(state):
            def body(s, _):
                s2, _m = fv_step(ops, s)
                return s2, ()
            s, _ = jax.lax.scan(body, state, None, length=CHUNK)
            return s

    t0 = time.time()
    state = run_chunk(st0)
    _sync(state.u)
    compile_s = time.time() - t0

    n_calls = 0
    t0 = time.time()
    while time.time() - t0 < TARGET_SECONDS:
        state = run_chunk(state)
        n_calls += 1
        if n_calls % SYNC_EVERY == 0:
            _sync(state.u)
    _sync(state.u)
    rate = n_calls * CHUNK / (time.time() - t0)
    iter_us = 1e6 / rate

    # roofline (VERDICT r4 #5): analytic VPU/MXU flop model of the fused
    # iteration vs MEASURED peaks, so the it/s number is auditable like
    # the spectral stages. MXU = pressure-solve dots at f32 HIGHEST (6
    # bf16 passes); everything else is VPU stencil/reduction work.
    vpu_flops, mxu_macs = _fv_flop_model(
        N, int(params.fv_inner_iters), int(ops.n_refine))
    out = {
        "fv_N128_simple_iters_per_sec": round(rate, 1),
        "fv_iter_us": round(iter_us, 2),
        "fv_step_kind": step_kind,
        "fv_dtype": params.dtype,
        "fv_chunk": CHUNK,
        "fv_compile_seconds": round(compile_s, 2),
        "fv_vs_cpu_f64": round(rate / 237.0, 2),
        "fv_final_u_finite": bool(np.isfinite(np.asarray(state.u)).all()),
        "fv_vpu_flops_per_iter": round(vpu_flops / 1e6, 2),
        "fv_mxu_macs_per_iter": round(mxu_macs / 1e6, 2),
        **{"fv_" + k: v for k, v in _roofline(
            N, rate, algorithm="f32", macs_per_step=mxu_macs).items()},
    }
    try:
        vpu_peak = _measure_vpu_tflops()
        mxu_peak = _peak_tflops(str(jax.devices()[0])) or 197.0
        vpu_bound_us = vpu_flops / vpu_peak / 1e6
        mxu_bound_us = 2.0 * mxu_macs * 6.0 / mxu_peak / 1e6
        out.update({
            "fv_vpu_tflops_meas": round(vpu_peak, 1),
            "fv_vpu_bound_us": round(vpu_bound_us, 2),
            "fv_mxu_bound_us": round(mxu_bound_us, 2),
            # fraction of the pure-compute speed of light achieved; the
            # remainder is dependency latency: ~170 serialized full-array
            # reductions/iter on 128x128 arrays (5 dot2 x 16 BiCGSTAB
            # iters + norms), measured 5.3 us fixed + 1.2 us per BiCGSTAB
            # iteration (2026-08-20 K-decomposition, STATUS.md)
            "fv_compute_sol_pct": round(
                100.0 * (vpu_bound_us + mxu_bound_us) / iter_us, 1),
        })
    except Exception as exc:
        out["fv_vpu_probe_error"] = repr(exc)[:120]
    return out


def bench_fv_lanes(b: int = 8, window: float = 8.0) -> dict:
    """Aggregate FV-SIMPLE sweep throughput: B lanes in ONE Pallas program.

    The FV roofline showed single solves are bound by the ~174 serialized
    full-array reductions per SIMPLE iteration (5.3 us fixed + 1.2 us per
    BiCGSTAB iter vs a 0.11 us flop bound, STATUS.md round 5).
    ops/pallas_fv_lanes.py row-stacks B sweep lanes so each reduction link
    carries all lanes; the serialization is per-lane-slice inside each
    link, so aggregate throughput still beats B sequential solves (the
    batched-reduction rewrite that would flatten it fully was measured
    2.2x SLOWER — selector-dot latency; see STATUS.md round-5 additions).
    """
    import jax
    import jax.numpy as jnp

    from anap3_tpu.models.fv import FVState, build_fv_ops
    from anap3_tpu.models.params import FVParameters
    from anap3_tpu.ops.pallas_fv_lanes import make_fv_lane_runner

    if jax.default_backend() != "tpu":
        raise RuntimeError("FV lane kernel needs the TPU backend")
    Res = np.linspace(400.0, 1100.0, b)
    cfgs = []
    for r in Res:
        p = FVParameters(
            name="fv", Re=float(r), nx=N, ny=N, convection_scheme="TVD",
            limiter="MUSCL", alpha_uv=0.4, alpha_p=0.2,
            linear_solver_tol=1e-9, tolerance=1e-12,
            max_iterations=10**9, corner_treatment="none", dtype="float32")
        cfgs.append((p, build_fv_ops(p)[0]))
    CHUNK = 500
    run = make_fv_lane_runner([c[0] for c in cfgs], [c[1] for c in cfgs],
                              CHUNK, 1e-30, 10)
    z = jnp.zeros
    state = FVState(u=z((b, N, N), jnp.float32), v=z((b, N, N), jnp.float32),
                    p=z((b, N, N), jnp.float32),
                    mx=z((b, N, N - 1), jnp.float32),
                    my=z((b, N - 1, N), jnp.float32))
    t0 = time.time()
    state = run(state, jnp.int32(0))[0]
    _sync(state.u)
    compile_s = time.time() - t0
    it, n_chunks = CHUNK, 0
    t0 = time.time()
    while time.time() - t0 < window:
        state = run(state, jnp.int32(it))[0]
        it += CHUNK
        n_chunks += 1
        if n_chunks % 4 == 0:
            _sync(state.u)
    _sync(state.u)
    rate = n_chunks * CHUNK / (time.time() - t0)
    return {
        f"fv_lane_steps_per_sec_N{N}_B{b}": round(rate * b, 1),
        f"fv_lane_per_lane_steps_per_sec_N{N}_B{b}": round(rate, 1),
        f"fv_lane_compile_seconds": round(compile_s, 2),
        f"fv_lane_final_finite": bool(
            np.isfinite(np.asarray(state.u)).all()),
    }


def bench_fv_walls() -> dict:
    """End-to-end FV solve walls at N=128 (VERDICT r4 #5): the full
    production FVSolver.solve at the reference truth-run settings
    (tol=1e-6 — data/validation/fv/*/config.yaml), current kernels.

    Round-2 walls (6.5-6.9 s) predate the chunk-runner and the 43k it/s
    rate; these keys keep them fresh every round.
    """
    from anap3_tpu.models.fv import FVSolver
    from anap3_tpu.models.params import FVParameters, resolve_dtype

    out = {}
    for re_ in (100.0, 1000.0):
        params = FVParameters(
            name="fv", Re=re_, nx=N, ny=N, convection_scheme="TVD",
            limiter="MUSCL", alpha_uv=0.4, alpha_p=0.2,
            linear_solver_tol=1e-9, corner_treatment="none", dtype="auto",
            tolerance=1e-6, max_iterations=60000)
        params.dtype = resolve_dtype(params.dtype)
        solver = FVSolver(params)
        t0 = time.time()
        solver.solve()
        wall = time.time() - t0
        m = solver.metrics
        tag = f"fv_N{N}_Re{int(re_)}"
        out[f"{tag}_wall_s"] = round(wall, 2)
        out[f"{tag}_iters"] = int(m.iterations)
        out[f"{tag}_done"] = bool(m.converged or m.stalled)
        out[f"{tag}_final_rel_iter"] = float(f"{m.final_residual:.3e}")
    return out


def bench_stretch(n: int = 256) -> dict:
    """Stretch config (BASELINE "configs"): spectral N=256 Re=10000 saad lid.

    Round-1 XLA fallback measured 6,792 steps/s; the tiled x3 kernel is the
    round-2 path.
    """
    import jax
    import jax.numpy as jnp

    from anap3_tpu.models.params import SpectralParameters
    from anap3_tpu.models import spectral_sg as core
    from anap3_tpu.ops.pallas_aligned import (aligned_supported,
                                              make_aligned_chunk_runner)
    from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner

    params = SpectralParameters(
        name="spectral", Re=10000.0, nx=n, ny=n, basis_type="chebyshev",
        CFL=1.5, beta_squared=5.0, corner_treatment="saad", dtype="float32")
    ops, _ = core.build_spectral_ops(params)
    state = core.initial_state(ops)
    CH = 2000
    if aligned_supported(n):
        runner = make_aligned_chunk_runner(ops, CH, 1e-12, 10,
                                           algorithm="x3", metrics_every=16)
    else:
        runner = make_tiled_chunk_runner(ops, CH, 1e-12, 10, algorithm="x3",
                                         metrics_every=8)
    ref = jnp.asarray(jnp.inf, jnp.float32)
    t0 = time.time()
    state, *_ = runner(state, jnp.int32(0), ref)
    _sync(state.u)
    compile_s = time.time() - t0
    # sync every 40 chunks — the HEADLINE cadence (VERDICT r4 #7): at the
    # faster stretch sizes a 4-chunk cadence spent a measurable share of
    # the window inside the remote tunnel's sync RTT (N=192 measured
    # 49.4k at 4, 56.5k at 16, 59.0k at 40), so stretch sizes now sync
    # exactly as the headline stage does and the sizes are comparable
    SYNC_EVERY = 40
    n_calls, it = 0, CH
    t0 = time.time()
    while time.time() - t0 < TARGET_SECONDS:
        state, *_ = runner(state, jnp.int32(it), ref)
        it += CH
        n_calls += 1
        if n_calls % SYNC_EVERY == 0:
            _sync(state.u)
    _sync(state.u)
    rate = n_calls * CH / (time.time() - t0)
    out = {
        f"spectral_N{n}_steps_per_sec": round(rate, 1),
        f"spectral_N{n}_compile_seconds": round(compile_s, 2),
        f"spectral_N{n}_sync_every_chunks": SYNC_EVERY,
        **{f"spectral_N{n}_" + k: v for k, v in _roofline(n, rate).items()},
    }
    if n == 256:
        out[f"spectral_N{n}_vs_r1_xla"] = round(rate / 6792.0, 2)
    return out


def bench_multichip() -> dict:
    """Multi-chip scaling stage (VERDICT r4 #3).

    With >1 real device visible this measures genuine scaling efficiency
    in-process (sweep-sharded lane rate + x-sharded solve rate vs one
    device). With a single chip — this image's situation — it runs the same
    measurement on a virtual 8-device CPU mesh in a subprocess, so the
    mechanism stays exercised and the keys exist; those values are labeled
    ``dryrun-cpu8`` (virtual devices share host cores, efficiency numbers
    are NOT hardware claims).
    """
    import os
    import subprocess

    import jax

    if len(jax.devices()) > 1:
        from anap3_tpu.parallel.scaling import measure_scaling

        # nf = n+1 must divide the device count; 64-row grid covers d<=8
        vals = measure_scaling(jax.devices(), n=63, b_per_dev=2,
                               chunk=200, calls=3)
        mode = "real"
    else:
        repo = Path(__file__).resolve().parent
        env = {
            "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
            "HOME": os.environ.get("HOME", "/root"),
            "PYTHONPATH": str(repo),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        }
        proc = subprocess.run(
            [sys.executable, "-m", "anap3_tpu.parallel.scaling"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=600)
        if proc.returncode != 0:
            return {"multichip_error": proc.stderr[-200:]}
        vals = json.loads(proc.stdout.strip().splitlines()[-1])
        mode = "dryrun-cpu8"
    out = {"multichip_mode": mode}
    out.update({f"multichip_{k}": v for k, v in vals.items()})
    return out


def _device_available(timeout_s: int = 600) -> bool:
    """Probe TPU reachability in a SUBPROCESS with a hard timeout.

    The axon tunnel can wedge for an hour+ after an abnormal client death
    (jax.devices() hangs, then errors UNAVAILABLE — observed 2026-08-17);
    a hung bench run records nothing. The probe keeps the failure bounded
    so the CPU fallback can still produce an honest JSON line.
    """
    import signal
    import subprocess

    try:
        proc = subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        try:
            out, _ = proc.communicate(timeout=timeout_s)
            return proc.returncode == 0 and "ok" in (out or "")
        except subprocess.TimeoutExpired:
            # SIGTERM first so the client can close its pool grant (an
            # abnormally killed TPU client leaves a stale grant that wedges
            # the next client for ~1h — the failure this probe guards
            # against must not be caused by the probe itself)
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            return False
    except Exception:
        return False


def main():
    if not _device_available():
        # honest degraded mode: the same production path pinned to the
        # local CPU, clearly labeled (value is NOT comparable to TPU runs)
        import jax

        jax.config.update("jax_platforms", "cpu")
        rate, extras = bench_device()
        ref_rate = bench_numpy_reference()
        print(json.dumps({
            "metric": f"spectral_N{N}_rk4_timesteps_per_sec",
            "value": round(rate, 1),
            "unit": "timesteps/s",
            "vs_baseline": round(rate / ref_rate, 2),
            "baseline_numpy_steps_per_sec": round(ref_rate, 1),
            **extras,
            "device": "cpu-fallback (TPU tunnel unavailable)",
            "tpu_unavailable": True,
        }))
        return
    _stage("device probe ok; headline N=128")
    rate, extras = bench_device()
    _stage(f"headline {rate:.0f} steps/s; numpy baseline")
    ref_rate = bench_numpy_reference()
    _stage("fv")
    try:
        fv_extras = bench_fv()
    except Exception as exc:  # FV bench must not kill the primary metric
        fv_extras = {"fv_error": repr(exc)[:200]}
    _stage("fv end-to-end walls")
    try:
        fv_extras.update(bench_fv_walls())
    except Exception as exc:
        fv_extras["fv_walls_error"] = repr(exc)[:200]
    _stage("fv lane sweep")
    try:
        fv_extras.update(bench_fv_lanes())
    except Exception as exc:
        fv_extras["fv_lanes_error"] = repr(exc)[:200]
    # stretch + the other aligned-tier sizes the product recommends
    # (VERDICT r3 #2: the fast tier must not exist only at benchmark sizes)
    for n_extra in (192, 256, 320):
        _stage(f"stretch N={n_extra}")
        try:
            fv_extras.update(bench_stretch(n_extra))
        except Exception as exc:
            fv_extras[f"stretch_N{n_extra}_error"] = repr(exc)[:200]
    _stage("lane-batched sweep")
    try:
        fv_extras.update(bench_lanes())
    except Exception as exc:
        fv_extras["lanes_error"] = repr(exc)[:200]
    # wide sweep at the north-star size: 32 lanes of N=96 in one program
    # (single-lane N=96 is launch/sync-bound at ~128k steps/s; batching
    # amortizes it to ~285k aggregate — the "many concurrent sweep
    # members per host" axis of BASELINE.json)
    _stage("wide sweep N=96")
    try:
        fv_extras.update(bench_lanes(n=96, b_req=32, window=6.0))
    except Exception as exc:
        fv_extras["lanes_wide_error"] = repr(exc)[:200]
    # B=16 at N=96: with the round-5 group-packed left dots, 16 lanes
    # OUT-RUN 32 (304.5k vs 298.4k aggregate measured 2026-08-20) while
    # compiling 2.7x faster — recorded so sweep sizing has the data
    _stage("wide sweep N=96 B=16")
    try:
        fv_extras.update(bench_lanes(n=96, b_req=16, window=6.0,
                                     key_b=True))
    except Exception as exc:
        fv_extras["lanes_wide16_error"] = repr(exc)[:200]
    _stage("multichip scaling")
    try:
        fv_extras.update(bench_multichip())
    except Exception as exc:
        fv_extras["multichip_error"] = repr(exc)[:200]
    _stage("done")
    result = {
        "metric": f"spectral_N{N}_rk4_timesteps_per_sec",
        "value": round(rate, 1),
        "unit": "timesteps/s",
        "vs_baseline": round(rate / ref_rate, 2),
        "baseline_numpy_steps_per_sec": round(ref_rate, 1),
        **extras,
        **fv_extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
