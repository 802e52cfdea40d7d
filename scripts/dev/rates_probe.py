"""Parametrized kernel-throughput probe (consolidates the round-2/3
aligned/lanes/tiled/pallas probe family — findings recorded in STATUS.md
"Performance" and BENCH_r*.json).

Usage:
    python scripts/dev/rates_probe.py --kind aligned --n 128
    python scripts/dev/rates_probe.py --kind lanes-aligned --n 128 --b 8
    python scripts/dev/rates_probe.py --kind tiled --n 192 --seconds 10

Kinds: aligned | tiled | lanes | lanes-aligned | xla. Prints steps/s (per
lane and aggregate for lane kinds) after a warmup-compile call; uses the
persistent compile cache.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(Path(__file__).resolve().parents[2] / ".jax_cache")

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core


def build(n, Re, corner="smoothing"):
    p = SpectralParameters(
        name="spectral", Re=float(Re), nx=n, ny=n, basis_type="chebyshev",
        CFL=1.5, beta_squared=5.0, corner_treatment=corner,
        corner_smoothing=0.15, dtype="float32")
    ops, _ = core.build_spectral_ops(p)
    return ops, core.initial_state(ops)


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def dots_probe(n: int, seconds: float) -> None:
    """Pure-MXU speed-of-light ladder point for the aligned tier (#r4-7).

    Measures the x3 engine's DOMINANT dot shape in isolation — the merged
    left2 product (n, n) @ (n, 2n) with per-iteration state hi/lo split,
    exactly as pallas_tiled._DotEngine issues it — so the achieved bf16
    TFLOP/s IS the hardware ceiling for that contraction size (including
    the k = n % 128 padding tax at n in {192, 320}). Whatever MFU this
    prints is the speed of light the full solver kernel at the same N
    should be compared against.
    """
    from jax.experimental import pallas as pl

    T = 256
    rng = np.random.default_rng(0)
    A = (rng.standard_normal((n, n)) * 0.01).astype(np.float32)
    U0 = rng.standard_normal((n, 2 * n)).astype(np.float32)
    a_hi = jnp.asarray(A, jnp.bfloat16)
    a_lo = jnp.asarray(A - np.asarray(a_hi, np.float32), jnp.bfloat16)

    def kernel(ahi_ref, alo_ref, u_ref, o_ref):
        ahi, alo = ahi_ref[...], alo_ref[...]

        def body(_i, u):
            uhi = u.astype(jnp.bfloat16)
            ulo = (u - uhi.astype(jnp.float32)).astype(jnp.bfloat16)
            out = (jnp.dot(ahi, uhi, preferred_element_type=jnp.float32)
                   + jnp.dot(ahi, ulo, preferred_element_type=jnp.float32)
                   + jnp.dot(alo, uhi, preferred_element_type=jnp.float32))
            return out * jnp.float32(0.999)

        o_ref[...] = jax.lax.fori_loop(0, T, body, u_ref[...])

    @jax.jit
    def run(u):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((n, 2 * n), jnp.float32),
        )(a_hi, a_lo, u)

    u = run(jnp.asarray(U0))
    sync(u)
    macs_per_call = 3.0 * (n * n * 2 * n) * T  # bf16 MXU passes
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        calls = 0
        while time.time() - t0 < seconds / 3:
            u = run(u)
            calls += 1
        sync(u)
        tfl = 2.0 * macs_per_call * calls / (time.time() - t0) / 1e12
        best = max(best, tfl)
        print(f"  {tfl:.1f} bf16 TFLOP/s", flush=True)
    print(f"dots N={n}: {best:.1f} bf16 TFLOP/s = "
          f"{100.0 * best / 197.0:.1f}% of v5e peak "
          f"(x3 left2 shape ({n},{n})@({n},{2 * n}), hi/lo split included)",
          flush=True)


def fv_probe(a) -> None:
    """FV SIMPLE iteration rate: B=1 chunk kernel vs the lane-batched
    kernel (round 5) — the reduction-latency amortization measurement."""
    from anap3_tpu.models.fv import FVState, build_fv_ops
    from anap3_tpu.models.params import FVParameters

    n = a.n
    B = a.b if a.kind == "fv-lanes" else 1
    Res = np.linspace(400.0, 1100.0, B) if B > 1 else [a.re]
    cfgs = []
    for r in Res:
        p = FVParameters(
            name="fv", Re=float(r), nx=n, ny=n, convection_scheme="TVD",
            limiter="MUSCL", alpha_uv=0.4, alpha_p=0.2,
            linear_solver_tol=1e-9, tolerance=1e-12, max_iterations=10**9,
            corner_treatment="none", dtype="float32")
        cfgs.append((p, build_fv_ops(p)[0]))
    z = jnp.zeros
    if a.kind == "fv-lanes":
        from anap3_tpu.ops.pallas_fv_lanes import make_fv_lane_runner
        run = make_fv_lane_runner([c[0] for c in cfgs], [c[1] for c in cfgs],
                                  a.chunk, 1e-30, 10)
        state = FVState(u=z((B, n, n), jnp.float32),
                        v=z((B, n, n), jnp.float32),
                        p=z((B, n, n), jnp.float32),
                        mx=z((B, n, n - 1), jnp.float32),
                        my=z((B, n - 1, n), jnp.float32))
        call = lambda s, it: run(s, jnp.int32(it))[0]
    else:
        from anap3_tpu.ops.pallas_fv import make_pallas_fv_chunk_runner
        run = make_pallas_fv_chunk_runner(cfgs[0][0], cfgs[0][1], a.chunk,
                                          1e-30, 10)
        state = FVState(u=z((n, n), jnp.float32), v=z((n, n), jnp.float32),
                        p=z((n, n), jnp.float32),
                        mx=z((n, n - 1), jnp.float32),
                        my=z((n - 1, n), jnp.float32))
        call = lambda s, it: run(s, jnp.int32(it),
                                 jnp.float32(np.inf))[0]

    print(f"kind={a.kind} N={n} B={B} chunk={a.chunk} "
          f"sync_every={a.sync_every} device={jax.devices()[0]}", flush=True)
    t0 = time.time()
    state = call(state, 0)
    sync(state.u)
    print(f"compile+first chunk: {time.time() - t0:.1f}s", flush=True)
    it, n_chunks = a.chunk, 0
    t0 = time.time()
    while time.time() - t0 < a.seconds:
        state = call(state, it)
        it += a.chunk
        n_chunks += 1
        if n_chunks % a.sync_every == 0:
            sync(state.u)
    sync(state.u)
    wall = time.time() - t0
    rate = n_chunks * a.chunk / wall
    print(f"per-lane {rate:,.0f} SIMPLE it/s | aggregate {rate * B:,.0f} "
          f"lane-it/s | finite={bool(jnp.isfinite(state.u).all())}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="aligned",
                    choices=["aligned", "tiled", "lanes", "lanes-aligned",
                             "xla", "dots", "fv", "fv-lanes"])
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--re", type=float, default=1000.0)
    ap.add_argument("--corner", default="smoothing")
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--metrics-every", type=int, default=8)
    ap.add_argument("--alg", default="x3", choices=["x1", "x3", "x6"],
                    help="matmul algorithm (x1 = the single-bf16-pass "
                         "experiment; aligned kinds only)")
    ap.add_argument("--sync-every", type=int, default=4,
                    help="hard device sync every K chunks (bench headline uses 40x5000 steps)")
    a = ap.parse_args()

    if a.kind == "dots":
        dots_probe(a.n, max(a.seconds, 3.0))
        return

    if a.kind in ("fv", "fv-lanes"):
        fv_probe(a)
        return

    lanes = a.kind.startswith("lanes")
    B = a.b if lanes else 1
    if lanes:
        Res = np.linspace(400.0, 1100.0, B)
        pairs = [build(a.n, r, a.corner) for r in Res]
        ops_list = [p[0] for p in pairs]
        state = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[1] for p in pairs])
        if a.kind == "lanes-aligned":
            from anap3_tpu.ops.pallas_lanes_aligned import \
                make_aligned_lane_runner
            run = make_aligned_lane_runner(ops_list, a.chunk, 1e-12, 10,
                                           algorithm=a.alg,
                                           metrics_every=a.metrics_every)
        else:
            from anap3_tpu.ops.pallas_lanes import make_lane_chunk_runner
            run = make_lane_chunk_runner(ops_list, a.chunk, 1e-12, 10)
        call = lambda s, it: run(s, jnp.int32(it))[0]
    else:
        ops, state = build(a.n, a.re, a.corner)
        if a.kind == "aligned":
            from anap3_tpu.ops.pallas_aligned import \
                make_aligned_chunk_runner
            run = make_aligned_chunk_runner(ops, a.chunk, 1e-12, 10,
                                            algorithm=a.alg,
                                            metrics_every=a.metrics_every)
        elif a.kind == "tiled":
            from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
            run = make_tiled_chunk_runner(ops, a.chunk, 1e-12, 10,
                                          metrics_every=a.metrics_every)
        else:  # xla
            @jax.jit
            def run(s, it, ref):
                def body(st, _):
                    st, _m = core.sg_step(ops, st)
                    return st, ()
                s, _ = jax.lax.scan(body, s, None, length=a.chunk)
                return (s,)
        call = lambda s, it: run(s, jnp.int32(it), jnp.float32(np.inf))[0]

    print(f"kind={a.kind} N={a.n} B={B} chunk={a.chunk} "
          f"metrics_every={a.metrics_every} sync_every={a.sync_every} "
          f"device={jax.devices()[0]}",
          flush=True)
    t0 = time.time()
    state = call(state, 0)
    sync(state.u)
    print(f"compile+first chunk: {time.time() - t0:.1f}s", flush=True)
    it, n_chunks = a.chunk, 0
    t0 = time.time()
    while time.time() - t0 < a.seconds:
        state = call(state, it)
        it += a.chunk
        n_chunks += 1
        if n_chunks % a.sync_every == 0:
            sync(state.u)
    sync(state.u)
    wall = time.time() - t0
    rate = n_chunks * a.chunk / wall
    agg = rate * B
    print(f"per-lane {rate:,.0f} steps/s | aggregate {agg:,.0f} "
          f"lane-steps/s | finite={bool(jnp.isfinite(state.u).all())}",
          flush=True)


if __name__ == "__main__":
    main()
