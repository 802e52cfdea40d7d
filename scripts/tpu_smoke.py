"""Driver-runnable TPU self-verification (VERDICT r2 #8).

One command, asserts, exits nonzero on drift:

    python scripts/tpu_smoke.py            # full check (~3-6 min warm cache)
    python scripts/tpu_smoke.py --fast     # kernel parity only (~1 min)

Checks, on the real device:
1. fused tiled x3 chunk kernel vs the XLA sg_step path: 50 steps from the
   cold start at N=64 agree to x3 tolerance (state + conserved quantities);
2. the bordered-core aligned kernel matches the tiled kernel at N=128;
3. (full) FSG N=96 Re=1000 f32 smoothed, energy criterion: converges, lands
   at the recorded smoothed-lid L2 floor vs the stored sharp-lid FV truth
   (0.099/0.075 +- 10%) — the round-2/3 recorded production result.

Run from the repo root. The pytest wrapper (tests/test_tpu_smoke.py) invokes
this in a subprocess because tests/conftest.py pins the local CPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def check(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
    if not ok:
        sys.exit(1)


def main():
    fast = "--fast" in sys.argv
    backend = jax.default_backend()
    check("tpu backend", backend == "tpu", f"(got {backend})")

    from anap3_tpu.models.params import SpectralParameters
    from anap3_tpu.models import spectral_sg as core
    from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner

    # 1: tiled chunk kernel vs XLA step, N=64, 50 steps
    p = SpectralParameters(Re=1000.0, nx=64, ny=64, dtype="float32")
    ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
    st = core.initial_state(ops)
    runner = make_tiled_chunk_runner(ops, 50, 1e-30, 10)
    t0 = time.time()
    ks, done, conv, cv, rows, _ = runner(st, jnp.int32(0),
                                         jnp.float32(np.inf))
    xs = st
    step = jax.jit(lambda s: core.sg_step(ops, s))
    for _ in range(50):
        xs, m = step(xs)
    du = float(jnp.max(jnp.abs(ks.u - xs.u)))
    dv = float(jnp.max(jnp.abs(ks.v - xs.v)))
    e_k = float(np.asarray(rows)[-1, 4])
    e_x = float(m["energy"])
    check("tiled-x3 vs XLA state", du < 5e-4 and dv < 5e-4,
          f"max|du|={du:.2e} max|dv|={dv:.2e} ({time.time()-t0:.0f}s)")
    check("tiled-x3 vs XLA energy", abs(e_k - e_x) < 5e-5 * max(abs(e_x), 1),
          f"E_kernel={e_k:.6f} E_xla={e_x:.6f}")

    # 2: aligned kernel vs tiled kernel, N=128, one 50-step chunk
    from anap3_tpu.ops.pallas_aligned import make_aligned_chunk_runner

    p = SpectralParameters(Re=1000.0, nx=128, ny=128, dtype="float32")
    ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
    st = core.initial_state(ops)
    tr = make_tiled_chunk_runner(ops, 50, 1e-30, 10)
    ar = make_aligned_chunk_runner(ops, 50, 1e-30, 10)
    ts_, *_t = tr(st, jnp.int32(0), jnp.float32(np.inf))
    as_, *_a = ar(st, jnp.int32(0), jnp.float32(np.inf))
    du = float(jnp.max(jnp.abs(ts_.u - as_.u)))
    check("aligned vs tiled state (N=128)", du < 5e-4, f"max|du|={du:.2e}")

    if fast:
        print("OK (fast)", flush=True)
        return

    # 3: FAS-forced (with_tau) kernel at N=320 — the raised-vmem tier
    # (pallas_tiled vmem_limit_bytes; VERDICT r2 #7) — 3-step parity vs
    # the XLA sg_step tau hook
    from anap3_tpu.ops.pallas_tiled import make_tiled_sg_step

    p = SpectralParameters(Re=1000.0, nx=320, ny=320, dtype="float32")
    ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    st = core.SpectralState(
        u=jnp.asarray(0.01 * rng.standard_normal((321, 321)), jnp.float32),
        v=jnp.asarray(0.01 * rng.standard_normal((321, 321)), jnp.float32),
        p=jnp.asarray(0.01 * rng.standard_normal((319, 319)), jnp.float32))
    tau = tuple(jnp.asarray(1e-3 * rng.standard_normal(sh), jnp.float32)
                for sh in ((321, 321), (321, 321), (319, 319)))
    tstep = make_tiled_sg_step(ops, algorithm="x6", with_tau=True, blk=32)
    xstep = jax.jit(lambda s, t: core.sg_step(ops, s, tau=t))
    sf = sx = st
    for _ in range(3):
        sf, _mf = tstep(sf, tau)
        sx, _mx = xstep(sx, tau)
    du = float(jnp.max(jnp.abs(sf.u - sx.u)))
    check("tau-320 kernel vs XLA (x6)", du < 1e-6, f"max|du|={du:.2e}")

    # 4: production FSG solve reaches the recorded smoothed-lid floor
    from anap3_tpu.models.spectral import FSGSolver

    s = FSGSolver(Re=1000.0, nx=96, ny=96, tolerance=1e-6,
                  max_iterations=4_000_000, dtype="float32",
                  convergence_metric="energy", chunk_size=2000)
    t0 = time.time()
    s.solve()
    check("FSG N=96 Re=1000 converges", bool(s.metrics.converged),
          f"{s.metrics.iterations} iters, {time.time()-t0:.0f}s")
    errs = s.compute_validation_errors(save_plots=False)
    u_err, v_err = errs["u_L2_error"], errs["v_L2_error"]
    # recorded smoothed-lid floor: 0.0989/0.0749 (STATUS.md solver-study r3)
    check("smoothed-lid L2 floor", abs(u_err - 0.099) < 0.012
          and abs(v_err - 0.075) < 0.012,
          f"u={u_err:.4f} v={v_err:.4f} (recorded 0.099/0.075)")
    print("OK", flush=True)


if __name__ == "__main__":
    main()
