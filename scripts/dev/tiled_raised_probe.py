"""Probe the raised-VMEM tiled tier above N=320 (N=384/448) on the TPU.

Validates (a) compile under the raised vmem_limit_bytes, (b) 20-step parity
vs the XLA sg_step path, (c) chunk-kernel throughput at production chunk
sizes.

Usage: python scripts/dev/tiled_raised_probe.py [N ...] (default 384 448)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner

sizes = [int(a) for a in sys.argv[1:]] or [384, 448]

for N in sizes:
    p = SpectralParameters(Re=1000.0, nx=N, ny=N, dtype="float32")
    ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
    st = core.initial_state(ops)

    runner = make_tiled_chunk_runner(ops, 20, 1e-30, 10)
    t0 = time.time()
    ks, done, conv, cv, rows, _ = jax.block_until_ready(
        runner(st, jnp.int32(0), jnp.float32(np.inf)))
    print(f"[N={N}] 20-step chunk compile+run {time.time()-t0:.1f}s",
          flush=True)

    xs = st
    step = jax.jit(lambda s: core.sg_step(ops, s))
    for _ in range(20):
        xs, m = step(xs)
    du = float(jnp.max(jnp.abs(ks.u - xs.u)))
    dv = float(jnp.max(jnp.abs(ks.v - xs.v)))
    e_k = float(np.asarray(rows)[-1, 4])
    e_x = float(m["energy"])
    print(f"[N={N}] parity vs XLA: du={du:.2e} dv={dv:.2e} "
          f"E {e_k:.6f} vs {e_x:.6f}", flush=True)
    ok = du < 5e-4 and dv < 5e-4

    ch = 500
    runner = make_tiled_chunk_runner(ops, ch, 1e-30, 10, metrics_every=8)
    s = ks
    t0 = time.time()
    s, *_ = jax.block_until_ready(runner(s, jnp.int32(0), jnp.float32(np.inf)))
    print(f"[N={N}] chunk-500 first call {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        s, *_ = runner(s, jnp.int32(0), jnp.float32(np.inf))
    jax.block_until_ready(s)
    rate = reps * ch / (time.time() - t0)
    # XLA fallback rate for comparison
    xs = jax.block_until_ready(xs)
    t0 = time.time()
    for _ in range(100):
        xs, m = step(xs)
    jax.block_until_ready(xs)
    xrate = 100 / (time.time() - t0)
    print(f"[N={N}] tiled chunk steps/s: {rate:.0f}  (XLA step: {xrate:.0f})"
          f"  {'OK' if ok else 'PARITY FAIL'}", flush=True)
