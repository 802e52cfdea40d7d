"""Probe: the FAS-forced (with_tau) fused kernel at N=320 on the TPU.

Round-2/3 blocker for VERDICT #7: the x6+tau kernel at N=320 needs a
~46 MB Mosaic stack, over the default ~16 MB scoped-vmem ceiling. The fix
raises the per-kernel vmem_limit_bytes (pallas_tiled.make_tiled_sg_step).
This probe (a) compiles the kernel, (b) checks 3-step parity against the
XLA sg_step tau hook, (c) times steady-state throughput.

Usage: python scripts/dev/tau320_probe.py [N]
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
from anap3_tpu.models.spectral_sg import (SpectralState, build_spectral_ops,
                                          sg_step)
from anap3_tpu.ops.pallas_tiled import make_tiled_sg_step

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320
params = SpectralParameters(Re=1000.0, nx=N, ny=N, dtype="float32")
ops, _grid = build_spectral_ops(params)

rng = np.random.default_rng(0)
nf, ni = N + 1, N - 1
state = SpectralState(
    u=jnp.asarray(0.01 * rng.standard_normal((nf, nf)), jnp.float32),
    v=jnp.asarray(0.01 * rng.standard_normal((nf, nf)), jnp.float32),
    p=jnp.asarray(0.01 * rng.standard_normal((ni, ni)), jnp.float32))
tau = (jnp.asarray(1e-3 * rng.standard_normal((nf, nf)), jnp.float32),
       jnp.asarray(1e-3 * rng.standard_normal((nf, nf)), jnp.float32),
       jnp.asarray(1e-3 * rng.standard_normal((ni, ni)), jnp.float32))

step = make_tiled_sg_step(ops, algorithm="x6", with_tau=True, blk=32)
t0 = time.time()
out, m = jax.block_until_ready(step(state, tau))
print(f"[tau{N}] first call (compile) {time.time() - t0:.1f}s", flush=True)

ref_step = jax.jit(lambda s, t: sg_step(ops, s, tau=t))
ref, mr = jax.block_until_ready(ref_step(state, tau))
cur_f, cur_x = out, ref
for _ in range(2):
    cur_f, m = step(cur_f, tau)
    cur_x, mr = ref_step(cur_x, tau)
du = float(jnp.max(jnp.abs(cur_f.u - cur_x.u)))
dv = float(jnp.max(jnp.abs(cur_f.v - cur_x.v)))
dp = float(jnp.max(jnp.abs(cur_f.p - cur_x.p)))
print(f"[tau{N}] 3-step parity vs XLA: du={du:.2e} dv={dv:.2e} dp={dp:.2e}",
      flush=True)

jax.block_until_ready(cur_f)
t0 = time.time()
s = cur_f
for _ in range(200):
    s, m = step(s, tau)
jax.block_until_ready(s)
rate = 200 / (time.time() - t0)
print(f"[tau{N}] fused tau steps/s: {rate:.0f}", flush=True)
assert du < 1e-4 and dv < 1e-4 and dp < 1e-4, "parity failure"
print("OK", flush=True)
