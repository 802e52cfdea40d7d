"""TPU probe: bordered-core aligned chunk kernel vs the tiled kernel.

Usage: python scripts/dev/aligned_probe.py N chunk n_chunks [mode]
mode: both | aligned | tiled
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

N = int(sys.argv[1]); chunk = int(sys.argv[2]); n_chunks = int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "both"
m_every = 1 if N <= 192 else 8

p = SpectralParameters(Re=1000.0, nx=N, ny=N, dtype="float32")
ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
st0 = core.initial_state(ops)
print("device:", jax.devices()[0], f"N={N} chunk={chunk} m_every={m_every}")


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def bench(name, fn):
    t0 = time.time()
    s, done, conv, ever, rows, rn = fn(st0, jnp.int32(0), jnp.float32(np.inf))
    sync(s.u)
    print(f"{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    it = chunk
    for _ in range(n_chunks):
        s, done, conv, ever, rows, rn = fn(s, jnp.int32(it), rn)
        it += chunk
    chk = sync(s.u)
    wall = time.time() - t0
    steps = n_chunks * chunk
    print(f"{name}: {steps/wall:,.0f} steps/s  [checksum {chk:.6f}, "
          f"done={bool(done)}]")


if mode in ("both", "tiled"):
    from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
    bench("tiled-x3", make_tiled_chunk_runner(ops, chunk, 1e-8, 10,
                                              metrics_every=m_every))
if mode in ("both", "aligned"):
    from anap3_tpu.ops.pallas_aligned import make_aligned_chunk_runner
    bench("aligned-x3", make_aligned_chunk_runner(ops, chunk, 1e-8, 10,
                                                  metrics_every=m_every))
