"""On-device check of the aligned kernel's singular mode vs the tiled kernel.

Usage: python scripts/dev/aligned_singular_probe.py [N] [steps]
Compares state + metric rows after one chunk, then times both runners.
Rates measured while other TPU work is running are labeled as such.
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
from anap3_tpu.ops.pallas_aligned import make_aligned_chunk_runner

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
CH = 500

p = SpectralParameters(Re=1000.0, nx=N, ny=N, dtype="float32",
                       corner_treatment="singular")
ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)
st = core.initial_state(ops)
m_every = 1 if N <= 192 else 8

t0 = time.time()
ali = make_aligned_chunk_runner(ops, CH, 1e-30, 10, metrics_every=m_every)
as_, adone, _, _, arows, _ = jax.block_until_ready(
    ali(st, jnp.int32(0), jnp.float32(np.inf)))
print(f"N={N} aligned-singular compile+1st chunk: {time.time()-t0:.1f}s",
      flush=True)

t0 = time.time()
tl = make_tiled_chunk_runner(ops, CH, 1e-30, 10, metrics_every=m_every)
rs, rdone, _, _, rrows, _ = jax.block_until_ready(
    tl(st, jnp.int32(0), jnp.float32(np.inf)))
print(f"N={N} tiled-singular compile+1st chunk: {time.time()-t0:.1f}s",
      flush=True)

for name, a, r in (("u", as_.u, rs.u), ("v", as_.v, rs.v),
                   ("p", as_.p, rs.p)):
    print(f"  {name}: maxabs {float(jnp.max(jnp.abs(a - r))):.3e}")
A, R = np.asarray(arows), np.asarray(rrows)
rel = np.max(np.abs(A - R) / (np.abs(R) + 1e-30))
print(f"  rows max rel diff over {CH} steps: {rel:.3e}")

for label, runner in (("aligned", ali), ("tiled", tl)):
    s, it = st, 0
    rn = jnp.float32(np.inf)
    t0 = time.time()
    while it < STEPS:
        s, done, conv, cv, rows, rn = runner(s, jnp.int32(it), rn)
        it += CH
    jax.block_until_ready(s.u)
    dt = time.time() - t0
    print(f"N={N} {label}-singular: {it} steps in {dt:.1f}s = "
          f"{it/dt:,.0f} steps/s", flush=True)
