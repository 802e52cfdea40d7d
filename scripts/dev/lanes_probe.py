"""TPU probe: lane-batched chunk kernel throughput vs the B=1 tiled kernel.

Usage: python scripts/dev/lanes_probe.py [N] [B] [chunk] [n_chunks]
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
from anap3_tpu.ops.pallas_lanes import make_lane_chunk_runner

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
n_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 10

print("device:", jax.devices()[0])

Res = np.linspace(100.0, 1000.0, B)


def mk_ops(Re):
    p = SpectralParameters(Re=float(Re), nx=N, ny=N, dtype="float32")
    return core.build_spectral_ops(p, dtype=jnp.float32)[0]


ops_list = [mk_ops(Re) for Re in Res]
t0 = time.time()
fn = make_lane_chunk_runner(ops_list, chunk, 1e-8, 10)
states0 = [core.initial_state(o) for o in ops_list]
batched = jax.tree.map(lambda *a: jnp.stack(a), *states0)
s, done, conv, ever, rows = fn(batched, jnp.int32(0))
jax.block_until_ready(s.u)
print(f"compile+first chunk: {time.time()-t0:.1f}s")

t0 = time.time()
it = chunk
for k in range(n_chunks):
    s, done, conv, ever, rows = fn(s, jnp.int32(it))
    it += chunk
jax.block_until_ready(s.u)
wall = time.time() - t0
steps = n_chunks * chunk
print(f"N={N} B={B} chunk={chunk}: {steps} steps in {wall:.2f}s = "
      f"{steps/wall:,.0f} steps/s per lane batch, "
      f"{B*steps/wall:,.0f} aggregate lane-steps/s")
print("final u finite:", bool(jnp.all(jnp.isfinite(s.u))),
      "rows[last,0]:", np.asarray(rows)[-1, :, 0])
