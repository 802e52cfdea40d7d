"""TPU probe: lane-batched kernel vs the vmapped XLA sweep path.

Usage: python scripts/dev/lanes_vs_vmap.py N B chunk n_chunks [mode]
mode: both | lanes | vmap
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
from anap3_tpu.parallel.sweep import make_batched_chunk_runner, stack_ops

N = int(sys.argv[1])
B = int(sys.argv[2])
chunk = int(sys.argv[3])
n_chunks = int(sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "both"

print("device:", jax.devices()[0], f"N={N} B={B} chunk={chunk}")

Res = np.linspace(100.0, 1000.0, B)


def mk_ops(Re):
    p = SpectralParameters(Re=float(Re), nx=N, ny=N, dtype="float32")
    return core.build_spectral_ops(p, dtype=jnp.float32)[0]


ops_list = [mk_ops(Re) for Re in Res]
states0 = [core.initial_state(o) for o in ops_list]
batched0 = jax.tree.map(lambda *a: jnp.stack(a), *states0)


def sync(x):
    # hard sync via host transfer: on this image's remote-TPU platform,
    # block_until_ready can return before queued work completes, which
    # fabricates throughput numbers — a device->host copy cannot lie
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def bench(name, call, s0):
    t0 = time.time()
    out = call(s0, 0)
    sync(out[0].u)
    print(f"{name}: compile+first {time.time()-t0:.1f}s")
    s = out[0]
    t0 = time.time()
    it = chunk
    for _ in range(n_chunks):
        out = call(s, it)
        s = out[0]
        it += chunk
    chk = sync(s.u)
    wall = time.time() - t0
    steps = n_chunks * chunk
    print(f"{name}: {B*steps/wall:,.0f} aggregate lane-steps/s "
          f"({steps/wall:,.0f} batch-steps/s) [checksum {chk:.6f}, "
          f"done={np.asarray(out[1]).sum()}]")


if mode in ("both", "vmap"):
    runner = make_batched_chunk_runner(core.sg_step, lambda s: (s.u, s.v),
                                       chunk, 1e-8, 10)
    sops = stack_ops(ops_list)
    bench("vmap-xla", lambda s, it: runner(sops, s, jnp.asarray(it, jnp.int32)),
          batched0)

if mode in ("both", "lanes"):
    from anap3_tpu.ops.pallas_lanes import make_lane_chunk_runner

    fn = make_lane_chunk_runner(ops_list, chunk, 1e-8, 10)
    bench("lane-kernel", lambda s, it: fn(s, jnp.asarray(it, jnp.int32)),
          batched0)
