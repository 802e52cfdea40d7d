"""Measure tiled-chunk-kernel steps/s across N on the attached TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from pathlib import Path
import jax
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner

for N in (24, 48, 96, 128, 192, 256, 320):
    p = SpectralParameters(name="spectral", Re=1000.0, nx=N, ny=N,
                           basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
                           corner_treatment="smoothing", corner_smoothing=0.15,
                           dtype="float32")
    ops, _ = core.build_spectral_ops(p)
    state = core.initial_state(ops)
    CH = 500
    m_every = 1 if N <= 192 else 8
    runner = make_tiled_chunk_runner(ops, CH, 1e-12, 10, algorithm="x3",
                                     metrics_every=m_every)
    ref = jnp.asarray(jnp.inf, jnp.float32)
    t0 = time.time()
    state, *_ = runner(state, jnp.int32(0), ref)
    jax.block_until_ready(state.u)
    compile_s = time.time() - t0
    n_calls, it = 0, CH
    t0 = time.time()
    while time.time() - t0 < 5.0:
        state, *_ = runner(state, jnp.int32(it), ref)
        it += CH
        n_calls += 1
        if n_calls % 20 == 0:
            jax.block_until_ready(state.u)
    jax.block_until_ready(state.u)
    rate = n_calls * CH / (time.time() - t0)
    print(f"N={N}: {rate/1000:.1f}k steps/s (compile {compile_s:.1f}s, "
          f"metrics_every={m_every})", flush=True)
