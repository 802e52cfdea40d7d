import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_chunk import make_pallas_chunk_runner

N = 128
CH = 500
p = SpectralParameters(name="s", Re=1000, nx=N, ny=N, basis_type="chebyshev",
                       CFL=1.5, corner_treatment="smoothing", dtype="float32")
ops, _ = core.build_spectral_ops(p)
state = core.initial_state(ops)
runner = make_pallas_chunk_runner(ops, CH, 1e-12, 10)
ref = jnp.asarray(jnp.inf, jnp.float32)

t0=time.time()
s, d, c, cv, rows, _ = runner(state, jnp.int32(0), ref)
jax.block_until_ready(s.u)
print(f"chunk-kernel compile={time.time()-t0:.1f}s", flush=True)
t0=time.time(); n=0; it=CH
while time.time()-t0 < 6.0:
    s, d, c, cv, rows, _ = runner(s, jnp.int32(it), ref)
    it += CH; n += 1
    if n % 4 == 0: jax.block_until_ready(s.u)
jax.block_until_ready(s.u)
rate = n*CH/(time.time()-t0)
print(f"in-kernel chunk rate={rate:.0f} steps/s finite={bool(jnp.isfinite(s.u).all())}", flush=True)
r = np.asarray(rows)
print("last rel:", r[-1,0], flush=True)
