"""Stretch config: spectral N=256 Re=10000 (saad lid) — throughput + stability."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core

p = SpectralParameters(name="s", Re=10000.0, nx=256, ny=256,
                       basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
                       corner_treatment="saad", dtype="float32")
ops, _ = core.build_spectral_ops(p)
state = core.initial_state(ops)
def step(s):
    return core.sg_step(ops, s)

@jax.jit
def run(s):
    def body(s, _):
        s, _m = step(s)
        return s, ()
    s, _ = jax.lax.scan(body, s, None, length=50)
    return s

t0=time.time(); s = run(state); jax.block_until_ready(s.u)
print(f"N=256 compile={time.time()-t0:.1f}s", flush=True)
t0=time.time(); n=0
while time.time()-t0 < 5.0:
    s = run(s); n += 1
    if n % 20 == 0: jax.block_until_ready(s.u)
jax.block_until_ready(s.u)
print(f"N=256 rate={n*50/(time.time()-t0):.0f} steps/s", flush=True)
# stability over 20k more steps
for _ in range(400):
    s = run(s)
jax.block_until_ready(s.u)
print(f"after ~{n*50+20000} steps: finite={bool(jnp.isfinite(s.u).all())} "
      f"max|u|={float(jnp.abs(s.u).max()):.3f}", flush=True)
