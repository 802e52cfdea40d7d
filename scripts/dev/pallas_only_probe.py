import sys, time
sys.path.insert(0, "/root/repo")
import jax
from pathlib import Path
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_step import make_pallas_sg_step

N = 128
p = SpectralParameters(name="s", Re=1000, nx=N, ny=N, basis_type="chebyshev",
                       CFL=1.5, corner_treatment="smoothing", dtype="float32")
ops, _ = core.build_spectral_ops(p)
state = core.initial_state(ops)
pstep = make_pallas_sg_step(ops)


@jax.jit
def run(s):
    def body(s, _):
        s, _m = pstep(s)
        return s, ()
    s, _ = jax.lax.scan(body, s, None, length=50)
    return s


t0 = time.time(); s = run(state); jax.block_until_ready(s.u)
print(f"compile={time.time()-t0:.1f}s", flush=True)
t0 = time.time(); n = 0
while time.time() - t0 < 5.0:
    s = run(s); n += 1
    if n % 40 == 0:
        jax.block_until_ready(s.u)
jax.block_until_ready(s.u)
print(f"rate={n*50/(time.time()-t0):.0f} steps/s "
      f"finite={bool(jnp.isfinite(s.u).all())}", flush=True)

# accuracy vs per-step-jitted XLA over 50 steps (no big scan compile)
s1 = state; s2 = state
xstep = jax.jit(lambda s: core.sg_step(ops, s)[0])
for _ in range(50):
    s1 = xstep(s1)
    s2, _ = pstep(s2)
print("max|du| after 50 steps:", float(jnp.max(jnp.abs(s1.u - s2.u))),
      flush=True)
