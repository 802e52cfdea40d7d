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

def bench(step_fn, label, chunk=50):
    @jax.jit
    def run(s):
        def body(s, _):
            s, _m = step_fn(s)
            return s, ()
        s, _ = jax.lax.scan(body, s, None, length=chunk)
        return s
    s = state
    t0 = time.time(); s = run(s); jax.block_until_ready(s.u)
    compile_s = time.time()-t0
    t0 = time.time(); n = 0
    while time.time()-t0 < 5.0:
        s = run(s); n += 1
        if n % 40 == 0: jax.block_until_ready(s.u)
    jax.block_until_ready(s.u)
    rate = n*chunk/(time.time()-t0)
    print(f"{label}: compile={compile_s:.1f}s rate={rate:.0f} steps/s "
          f"finite={bool(jnp.isfinite(s.u).all())}", flush=True)
    return s

s_x = bench(lambda s: core.sg_step(ops, s), "XLA step")
pstep = make_pallas_sg_step(ops)
s_p = bench(pstep, "Pallas fused step")
# numerical agreement after 50 steps from same init
@jax.jit
def run50(s, fn_id):
    return s
s1 = state; s2 = state
for _ in range(50):
    s1, _ = core.sg_step(ops, s1)
    s2, _ = pstep(s2)
print("max|du| after 50 steps:", float(jnp.max(jnp.abs(s1.u - s2.u))), flush=True)
