import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core

p = SpectralParameters(name="spectral", Re=1000.0, nx=128, ny=128,
                       basis_type="chebyshev", CFL=1.5, corner_treatment="smoothing",
                       dtype="float32")
t0=time.time()
ops, _ = core.build_spectral_ops(p)
state = core.initial_state(ops)
print("ops built", time.time()-t0, flush=True)

step = jax.jit(lambda s: core.sg_step(ops, s)[0])
t0=time.time(); state = step(state); jax.block_until_ready(state.u)
print("single-step compile+run:", time.time()-t0, flush=True)
t0=time.time()
for _ in range(100): state = step(state)
jax.block_until_ready(state.u)
dt=time.time()-t0
print(f"100 dispatched steps: {dt:.3f}s -> {100/dt:.0f} steps/s", flush=True)

@jax.jit
def chunk50(s):
    def body(s, _):
        return core.sg_step(ops, s)[0], ()
    s, _ = jax.lax.scan(body, s, None, length=50)
    return s
t0=time.time(); state = chunk50(state); jax.block_until_ready(state.u)
print("scan-50 compile+run:", time.time()-t0, flush=True)
t0=time.time()
for _ in range(10): state = chunk50(state)
jax.block_until_ready(state.u)
dt=time.time()-t0
print(f"500 scanned steps: {dt:.3f}s -> {500/dt:.0f} steps/s", flush=True)
print("finite:", bool(jnp.isfinite(state.u).all()), flush=True)
