import sys, time
sys.path.insert(0, "/root/repo")
import jax
from pathlib import Path
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
x = jnp.ones((256, 256))
f = jax.jit(lambda a: jnp.tanh(a @ a) + 3.0)
t0=time.time(); f(x).block_until_ready(); print(f"small graph compile+run: {time.time()-t0:.2f}s", flush=True)
g = jax.jit(lambda a: jax.lax.scan(lambda c,_: (jnp.tanh(c @ c)*0.5 + c*0.5, ()), a, None, length=100)[0])
t0=time.time(); g(x).block_until_ready(); print(f"scan-100 graph compile+run: {time.time()-t0:.2f}s", flush=True)
