"""North-star check: 128 concurrent sweep lanes on one chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.parallel import sweep as sweep_mod

B = 128
N = 32
res = np.linspace(100.0, 1000.0, B)
opses, states = [], []
t0 = time.time()
for Re in res:
    p = SpectralParameters(name="s", Re=float(Re), nx=N, ny=N,
                           basis_type="chebyshev", CFL=1.5,
                           corner_treatment="smoothing", corner_smoothing=0.15,
                           dtype="float32")
    ops, _ = core.build_spectral_ops(p)
    opses.append(ops)
    states.append(core.initial_state(ops))
batched_ops = sweep_mod.stack_ops(opses)
batched_states = jax.tree.map(lambda *a: jnp.stack(a), *states)
print(f"built {B} lanes in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
result = sweep_mod.run_batched_sweep(
    core.sg_step, lambda s: (s.u, s.v), batched_ops, batched_states,
    tolerance=1e-5, max_iterations=60000, chunk=1000)
wall = time.time() - t0
conv = int(result.converged.sum())
div = int(result.diverged.sum())
iters = result.iterations
total_steps = int(np.sum(iters)) 
print(f"{B}-lane sweep: {conv} converged, {div} diverged, wall={wall:.1f}s "
      f"(aggregate {total_steps} lane-steps -> {total_steps/wall:.0f} lane-steps/s)",
      flush=True)
print(f"iterations: min={iters.min()} median={int(np.median(iters))} max={iters.max()}", flush=True)
# physics spot check: lane 0 (Re=100) primary vortex
u0 = np.asarray(result.states.u[0])
print("lane0 finite:", bool(np.isfinite(u0).all()), "max|u|:", float(np.abs(u0).max()), flush=True)
