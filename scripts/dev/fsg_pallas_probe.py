"""North-star with pallas-backed FSG: N=96 Re=1000 f32 tol 1e-6, timed."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from pathlib import Path
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models.spectral import FSGSolver
from anap3_tpu.ops import basis as B
import pandas as pd

p = SpectralParameters(name="spectral_fsg", Re=1000.0, nx=96, ny=96,
                       basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
                       corner_treatment="smoothing", corner_smoothing=0.15,
                       tolerance=1e-6, max_iterations=400000, multigrid="fsg",
                       n_levels=3, coarse_tolerance_factor=1.0,
                       dtype="float32", chunk_size=2000)
t0=time.time()
s = FSGSolver(params=p)
s.solve()
wall = time.time()-t0
print(f"FSG+pallas N=96 Re=1000 f32: iters={s.metrics.iterations} "
      f"converged={s.metrics.converged} wall={wall:.1f}s", flush=True)
ghia = pd.read_csv("/root/repo/data/validation/ghia/ghia_Re1000_u_centerline.csv")
xn = B.make_basis("chebyshev", (0.0, 1.0)).nodes(97)
xc = int(np.argmin(np.abs(xn - 0.5)))
u_c = B.spectral_interpolate(xn, np.asarray(s.state.u, float)[xc, :], ghia["y"].to_numpy())
print(f"  Ghia u max err: {np.max(np.abs(u_c - ghia['u'].to_numpy())):.4f}", flush=True)
