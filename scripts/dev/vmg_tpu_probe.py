import sys, time
sys.path.insert(0, "/root/repo")
import jax
from pathlib import Path
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models.spectral_vmg import VMGSolver
from anap3_tpu.ops import basis as B
import pandas as pd

p = SpectralParameters(name="spectral_vmg", Re=1000.0, nx=96, ny=96,
                       basis_type="chebyshev", CFL=1.5, beta_squared=5.0,
                       corner_treatment="smoothing", corner_smoothing=0.15,
                       tolerance=1e-8, max_iterations=400000, n_levels=3,
                       dtype="float32", chunk_size=400)
t0=time.time()
s = VMGSolver(params=p)
t_build = time.time()-t0
t0=time.time()
s.solve()
wall = time.time()-t0
print(f"VMG N=96 Re=1000 f32: cycles={s.metrics.iterations} converged={s.metrics.converged} "
      f"build={t_build:.1f}s solve={wall:.1f}s (metric wall {s.metrics.wall_time_seconds:.1f}s)", flush=True)
ghia = pd.read_csv("/root/repo/data/validation/ghia/ghia_Re1000_u_centerline.csv")
xn = B.make_basis("chebyshev", (0.0, 1.0)).nodes(97)
xc = int(np.argmin(np.abs(xn - 0.5)))
u_c = B.spectral_interpolate(xn, np.asarray(s.state.u, float)[xc, :], ghia["y"].to_numpy())
print(f"  Ghia u max err: {np.max(np.abs(u_c - ghia['u'].to_numpy())):.4f}", flush=True)
print(f"  psi_min={s.metrics.psi_min:.6f} at ({s.metrics.psi_min_x:.4f},{s.metrics.psi_min_y:.4f})", flush=True)
