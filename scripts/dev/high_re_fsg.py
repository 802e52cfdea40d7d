"""High-Re Ghia validation probe: FSG + residual metric on the fused tier.

Round-2 negative result (STATUS.md): rel-iter false-converges at Re>=5000
f32, and plain SG with residual metric ran out of a 12M-step budget at
N=256 Re=5000 (reached max Ghia err 0.084). This probe runs the FSG
cascade with convergence_metric=residual so the slow physics settle on the
cheap coarse level first.

Usage: python scripts/dev/high_re_fsg.py [Re] [N] [max_iters] [tol]
"""
import logging
import sys, time
sys.path.insert(0, "/root/repo")
from pathlib import Path
import jax
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import pandas as pd

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models.spectral import FSGSolver
from anap3_tpu.ops import basis as B

logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                    format="%(asctime)s %(name)s %(message)s")

Re = float(sys.argv[1]) if len(sys.argv) > 1 else 5000.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000_000
tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-5

p = SpectralParameters(
    name="spectral_fsg", Re=Re, nx=N, ny=N, basis_type="chebyshev",
    CFL=1.5, beta_squared=5.0, corner_treatment="smoothing",
    corner_smoothing=0.15, tolerance=tol, max_iterations=max_iters,
    multigrid="fsg", n_levels=10, coarse_tolerance_factor=1.0,
    dtype="float32", chunk_size=5000, convergence_metric="residual",
    stall_chunks=40)

t0 = time.time()
s = FSGSolver(params=p)
s.solve()
wall = time.time() - t0
print(f"Re={Re:g} N={N}: iters={s.metrics.iterations} "
      f"converged={s.metrics.converged} wall={wall:.1f}s "
      f"energy={s.metrics.final_energy:.6f}",
      flush=True)

bx = B.make_basis("chebyshev", (0.0, 1.0))
xn = bx.nodes(N + 1)
xc = int(np.argmin(np.abs(xn - 0.5)))
u = np.asarray(s.state.u, float)
v = np.asarray(s.state.v, float)
for comp, field in (("u", u[xc, :]), ("v", v[:, xc])):
    csv = Path(f"/root/repo/data/validation/ghia/ghia_Re{int(Re)}_{comp}_centerline.csv")
    if not csv.exists():
        print(f"  no Ghia data for Re={Re:g} {comp}")
        continue
    tab = pd.read_csv(csv)
    coord = "y" if comp == "u" else "x"
    pts = tab[coord].to_numpy()
    interior = (pts > 1e-6) & (pts < 1 - 1e-6)
    vals = B.spectral_interpolate(xn, field, pts)
    err = np.max(np.abs(vals - tab[comp].to_numpy())[interior])
    print(f"  Ghia {comp}-centerline max interior err: {err:.4f}", flush=True)
