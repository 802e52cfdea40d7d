"""TPU probe: sharp-lid singular mode at production scale.

Usage: python scripts/dev/singular_tpu.py [solver] [N] [Re] [tol] [maxit]
solver: sg | fsg | vmg
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import pandas as pd

from anap3_tpu.models.spectral import SGSolver, FSGSolver

solver = sys.argv[1] if len(sys.argv) > 1 else "fsg"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 96
Re = float(sys.argv[3]) if len(sys.argv) > 3 else 1000.0
tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-6
maxit = int(sys.argv[5]) if len(sys.argv) > 5 else 4_000_000

if solver == "vmg":
    from anap3_tpu.models.spectral_vmg import VMGSolver as CLS
else:
    CLS = {"sg": SGSolver, "fsg": FSGSolver}[solver]

s = CLS(Re=Re, nx=N, ny=N, tolerance=tol, max_iterations=maxit,
        dtype="float32", corner_treatment="singular", chunk_size=2000,
        convergence_metric="energy")
t0 = time.time()
s.solve()
wall = time.time() - t0
print(f"[{solver} N={N} Re={Re:g}] iters={s.metrics.iterations} "
      f"conv={s.metrics.converged} wall={wall:.1f}s "
      f"E={s.metrics.final_energy:.6f}", flush=True)

errs = s.compute_validation_errors(save_plots=False)
for k in sorted(errs):
    print(f"  {k} = {errs[k]:.4e}", flush=True)

vort = s.compute_vortex_metrics()
print(f"  psi_min={vort['psi_min']:.7f} at ({vort['psi_min_x']:.4f},"
      f"{vort['psi_min_y']:.4f}) omega_center={vort['omega_center']:.6f}",
      flush=True)
print(f"  BL psi={vort['psi_BL']:.3e} BR psi={vort['psi_BR']:.3e}",
      flush=True)

rows = s.validation_table()
if rows:
    for r in rows:
        print("  botella", r, flush=True)

# Ghia centerlines through the decomposition-aware point evaluator
gd = Path("/root/repo/data/validation/ghia")
for comp in ("u", "v"):
    csv = gd / f"ghia_Re{int(Re)}_{comp}_centerline.csv"
    if not csv.exists():
        continue
    tab = pd.read_csv(csv)
    coord = "y" if comp == "u" else "x"
    pts = tab[coord].to_numpy()
    itr = (pts > 1e-6) & (pts < 1 - 1e-6)
    if comp == "u":
        uu, vv = s._evaluate_at_points(np.full_like(pts, 0.5), pts)
        vals = uu
    else:
        uu, vv = s._evaluate_at_points(pts, np.full_like(pts, 0.5))
        vals = vv
    err = np.max(np.abs(vals - tab[comp].to_numpy())[itr])
    print(f"  ghia_{comp}_err = {err:.4f}", flush=True)
