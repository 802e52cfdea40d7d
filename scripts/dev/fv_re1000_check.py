"""FV N=128 Re=1000 truth comparison (stretch validation evidence)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from anap3_tpu.models.params import FVParameters
from anap3_tpu.models.fv import FVSolver

p = FVParameters(name="fv", Re=1000, nx=128, ny=128, convection_scheme="TVD",
                 limiter="MUSCL", alpha_uv=0.4, alpha_p=0.2,
                 linear_solver_tol=1e-9, tolerance=1e-6, max_iterations=200000,
                 corner_treatment="none", dtype="float64", chunk_size=100)
t0=time.time()
s = FVSolver(params=p)
s.solve()
print(f"FV N=128 Re=1000: iters={s.metrics.iterations} converged={s.metrics.converged} "
      f"wall={time.time()-t0:.0f}s", flush=True)
errs = s.compute_validation_errors(base_dir="/root/repo", save_plots=False)
print("L2 vs stored truth:", errs, flush=True)
print(f"psi_min={s.metrics.psi_min:.6f} @ ({s.metrics.psi_min_x:.4f},{s.metrics.psi_min_y:.4f}) "
      f"[Botella: -0.1189 @ (0.4692,0.5652)]", flush=True)
import pandas as pd
ghia = pd.read_csv("/root/repo/data/validation/ghia/ghia_Re1000_u_centerline.csv")
u_c, _ = s._evaluate_at_points(np.full(len(ghia), 0.5), ghia["y"].to_numpy())
m = ~np.isnan(u_c)
print("Ghia u max err:", float(np.max(np.abs(u_c[m] - ghia["u"].to_numpy()[m]))), flush=True)
