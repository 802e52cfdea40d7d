"""CPU probe: sharp-lid singular subtraction vs smoothed lid, small N.

Usage: python scripts/dev/singular_probe.py [N] [Re] [tol] [solver]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from anap3_tpu.models.spectral import SGSolver, FSGSolver  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
Re = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-6
cls = {"sg": SGSolver, "fsg": FSGSolver}[
    sys.argv[4] if len(sys.argv) > 4 else "sg"]

for treatment in ("smoothing", "singular"):
    s = cls(Re=Re, nx=N, ny=N, tolerance=tol, max_iterations=400_000,
            dtype="float64", corner_treatment=treatment, chunk_size=2000)
    s.solve()
    errs = s.compute_validation_errors(save_plots=False)
    vort = s.compute_vortex_metrics()
    print(f"[{treatment:9s}] iters={s.metrics.iterations} "
          f"conv={s.metrics.converged} E={s.metrics.final_energy:.6f}")
    print(f"  L2 vs fv truth: u={errs.get('u_L2_error', float('nan')):.4e} "
          f"v={errs.get('v_L2_error', float('nan')):.4e}")
    print(f"  psi_min={vort['psi_min']:.7f} at ({vort['psi_min_x']:.4f},"
          f"{vort['psi_min_y']:.4f}) omega_c={vort['omega_center']:.5f}")
