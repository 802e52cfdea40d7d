"""Diagnose the VMG [320,160] Re=1000 stall at energy~0.0301 (L2 0.25).

Runs a FIXED cycle budget (tolerance 0 disables the plateau exit except
divergence) and prints the recorded E(cycle) tail so we can tell a broad
spin-up shoulder (criterion firing early -> scale the plateau window) from
a genuine FAS stall (bias -> hierarchy/NU_COARSE work).

Usage: python scripts/dev/vmg320_diag.py [N] [n_levels] [max_cycles*4]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from anap3_tpu.models.spectral_vmg import VMGSolver

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320
n_levels = int(sys.argv[2]) if len(sys.argv) > 2 else 2
maxit = int(sys.argv[3]) if len(sys.argv) > 3 else 1_600_000

s = VMGSolver(Re=1000.0, nx=N, ny=N, tolerance=0.0,
              max_iterations=maxit, dtype="float32", chunk_size=2000,
              n_levels=n_levels, convergence_metric="rel_iter")
t0 = time.time()
s.solve()
wall = time.time() - t0
print(f"[vmg{N} {n_levels}-level fixed budget] cycles*4={s.metrics.iterations}"
      f" conv={s.metrics.converged} wall={wall:.1f}s"
      f" E={s.metrics.final_energy:.6f}", flush=True)
ts = s.time_series
if ts is not None and len(ts.energy):
    e = np.asarray(ts.energy, float)
    n = len(e)
    total = s.metrics.iterations
    idx = np.unique(np.linspace(0, n - 1, 25).astype(int))
    for i in idx:
        print(f"  ~iter={int(total * (i + 1) / n):>9d}  E={e[i]:.6f}",
              flush=True)
errs = s.compute_validation_errors(save_plots=False)
print(f"  L2 u={errs['u_L2_error']:.4f} v={errs['v_L2_error']:.4f}",
      flush=True)
