"""VERDICT r2 #7 done-bar probe: VMG [320, 160] at Re=1000.

Measures (a) whole-cycle compile time with the row-blocked tau kernels
(must be < 5 min; the round-2 XLA fine level took > 45 min), (b)
convergence to the smoothed-lid L2 floor (~0.099/0.075, same as
FSG-energy).

Usage: python scripts/dev/vmg320_probe.py [N] [Re] [max_fine_steps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from anap3_tpu.models.spectral_vmg import VMGSolver

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320
Re = float(sys.argv[2]) if len(sys.argv) > 2 else 1000.0
maxit = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

s = VMGSolver(Re=Re, nx=N, ny=N, tolerance=1e-6, max_iterations=maxit,
              dtype="float32", chunk_size=2000)
t0 = time.time()
s.solve()
wall = time.time() - t0
print(f"[vmg N={N} Re={Re:g}] cycles*4={s.metrics.iterations} "
      f"conv={s.metrics.converged} wall={wall:.1f}s "
      f"first_chunk(compile)={s.first_chunk_time:.1f}s", flush=True)
errs = s.compute_validation_errors(save_plots=False)
print(f"  L2 u={errs['u_L2_error']:.4f} v={errs['v_L2_error']:.4f} "
      f"(FSG-energy floor ~0.099/0.075)", flush=True)
