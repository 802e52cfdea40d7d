"""Sequential TPU probes for the VMG-at-320 investigation.

1. [160,80] Re=1000 rel-iter: is the N=80 coarse level the NaN source of
   the [320,160,80] run? (FAS floor 2.4*sqrt(1000)=76 admits 80 — barely.)
2. [320,160] Re=1000 energy criterion: does the L2=0.30 rel-iter exit
   become the ~0.099/0.075 smoothed-lid floor when run to the energy
   plateau?
3. FSG N=320 energy: the done-bar comparison floor.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def report(tag, s, t0):
    print(f"[{tag}] iters={s.metrics.iterations} conv={s.metrics.converged} "
          f"wall={time.time() - t0:.1f}s energy={s.metrics.final_energy:.6f}",
          flush=True)
    try:
        errs = s.compute_validation_errors(save_plots=False)
        print(f"  L2 u={errs['u_L2_error']:.4f} v={errs['v_L2_error']:.4f}",
              flush=True)
    except Exception as e:  # diverged runs can fail interpolation
        print(f"  validation failed: {e}", flush=True)


which = sys.argv[1:] if len(sys.argv) > 1 else ["1", "2", "3"]

if "1" in which:
    from anap3_tpu.models.spectral_vmg import VMGSolver
    s = VMGSolver(Re=1000.0, nx=160, ny=160, tolerance=1e-6,
                  max_iterations=3_000_000, dtype="float32",
                  chunk_size=2000, n_levels=2)
    t0 = time.time()
    s.solve()
    report("vmg 160/80 rel-iter", s, t0)

if "2" in which:
    from anap3_tpu.models.spectral_vmg import VMGSolver
    s = VMGSolver(Re=1000.0, nx=320, ny=320, tolerance=1e-6,
                  max_iterations=6_000_000, dtype="float32",
                  chunk_size=2000, n_levels=2, convergence_metric="energy")
    t0 = time.time()
    s.solve()
    report("vmg 320/160 energy", s, t0)

if "3" in which:
    from anap3_tpu.models.spectral import FSGSolver
    s = FSGSolver(Re=1000.0, nx=320, ny=320, tolerance=1e-6,
                  max_iterations=8_000_000, dtype="float32",
                  chunk_size=2000, convergence_metric="energy")
    t0 = time.time()
    s.solve()
    report("fsg 320 energy", s, t0)
