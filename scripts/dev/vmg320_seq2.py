"""Round-2 probes for VMG-family at N=320 (after vmg320_seq).

1. FMG N=320 (auto criterion -> energy on the finest level): nested
   iteration warm-starts the fine level, so V-cycles only remove
   fine-scale error — the candidate production V-cycle solver at 320.
2. Guarded [160,80] Re=1000 energy: does the non-finite-correction guard
   turn the old NaN blowup into a converged run?

Usage: python scripts/dev/vmg320_seq2.py [stages]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def report(tag, s, t0):
    print(f"[{tag}] iters={s.metrics.iterations} conv={s.metrics.converged} "
          f"wall={time.time() - t0:.1f}s E={s.metrics.final_energy:.6f}",
          flush=True)
    try:
        errs = s.compute_validation_errors(save_plots=False)
        print(f"  L2 u={errs['u_L2_error']:.4f} v={errs['v_L2_error']:.4f}",
              flush=True)
    except Exception as e:
        print(f"  validation failed: {e}", flush=True)


which = sys.argv[1:] if len(sys.argv) > 1 else ["1", "2"]

if "1" in which:
    from anap3_tpu.models.spectral_vmg import FMGSolver
    s = FMGSolver(Re=1000.0, nx=320, ny=320, tolerance=1e-6,
                  max_iterations=8_000_000, dtype="float32",
                  chunk_size=2000, n_levels=3, convergence_metric="auto")
    t0 = time.time()
    s.solve()
    report("fmg 320 3-level auto", s, t0)

if "2" in which:
    from anap3_tpu.models.spectral_vmg import VMGSolver
    s = VMGSolver(Re=1000.0, nx=160, ny=160, tolerance=1e-6,
                  max_iterations=3_000_000, dtype="float32",
                  chunk_size=2000, n_levels=2, convergence_metric="energy")
    t0 = time.time()
    s.solve()
    report("guarded vmg 160/80 energy", s, t0)
