"""Round-3 probes: N=320 solver ladder with the N^2-SCALED energy
plateau window (models/spectral.scaled_plateau_chunks, commit 50ed0ba).

Prior fixed-window results (vmg320seq/seq2 logs, 2026-08-18):
  FSG 320 energy:        E=0.038394  L2 0.1157/0.0961  138 s
  FMG 320 3-level auto:  E=0.039648  L2 0.1045/0.0839  578 s
  VMG [320,160] energy:  E=0.030086  L2 0.2508/0.2559  3902 s  <- premature
The scaled window keeps the plateau's PHYSICAL duration resolution-
independent; this sequence measures how much closer each solver lands to
the smoothed-lid floor (~0.099/0.075 at N=192) and whether VMG [320,160]
now clears its shoulder (VERDICT r2 item 7's convergence condition).

Usage: python scripts/dev/vmg320_seq3.py [stages: 1=fsg 2=fmg 3=vmg]
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


which = sys.argv[1:] if len(sys.argv) > 1 else ["1", "2", "3"]

if "1" in which:
    from anap3_tpu.models.spectral import FSGSolver
    s = FSGSolver(Re=1000.0, nx=320, ny=320, tolerance=1e-6,
                  max_iterations=16_000_000, dtype="float32",
                  chunk_size=2000, convergence_metric="energy")
    t0 = time.time()
    s.solve()
    report("fsg 320 energy scaled-window", s, t0)

if "2" in which:
    from anap3_tpu.models.spectral_vmg import FMGSolver
    s = FMGSolver(Re=1000.0, nx=320, ny=320, tolerance=1e-6,
                  max_iterations=8_000_000, dtype="float32",
                  chunk_size=2000, n_levels=3, convergence_metric="auto")
    t0 = time.time()
    s.solve()
    report("fmg 320 3-level auto scaled-window", s, t0)

if "3" in which:
    from anap3_tpu.models.spectral_vmg import VMGSolver
    s = VMGSolver(Re=1000.0, nx=320, ny=320, tolerance=1e-6,
                  max_iterations=4_000_000, dtype="float32",
                  chunk_size=2000, n_levels=2, convergence_metric="energy")
    t0 = time.time()
    s.solve()
    report("vmg 320/160 energy scaled-window", s, t0)
