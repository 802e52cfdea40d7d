"""Parametrized multigrid probe (consolidates the round-3 vmg320_* /
tau320_* / high_re_* series — their findings are recorded in STATUS.md
"Multigrid study" and the N=320 ladder, and productized as the
VMG_COLD_START_MAX_N warm-start prelude in models/spectral_vmg.py).

Usage:
    python scripts/dev/vmg_probe.py --solver vmg --n 320 --re 1000
    python scripts/dev/vmg_probe.py --solver fmg --n 256 --budget 40000

Prints wall time, iterations, energy, and the u/v L2 errors vs the stored
FV truth when one exists for the Reynolds number.
"""
import argparse
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO)

import jax

from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(REPO / ".jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="vmg",
                    choices=["vmg", "fmg", "fsg", "sg"])
    ap.add_argument("--n", type=int, default=320)
    ap.add_argument("--re", type=float, default=1000.0)
    ap.add_argument("--corner", default="smoothing")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--budget", type=int, default=400000)
    ap.add_argument("--metric", default="auto")
    a = ap.parse_args()

    from anap3_tpu.models.params import SpectralParameters
    from anap3_tpu.models.spectral import FSGSolver, SGSolver
    from anap3_tpu.models.spectral_vmg import FMGSolver, VMGSolver

    cls = {"vmg": VMGSolver, "fmg": FMGSolver, "fsg": FSGSolver,
           "sg": SGSolver}[a.solver]
    p = SpectralParameters(
        name=f"spectral_{a.solver}" if a.solver != "sg" else "spectral",
        Re=a.re, nx=a.n, ny=a.n, basis_type="chebyshev", CFL=1.5,
        beta_squared=5.0, corner_treatment=a.corner, corner_smoothing=0.15,
        tolerance=a.tol, max_iterations=a.budget, dtype="float32",
        chunk_size=2000, convergence_metric=a.metric,
        multigrid="fsg" if a.solver in ("fsg", "vmg", "fmg") else "none",
        n_levels=3)
    print(f"{a.solver} N={a.n} Re={a.re} device={jax.devices()[0]}",
          flush=True)
    s = cls(params=p)
    t0 = time.time()
    s.solve()
    wall = time.time() - t0
    print(f"iters={s.metrics.iterations} converged={s.metrics.converged} "
          f"wall={wall:.1f}s", flush=True)
    try:
        errors = s.compute_validation_errors(
            str(REPO / "data" / "validation" / "fv"))
        print({k: round(float(v), 5) for k, v in errors.items()},
              flush=True)
    except Exception as exc:
        print(f"(no FV truth comparison: {exc})", flush=True)


if __name__ == "__main__":
    main()
