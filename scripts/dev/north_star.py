"""North-star probe: spectral N=96 Re=1000 -> rel-iter 1e-6, timed on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from pathlib import Path
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.models.runner import run_fixed_point
from anap3_tpu.models.spectral import FSGSolver

for dtype in ("float32",):
    for mg, levels in (("fsg", 3), ("none", 1)):
        p = SpectralParameters(
            name="spectral_fsg" if mg == "fsg" else "spectral",
            Re=1000.0, nx=96, ny=96, basis_type="chebyshev", CFL=1.5,
            beta_squared=5.0, corner_treatment="smoothing", corner_smoothing=0.15,
            tolerance=1e-6, max_iterations=400000, multigrid=mg, n_levels=levels,
            coarse_tolerance_factor=1.0, dtype=dtype, chunk_size=2000)
        t0 = time.time()
        if mg == "fsg":
            s = FSGSolver(params=p)
            s.solve()
            res_info = (s.metrics.iterations, s.metrics.converged)
            state = s.state
            ops = s.ops
        else:
            ops, _ = core.build_spectral_ops(p)
            state0 = core.initial_state(ops)
            r = run_fixed_point(lambda st: core.sg_step(ops, st),
                                lambda st: (st.u, st.v), state0,
                                tolerance=1e-6, max_iterations=1000000, chunk=2000)
            res_info = (r.iterations, r.converged)
            state = r.state
        wall = time.time() - t0
        print(f"{dtype} {mg}: iters={res_info[0]} converged={res_info[1]} wall={wall:.1f}s", flush=True)
        # Ghia comparison
        import pandas as pd
        ghia = pd.read_csv("/root/repo/data/validation/ghia/ghia_Re1000_u_centerline.csv")
        from anap3_tpu.ops import basis as B
        bx = B.make_basis("chebyshev", (0.0, 1.0))
        xn = bx.nodes(97)
        xc = int(np.argmin(np.abs(xn - 0.5)))
        u_c = B.spectral_interpolate(xn, np.asarray(state.u, float)[xc, :], ghia["y"].to_numpy())
        err = np.max(np.abs(u_c - ghia["u"].to_numpy()))
        print(f"  Ghia u-centerline max err: {err:.4f}", flush=True)
