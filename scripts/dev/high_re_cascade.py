"""High-Re validation via a manual 2-level cascade on the tiled kernels.

Marches N_coarse until the energy plateaus, prolongates, marches N_fine to
its plateau, then evaluates Ghia centerline errors. Writes progress and the
final state (npz, reusable as a continuation warm start) next to the log.

Usage: python -u high_re_cascade.py <Re> [Nf] [Nc] [out_prefix] [smoothing]
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pathlib import Path
import jax
cache = Path("/root/repo/.jax_cache"); cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp
import pandas as pd

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
from anap3_tpu.ops.transfer import make_transfer_matrices, nodal_interpolation_matrix
from anap3_tpu.ops import basis as B

Re = float(sys.argv[1]) if len(sys.argv) > 1 else 5000.0
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 256
NC = int(sys.argv[3]) if len(sys.argv) > 3 else 128
prefix = sys.argv[4] if len(sys.argv) > 4 else f"/tmp/hire_Re{int(Re)}"
SMOOTHING = float(sys.argv[5]) if len(sys.argv) > 5 else 0.15

import os
BLOCK = int(os.environ.get("HIRE_BLOCK", 500_000))
DE_PLATEAU = float(os.environ.get("HIRE_DE", 2e-5))
CAPS = {NC: 20_000_000, NF: 20_000_000}
CH = 5000

def params_for(n):
    return SpectralParameters(
        name="spectral", Re=Re, nx=n, ny=n, basis_type="chebyshev",
        CFL=1.5, beta_squared=5.0, corner_treatment="smoothing",
        corner_smoothing=SMOOTHING, dtype="float32")

def march(n, state):
    p = params_for(n)
    ops, _ = core.build_spectral_ops(p)
    if state is None:
        state = core.initial_state(ops)
    runner = make_tiled_chunk_runner(ops, CH, 1e-12, 10, algorithm="x3",
                                     metrics_every=8)
    ref = jnp.asarray(jnp.inf, jnp.float32)
    it, last_e, t0 = 0, None, time.time()
    while it < CAPS[n]:
        for _ in range(BLOCK // CH):
            state, done, conv, cv, rows, ref = runner(state, jnp.int32(it), ref)
            it += CH
        r = np.asarray(rows)
        e = float(r[-1, 4])
        print(f"N={n} steps={it/1e6:.1f}M energy={e:.6f} cont={r[-1,3]:.2f} "
              f"wall={time.time()-t0:.0f}s", flush=True)
        if not np.isfinite(e):
            print(f"N={n} DIVERGED", flush=True)
            break
        if last_e is not None and abs(e - last_e) < DE_PLATEAU:
            print(f"N={n} energy plateau after {it/1e6:.1f}M steps", flush=True)
            break
        last_e = e
    return state, it

def prolongate(state, nc, nf, dtype=jnp.float32):
    P_full, _ = make_transfer_matrices(nc + 1, nf + 1, "fft", "fft")
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    P_inner = nodal_interpolation_matrix(bx.nodes(nc + 1)[1:-1],
                                         bx.nodes(nf + 1)[1:-1])
    Pf = jnp.asarray(P_full, dtype)
    Pi = jnp.asarray(P_inner, dtype)
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    u = mm(mm(Pf, state.u), Pf.T)
    v = mm(mm(Pf, state.v), Pf.T)
    p = mm(mm(Pi, state.p), Pi.T)
    ops, _ = core.build_spectral_ops(params_for(nf))
    u, v = core.enforce_bc(ops, u, v)
    return core.SpectralState(u=u, v=v, p=p)

def ghia(n, state):
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    xn = bx.nodes(n + 1)
    xc = int(np.argmin(np.abs(xn - 0.5)))
    u = np.asarray(state.u, float)
    v = np.asarray(state.v, float)
    for comp, fld in (("u", u[xc, :]), ("v", v[:, xc])):
        csv = Path(f"/root/repo/data/validation/ghia/ghia_Re{int(Re)}_{comp}_centerline.csv")
        if not csv.exists():
            continue
        tab = pd.read_csv(csv)
        coord = "y" if comp == "u" else "x"
        pts = tab[coord].to_numpy()
        itr = (pts > 1e-6) & (pts < 1 - 1e-6)
        vals = B.spectral_interpolate(xn, fld, pts)
        err = np.max(np.abs(vals - tab[comp].to_numpy())[itr])
        print(f"Re={Re:g} N={n}: ghia_{comp}_err={err:.4f}", flush=True)

def load_state(path):
    d = np.load(path)
    return core.SpectralState(u=jnp.asarray(d["u"]), v=jnp.asarray(d["v"]),
                              p=jnp.asarray(d["p"]))

t00 = time.time()
warm_f = Path(f"{prefix}_N{NF}.npz")
if warm_f.exists():
    # continue a finished fine level (e.g. with a tighter plateau bound)
    print(f"fine-level warm start from {warm_f}", flush=True)
    state_f, it_c = load_state(warm_f), 0
else:
    init = None
    warm = Path(f"{prefix}_N{NC}.npz")
    if warm.exists():
        init = load_state(warm)
        print(f"warm start from {warm}", flush=True)
    state_c, it_c = march(NC, init)
    np.savez(f"{prefix}_N{NC}.npz", u=np.asarray(state_c.u),
             v=np.asarray(state_c.v), p=np.asarray(state_c.p))
    ghia(NC, state_c)
    state_f = prolongate(state_c, NC, NF)
state_f, it_f = march(NF, state_f)
np.savez(f"{prefix}_N{NF}.npz", u=np.asarray(state_f.u),
         v=np.asarray(state_f.v), p=np.asarray(state_f.p))
ghia(NF, state_f)
print(f"total: coarse {it_c/1e6:.1f}M + fine {it_f/1e6:.1f}M steps, "
      f"wall {time.time()-t00:.0f}s", flush=True)
