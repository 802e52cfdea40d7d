"""High-Re sharp-lid campaign: singular mode + Re-continuation cascade.

March N=128 through Re = 3200 -> 5000 -> 7500 -> 10000 with energy-plateau
stopping per stage (warm-started across Re; u_tilde is Re-independent to
transfer), spectrally prolongate to N=256, polish at the target Re, then
evaluate Ghia centerline errors through the singular decomposition
(spectral interpolant of u_tilde + analytic u_s at the table points).

Usage: python scripts/dev/singular_highre.py [target_re] [n_fine]
State checkpoints: /tmp/singhr_Re{RE}_N{N}.npz
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops import basis as B
from anap3_tpu.ops.pallas_tiled import make_tiled_chunk_runner
from anap3_tpu.ops.singular import eval_singular_uv
from anap3_tpu.ops.transfer import (make_transfer_matrices,
                                    nodal_interpolation_matrix)

TARGET_RE = float(sys.argv[1]) if len(sys.argv) > 1 else 10000.0
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 256
NC = 128
RE_PATH = [re for re in (3200.0, 5000.0, 7500.0, 10000.0) if re <= TARGET_RE]
if not RE_PATH:
    RE_PATH = [TARGET_RE]  # below the cascade ladder: march directly
CHUNK = 5000
DE_PLATEAU = 2e-6   # |dE| per 100k steps at plateau
MAX_STEPS = {NC: 30_000_000, NF: 8_000_000}


def params_for(n, re):
    return SpectralParameters(Re=re, nx=n, ny=n, dtype="float32",
                              corner_treatment="singular")


def march(n, re, state=None, max_steps=None):
    ops, _ = core.build_spectral_ops(params_for(n, re), dtype=jnp.float32)
    if state is None:
        state = core.initial_state(ops)
    else:
        state = core.SpectralState(*core.enforce_bc(ops, state.u, state.v),
                                   p=state.p)
    m_every = 1 if n <= 192 else 8
    chunk = CHUNK if n <= 192 else 2000   # VMEM: rows buffer at N>192
    runner = make_tiled_chunk_runner(ops, chunk, 1e-30, 10,
                                     metrics_every=m_every)
    rn = jnp.float32(np.inf)
    max_steps = max_steps or MAX_STEPS.get(n, 10_000_000)
    t0 = time.time()
    it = 0
    e_hist = []
    while it < max_steps:
        state, done, conv, cv, rows, rn = runner(state, jnp.int32(it), rn)
        it += chunk
        e = float(np.asarray(rows)[-1, 4])
        if not np.isfinite(e):
            print(f"Re={re:g} N={n}: DIVERGED at {it}", flush=True)
            return state, it, False
        e_hist.append(e)
        if it % 500_000 == 0:
            print(f"  Re={re:g} N={n} it={it/1e6:.1f}M E={e:.6f} "
                  f"({it/(time.time()-t0):,.0f} steps/s)", flush=True)
        k = 100_000 // chunk
        if len(e_hist) > 2 * k and abs(e_hist[-1] - e_hist[-1 - k]) \
                < DE_PLATEAU and abs(e_hist[-1 - k] - e_hist[-1 - 2 * k]) \
                < DE_PLATEAU:
            print(f"  Re={re:g} N={n}: plateau at {it/1e6:.2f}M E={e:.6f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            return state, it, True
    print(f"  Re={re:g} N={n}: budget out at {it/1e6:.1f}M E={e:.6f}",
          flush=True)
    return state, it, False


def prolongate(state, nc, nf):
    P_full, _ = make_transfer_matrices(nc + 1, nf + 1, "fft", "fft")
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    P_inner = nodal_interpolation_matrix(bx.nodes(nc + 1)[1:-1],
                                         bx.nodes(nf + 1)[1:-1])
    Pf = jnp.asarray(P_full, jnp.float32)
    Pi = jnp.asarray(P_inner, jnp.float32)
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    return core.SpectralState(u=mm(mm(Pf, state.u), Pf.T),
                              v=mm(mm(Pf, state.v), Pf.T),
                              p=mm(mm(Pi, state.p), Pi.T))


def ghia(n, re, state):
    bx = B.make_basis("chebyshev", (0.0, 1.0))
    xn = bx.nodes(n + 1)
    u_t = np.asarray(state.u, float)
    v_t = np.asarray(state.v, float)
    xc = int(np.argmin(np.abs(xn - 0.5)))
    gd = Path("/root/repo/data/validation/ghia")
    for comp in ("u", "v"):
        csv = gd / f"ghia_Re{int(re)}_{comp}_centerline.csv"
        if not csv.exists():
            continue
        tab = pd.read_csv(csv)
        coord = "y" if comp == "u" else "x"
        pts = tab[coord].to_numpy()
        itr = (pts > 1e-6) & (pts < 1 - 1e-6)
        if comp == "u":
            sm = B.spectral_interpolate(xn, u_t[xc, :], pts)
            us, _ = eval_singular_uv(np.full_like(pts, xn[xc]), pts)
            vals = sm + us
        else:
            sm = B.spectral_interpolate(xn, v_t[:, xc], pts)
            _, vs = eval_singular_uv(pts, np.full_like(pts, xn[xc]))
            vals = sm + vs
        err = np.max(np.abs(vals - tab[comp].to_numpy())[itr])
        print(f"Re={re:g} N={n}: ghia_{comp}_err = {err:.4f}", flush=True)


def save(state, re, n):
    np.savez(f"/tmp/singhr_Re{int(re)}_N{n}.npz", u=np.asarray(state.u),
             v=np.asarray(state.v), p=np.asarray(state.p))


def load(re, n):
    f = Path(f"/tmp/singhr_Re{int(re)}_N{n}.npz")
    if not f.exists():
        f = Path(f"/root/repo/outputs/singhr/singhr_Re{int(re)}_N{n}.npz")
    if not f.exists():
        return None
    d = np.load(f)
    return core.SpectralState(u=jnp.asarray(d["u"]), v=jnp.asarray(d["v"]),
                              p=jnp.asarray(d["p"]))


t00 = time.time()
state = load(RE_PATH[0], NC)
start_idx = 0
for i, re in enumerate(RE_PATH):
    nxt = load(re, NC)
    if nxt is not None:
        state = nxt
        start_idx = i + 1
for i, re in enumerate(RE_PATH):
    if i < start_idx:
        continue
    warm = state is not None
    print(f"=== N={NC} Re={re:g} ({'warm' if warm else 'cold'}) ===",
          flush=True)
    state, it, ok = march(NC, re, state)
    save(state, re, NC)
    ghia(NC, re, state)

print(f"=== prolongate {NC} -> {NF}, polish at Re={TARGET_RE:g} ===",
      flush=True)
fine = load(TARGET_RE, NF)
if fine is None:
    fine = prolongate(state, NC, NF)
fine, it, ok = march(NF, TARGET_RE, fine)
save(fine, TARGET_RE, NF)
ghia(NF, TARGET_RE, fine)
print(f"total wall {time.time()-t00:.0f}s", flush=True)
