"""RRE/Anderson extrapolation of the pseudo-time march to the steady state.

The cavity's slowest interior modes decay with tau ~ a few Re time units, so
a plain AC march needs O(1e8-1e9) steps at Re >= 3200 no matter how fast the
kernel is (the measured Re=1000 rest-start tail: ~1.1e-5 energy per 2M steps
at 60M steps, ratio 0.97 — tau ~ 65M steps). Reduced-rank extrapolation on
snapshots x_k spaced M steps apart solves the fixed point of the (locally
linear) chunk map directly — GMRES on the slow spectrum:

    minimize || sum_i g_i (x_{i+1} - x_i) ||   s.t.  sum_i g_i = 1
    x* = sum_i g_i x_{i+1}

Each cycle kills the dominant slow modes; marching M steps between cycles
re-damps the fast modes the jump injects. Guards: BC re-enforcement after
the jump, and the jump is REVERTED if it increases the chunk-map defect.

Usage: python scripts/dev/rre_probe.py <Re> <N> [K] [M_steps] [cycles]
Warm state: /tmp/singL_Re{RE}_N{N}.npz or singrest or rest start.
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
from anap3_tpu.ops.pallas_aligned import make_aligned_chunk_runner
from anap3_tpu.ops.singular import eval_singular_uv

RE = float(sys.argv[1])
N = int(sys.argv[2])
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
M = int(sys.argv[4]) if len(sys.argv) > 4 else 200_000
CYCLES = int(sys.argv[5]) if len(sys.argv) > 5 else 12
ALG = sys.argv[6] if len(sys.argv) > 6 else "x6"
CH = 5000

p = SpectralParameters(Re=RE, nx=N, ny=N, dtype="float32",
                       corner_treatment="singular")
ops, _ = core.build_spectral_ops(p, dtype=jnp.float32)

st = None
for cand in (f"/tmp/singL_Re{int(RE)}_N{N}.npz",
             f"/tmp/singrest_Re{int(RE)}_N{N}.npz"):
    if Path(cand).exists():
        d = np.load(cand)
        st = core.SpectralState(u=jnp.asarray(d["u"]),
                                v=jnp.asarray(d["v"]),
                                p=jnp.asarray(d["p"]))
        print(f"warm from {cand}", flush=True)
        break
if st is None:
    st = core.initial_state(ops)
st = core.SpectralState(*core.enforce_bc(ops, st.u, st.v), p=st.p)

runner = make_aligned_chunk_runner(ops, CH, 1e-30, 10, metrics_every=1,
                                   algorithm=ALG)
it = 0


def march(st, steps):
    global it
    rn = jnp.float32(np.inf)
    for _ in range(steps // CH):
        st, done, conv, cv, rows, rn = runner(st, jnp.int32(it), rn)
        it += CH
    return st, float(np.asarray(rows)[-1, 4])


def flat(s):
    return np.concatenate([np.asarray(s.u, np.float64).ravel(),
                           np.asarray(s.v, np.float64).ravel(),
                           np.asarray(s.p, np.float64).ravel()])


def unflat(x):
    nf, ni = N + 1, N - 1
    a, b = nf * nf, 2 * nf * nf
    u = jnp.asarray(x[:a].reshape(nf, nf), jnp.float32)
    v = jnp.asarray(x[a:b].reshape(nf, nf), jnp.float32)
    pp = jnp.asarray(x[b:].reshape(ni, ni), jnp.float32)
    s = core.SpectralState(*core.enforce_bc(ops, u, v), p=pp)
    return s


def defect(s):
    """||chunk-map displacement|| over M0 steps — cycle progress measure."""
    s2, _ = march(s, 4 * CH)
    return float(np.linalg.norm(flat(s2) - flat(s))), s2


t0 = time.time()
st, e = march(st, M)  # settle fast modes first
print(f"start E={e:.7f}", flush=True)
for cyc in range(CYCLES):
    snaps = [flat(st)]
    for k in range(K):
        st, e = march(st, M)
        snaps.append(flat(st))
    X = np.stack(snaps, axis=1)           # (n, K+1)
    D = np.diff(X, axis=1)                # (n, K)
    G = D.T @ D
    G = G / max(np.abs(G).max(), 1e-300)
    G += 1e-12 * np.eye(K)
    w = np.linalg.solve(G, np.ones(K))
    g = w / w.sum()
    x_star = X[:, 1:] @ g
    d_before, _ = defect(st)
    st_new = unflat(x_star)
    d_after, st_adv = defect(st_new)
    took = d_after < d_before
    if took:
        st = st_adv
    _, e = march(st, 2 * CH)
    print(f"cycle {cyc}: E={e:.7f} defect {d_before:.3e} -> {d_after:.3e} "
          f"{'ACCEPT' if took else 'REVERT'} |g|={np.abs(g).max():.1f} "
          f"({it/1e6:.1f}M steps, {time.time()-t0:.0f}s)", flush=True)

np.savez(f"/tmp/rre_Re{int(RE)}_N{N}.npz", u=np.asarray(st.u),
         v=np.asarray(st.v), p=np.asarray(st.p))

xn = B.make_basis("chebyshev", (0.0, 1.0)).nodes(N + 1)
xc = int(np.argmin(np.abs(xn - 0.5)))
u_t, v_t = np.asarray(st.u, float), np.asarray(st.v, float)
gd = Path("/root/repo/data/validation/ghia")
for comp in ("u", "v"):
    csv = gd / f"ghia_Re{int(RE)}_{comp}_centerline.csv"
    if not csv.exists():
        continue
    tab = pd.read_csv(csv)
    coord = "y" if comp == "u" else "x"
    pts = tab[coord].to_numpy()
    itr = (pts > 1e-6) & (pts < 1 - 1e-6)
    if comp == "u":
        sm = B.spectral_interpolate(xn, u_t[xc, :], pts)
        us, _ = eval_singular_uv(np.full_like(pts, xn[xc]), pts)
        vals = np.asarray(sm) + us
    else:
        sm = B.spectral_interpolate(xn, v_t[:, xc], pts)
        _, vs = eval_singular_uv(pts, np.full_like(pts, xn[xc]))
        vals = np.asarray(sm) + vs
    diffs = np.abs(vals - tab[comp].to_numpy())[itr]
    srt = np.sort(diffs)[::-1]
    print(f"Re={RE:g} N={N} RRE: ghia_{comp}_err = {srt[0]:.4f} "
          f"(2nd {srt[1]:.4f})", flush=True)
