"""Newton-Krylov steady solver on the M-step pseudo-time chunk map.

Pseudo-time marching to the cavity's steady state is O(tau/dt) slow (tau ~
a few Re time units; ~1e9 steps at Re=10000) and f32 kernel noise sets a
~1e-2 stationary error ball long before that (measured: uncorrelated
20k-step displacements of 1.7e-4 under the x3 kernels). Newton on the
M-step map F(x) = Phi_M(x) - x fixes both:

- Phi_M damps every fast mode to ~0, so J_F = DPhi_M - I is a compact
  perturbation of -I: GMRES needs only as many vectors as there are slow
  modes (no preconditioner needed — the map IS the preconditioner);
- the RHS is evaluated with one FLOAT64 chunk per Newton iteration, so the
  converged x* satisfies Phi_M^f64(x*) = x*: the f64 discrete steady state,
  while all Krylov matvecs run as cheap f32 jax.jvp forward-mode chunks
  (no stored primal trace, tangent noise does not random-walk);
- Newton does not care about dynamic stability, so it converges to the
  steady solution PAST the ~Re 8000 Hopf bifurcation where marching orbits.

Usage: python scripts/dev/newton_probe.py <Re> <N> [M] [gmres_k] [newton_it]
Warm start: /tmp/singL_Re{RE}_N{N}.npz, singrest, or rre state.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

jax.config.update("jax_enable_x64", True)  # f64 chunk on TPU (emulated)

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops import basis as B
from anap3_tpu.ops.singular import eval_singular_uv

RE = float(sys.argv[1])
N = int(sys.argv[2])
M = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
GK = int(sys.argv[4]) if len(sys.argv) > 4 else 30
NEWTON = int(sys.argv[5]) if len(sys.argv) > 5 else 6

p = SpectralParameters(Re=RE, nx=N, ny=N, dtype="float32",
                       corner_treatment="singular")
ops32, _ = core.build_spectral_ops(p, dtype=jnp.float32)
ops64, _ = core.build_spectral_ops(p, dtype=jnp.float64)

nf, ni = N + 1, N - 1
na, nb = nf * nf, 2 * nf * nf


def unflat(x, dtype):
    u = x[:na].reshape(nf, nf).astype(dtype)
    v = x[na:nb].reshape(nf, nf).astype(dtype)
    pp = x[nb:].reshape(ni, ni).astype(dtype)
    return core.SpectralState(u=u, v=v, p=pp)


def flat(s):
    return jnp.concatenate([s.u.ravel(), s.v.ravel(), s.p.ravel()])


def make_chunk(ops, dtype, settle, window):
    """Trajectory-AVERAGED chunk map: settle steps, then the running mean
    of the next `window` states. The plain end-state map Phi_M is nearly
    unitary on the weakly-damped AC acoustic continuum (phases alias to
    ~2pi*n for periodically spaced frequencies -> many near-null GMRES
    directions, measured rel-residual stall at ~0.7 with 80 vectors);
    averaging over ~2 box-crossing periods turns those rotations into
    J ~ -I while leaving the slow steady modes' small eigenvalues intact.
    A steady state is exactly a fixed point of the averaged map."""

    def chunk(x):
        st = unflat(x, dtype)
        st = core.SpectralState(*core.enforce_bc(ops, st.u, st.v), p=st.p)

        def body(s, _):
            s2, _m = core.sg_step(ops, s)
            return s2, None

        st, _ = jax.lax.scan(body, st, None, length=settle)

        def body2(carry, _):
            s, acc = carry
            s2, _m = core.sg_step(ops, s)
            return (s2, acc + flat(s2)), None

        (st, acc), _ = jax.lax.scan(
            body2, (st, jnp.zeros(nb + ni * ni, dtype)), None,
            length=window)
        return acc / window

    return jax.jit(chunk)


SETTLE, WINDOW = M // 3, M - M // 3
chunk32 = make_chunk(ops32, jnp.float32, SETTLE, WINDOW)
chunk64 = make_chunk(ops64, jnp.float64, SETTLE, WINDOW)


@jax.jit
def jvp_chunk(x, v):
    _, t = jax.jvp(chunk32, (x,), (v,))
    return t


def gmres_solve(x32, rhs, k):
    """Host Arnoldi GMRES for (DPhi_M - I) delta = rhs (f64 host algebra)."""
    n = rhs.shape[0]
    Q = np.zeros((n, k + 1))
    H = np.zeros((k + 1, k))
    beta = np.linalg.norm(rhs)
    if beta == 0:
        return np.zeros(n), 0.0
    Q[:, 0] = rhs / beta
    for j in range(k):
        q32 = jnp.asarray(Q[:, j], jnp.float32)
        w = np.asarray(jvp_chunk(x32, q32), np.float64) - Q[:, j]
        for i in range(j + 1):
            H[i, j] = w @ Q[:, i]
            w -= H[i, j] * Q[:, i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] < 1e-14:
            k = j + 1
            break
        Q[:, j + 1] = w / H[j + 1, j]
    e1 = np.zeros(k + 1)
    e1[0] = beta
    y, res, *_ = np.linalg.lstsq(H[:k + 1, :k], e1, rcond=None)
    delta = Q[:, :k] @ y
    rel = np.linalg.norm(H[:k + 1, :k] @ y - e1) / beta
    return delta, rel


# ---- warm start ----
st = None
for cand in (f"/tmp/rre_Re{int(RE)}_N{N}.npz",
             f"/tmp/singL_Re{int(RE)}_N{N}.npz",
             f"/tmp/singrest_Re{int(RE)}_N{N}.npz",
             f"/tmp/singhr_Re{int(RE)}_N{N}.npz"):
    if Path(cand).exists():
        d = np.load(cand)
        st = core.SpectralState(u=jnp.asarray(d["u"], jnp.float64),
                                v=jnp.asarray(d["v"], jnp.float64),
                                p=jnp.asarray(d["p"], jnp.float64))
        print(f"warm from {cand}", flush=True)
        break
if st is None:
    st = core.initial_state(ops64)
st = core.SpectralState(*core.enforce_bc(ops64, st.u, st.v), p=st.p)
x = np.asarray(flat(st), np.float64)

MARCH = int(sys.argv[6]) if len(sys.argv) > 6 else 1_000_000
march_runner = None
if MARCH > 0:
    from anap3_tpu.ops.pallas_aligned import (aligned_supported,
                                              make_aligned_chunk_runner)

    if aligned_supported(N):
        march_runner = make_aligned_chunk_runner(ops32, 5000, 1e-30, 10,
                                                 metrics_every=8,
                                                 algorithm="x6")


def march(x, steps):
    """x6 march to contract the mid-spectrum (tau < steps) error modes the
    truncated Krylov space can't deflate; Newton then faces only the few
    slowest modes."""
    if march_runner is None:
        for _ in range(steps // M):
            x = np.asarray(chunk32(jnp.asarray(x, jnp.float32)), np.float64)
        return x
    s = unflat(jnp.asarray(x, jnp.float32), jnp.float32)
    s = core.SpectralState(*core.enforce_bc(ops32, s.u, s.v), p=s.p)
    rn = jnp.float32(np.inf)
    for k in range(steps // 5000):
        s, *_ = march_runner(s, jnp.int32(k * 5000), rn)
    return np.asarray(flat(s), np.float64)


t0 = time.time()
for itn in range(NEWTON):
    if MARCH > 0:
        t1 = time.time()
        x = march(x, MARCH)
        print(f"  march {MARCH/1e6:g}M: {time.time()-t1:.0f}s", flush=True)
    t1 = time.time()
    F = np.asarray(chunk64(jnp.asarray(x)), np.float64) - x
    nF = np.linalg.norm(F)
    t_rhs = time.time() - t1
    t1 = time.time()
    x32 = jnp.asarray(x, jnp.float32)
    delta, rel = gmres_solve(x32, -F, GK)
    t_gmres = time.time() - t1
    # backtracking on ||F||
    step = 1.0
    for _ in range(6):
        x_try = x + step * delta
        F_try = np.asarray(chunk64(jnp.asarray(x_try)), np.float64) - x_try
        if np.linalg.norm(F_try) < nF:
            break
        step *= 0.5
    else:
        print("  line search failed; stopping", flush=True)
        break
    x = x_try
    print(f"newton {itn}: ||F|| {nF:.3e} -> {np.linalg.norm(F_try):.3e} "
          f"(gmres rel {rel:.2e}, step {step:g}, rhs {t_rhs:.0f}s, "
          f"gmres {t_gmres:.0f}s)", flush=True)
    if np.linalg.norm(F_try) < 1e-10 * np.sqrt(x.size):
        break
print(f"total {time.time()-t0:.0f}s", flush=True)

st = unflat(jnp.asarray(x), jnp.float64)
st = core.SpectralState(*core.enforce_bc(ops64, st.u, st.v), p=st.p)
np.savez(f"/tmp/newton_Re{int(RE)}_N{N}.npz", u=np.asarray(st.u),
         v=np.asarray(st.v), p=np.asarray(st.p))

# steady residual of the converged state (f64)
Ru, Rv, Rp = core.residuals(ops64, st.u, st.v, st.p)
print(f"steady residual: |R_u|_int "
      f"{float(jnp.max(jnp.abs(Ru[1:-1, 1:-1]))):.3e}  "
      f"|div|_max {float(jnp.max(jnp.abs(Rp))/float(ops64.beta_sq)):.3e}",
      flush=True)

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
    print(f"Re={RE:g} N={N} NEWTON: ghia_{comp}_err = {srt[0]:.4f} "
          f"(2nd {srt[1]:.4f})", flush=True)
