"""Pseudo-transient continuation (PTC) Newton-GMRES steady solver probe.

Pseudo-time marching to the cavity's steady state is O(Re)-slow (core
spin-up rides the viscous timescale: measured ~15% v-centerline deficit at
Re >= 7500 after 10-20M steps), and plain Newton on the chunk map stalls
because the slow-mode eigenvalues of DPhi_M cluster at 1 (measured GMRES
rel-residual 0.7-0.9). PTC solves the steady PN-PN-2 AC system directly:

    (I/dt_k - J(x_k)) delta = F(x_k),   x_{k+1} = x_k + delta

with dt_k ramped by switched-evolution relaxation dt_k = dt0*||F_0||/||F_k||.
The 1/dt shift regularizes exactly the slow modes a Stokes preconditioner
cannot handle, so right-preconditioned GMRES with

    P = [ I/dt - nu*Lap,   G  ]    (velocity block: separable ->
        [ beta^2 D,      I/dt ]     tensor-product eigen solve;
                                     pressure: inner Schur BiCGSTAB)

converges in tens of vectors per step, and as ||F|| -> 0 PTC becomes Newton
(quadratic tail; converges to UNSTABLE steady states past the Hopf point).

All device algebra is float64 (latency-dominated at these sizes; the
emulated-f64 matmuls are trivial); GMRES basis is host numpy float64.

Usage: python scripts/dev/ptc_probe.py <Re> <N> [gmres_k] [steps] [dt0]
Warm start: /tmp/{newton,rre,singL,singhr,singrest}_Re{RE}_N{N}.npz.
Writes /tmp/ptc_Re{RE}_N{N}.npz.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
from anap3_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import os

import jax

if os.environ.get("PTC_CPU"):  # sitecustomize ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pandas as pd

from anap3_tpu.models.params import SpectralParameters
from anap3_tpu.models import spectral_sg as core
from anap3_tpu.ops import basis as B
from anap3_tpu.ops.singular import eval_singular_uv

RE = float(sys.argv[1])
N = int(sys.argv[2])
GK = int(sys.argv[3]) if len(sys.argv) > 3 else 60
STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 30
DT0 = float(sys.argv[5]) if len(sys.argv) > 5 else 0.05
DT_MAX = float(sys.argv[6]) if len(sys.argv) > 6 else 3e3
WARM = sys.argv[7] if len(sys.argv) > 7 else None
SCHUR_IT = 40

p = SpectralParameters(Re=RE, nx=N, ny=N, dtype="float64",
                       corner_treatment="singular")
ops, grid = core.build_spectral_ops(p, dtype=jnp.float64)

nf, ni = N + 1, N - 1
nu2, np2 = ni * ni, ni * ni  # interior velocity block, inner pressure block
NTOT = 2 * nu2 + np2

# ---- flatten/embed ----


def embed(ui, vi):
    """Interior unknowns -> full grids with the fixed boundary data."""
    u = ops.bc_u.at[1:-1, 1:-1].set(ui)
    v = ops.bc_v.at[1:-1, 1:-1].set(vi)
    return u, v


def unflat(x):
    ui = x[:nu2].reshape(ni, ni)
    vi = x[nu2:2 * nu2].reshape(ni, ni)
    pp = x[2 * nu2:].reshape(ni, ni)
    return ui, vi, pp


def flat(ui, vi, pp):
    return jnp.concatenate([ui.ravel(), vi.ravel(), pp.ravel()])


def F(x):
    """Steady residual on the interior/inner unknowns."""
    ui, vi, pp = unflat(x)
    u, v = embed(ui, vi)
    Ru, Rv, Rp = core.residuals(ops, u, v, pp)
    return flat(Ru[1:-1, 1:-1], Rv[1:-1, 1:-1], Rp)


F_jit = jax.jit(F)
jvp_F = jax.jit(lambda x, t: jax.jvp(F, (x,), (t,))[1])

# ---- shifted-Stokes preconditioner ----
# Velocity block H = 1/dt - nu*Lap_int: interior Dirichlet Laplacian
# eigendecomposition (host f64, once).
Dxx_i = np.asarray(grid["Dxx"])[1:-1, 1:-1]
Dyy_i = np.asarray(grid["Dyy"])[1:-1, 1:-1]
lx, Vx = np.linalg.eig(Dxx_i)
ly, Vy = np.linalg.eig(Dyy_i)
lx, Vx = np.real(lx), np.real(Vx)
ly, Vy = np.real(ly), np.real(Vy)
Vxi, Vyi = np.linalg.inv(Vx), np.linalg.inv(Vy)
LAM = jnp.asarray(lx[:, None] + ly[None, :])   # (ni, ni), negative
Vx, Vxi, Vy, Vyi = map(jnp.asarray, (Vx, Vxi, Vy, Vyi))

# Restricted gradient/divergence operators (interior rows/cols only)
Gxr = ops.Gx[1:-1, :]          # (ni, ni): x-gradient of inner p at interior
IyTr = ops.IyT[:, 1:-1]        # (ni, ni)
Ixr = ops.Ix[1:-1, :]
GyTr = ops.GyT[:, 1:-1]
Dxi = ops.Dx[1:-1, 1:-1]       # divergence of interior-embedded velocity
DyTi = ops.DyT[1:-1, 1:-1]

mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def hsolve(f, inv_hlam):
    """(1/dt - nu*Lap)^{-1} f via the eigenbasis."""
    return mm(mm(Vx, mm(mm(Vxi, f), Vyi.T) * inv_hlam), Vy.T)


def grad_p(pp):
    return mm(mm(Gxr, pp), IyTr), mm(mm(Ixr, pp), GyTr)


def div_uv(ui, vi):
    return mm(Dxi, ui) + mm(vi, DyTi)


def precond(r, inv_dt, inv_hlam):
    """z = P^{-1} r for the shifted Stokes-AC block system."""
    r_u, r_v, r_p = unflat(r)
    # Schur complement S dp = r_p - beta^2 D H^{-1} r_uv,
    # S = I/dt - beta^2 D H^{-1} G  (positive-definite-ish)
    rhs = r_p - ops.beta_sq * div_uv(hsolve(r_u, inv_hlam),
                                     hsolve(r_v, inv_hlam))

    def s_apply(pp):
        gx, gy = grad_p(pp)
        return (inv_dt * pp
                - ops.beta_sq * div_uv(hsolve(gx, inv_hlam),
                                       hsolve(gy, inv_hlam)))

    dp, _ = jax.scipy.sparse.linalg.bicgstab(
        s_apply, rhs, tol=1e-8, maxiter=SCHUR_IT)
    gx, gy = grad_p(dp)
    du = hsolve(r_u - gx, inv_hlam)
    dv = hsolve(r_v - gy, inv_hlam)
    return flat(du, dv, dp)


@jax.jit
def matvec(x, y, inv_dt, inv_hlam):
    """w = (I/dt - J) P^{-1} y — one fused device call per Arnoldi step."""
    z = precond(y, inv_dt, inv_hlam)
    return z * inv_dt - jvp_F(x, z), z


precond_jit = jax.jit(precond)


def gmres(x, rhs, inv_dt, inv_hlam, k, tol=1e-3):
    n = rhs.shape[0]
    Q = np.zeros((n, k + 1))
    H = np.zeros((k + 1, k))
    beta = np.linalg.norm(rhs)
    Q[:, 0] = rhs / beta
    used = k
    for j in range(k):
        w, _ = matvec(x, jnp.asarray(Q[:, j]), inv_dt, inv_hlam)
        w = np.array(w)  # writable host copy
        for i in range(j + 1):
            H[i, j] = w @ Q[:, i]
            w -= H[i, j] * Q[:, i]
        H[j + 1, j] = np.linalg.norm(w)
        if H[j + 1, j] < 1e-14:
            used = j + 1
            break
        Q[:, j + 1] = w / H[j + 1, j]
        # cheap residual check every 10 vectors
        if (j + 1) % 10 == 0 or j == k - 1:
            e1 = np.zeros(j + 2)
            e1[0] = beta
            yk, *_ = np.linalg.lstsq(H[:j + 2, :j + 1], e1, rcond=None)
            rel = np.linalg.norm(H[:j + 2, :j + 1] @ yk - e1) / beta
            if rel < tol:
                used = j + 1
                break
    e1 = np.zeros(used + 1)
    e1[0] = beta
    yk, *_ = np.linalg.lstsq(H[:used + 1, :used], e1, rcond=None)
    rel = np.linalg.norm(H[:used + 1, :used] @ yk - e1) / beta
    ypre = Q[:, :used] @ yk
    delta = np.asarray(precond_jit(jnp.asarray(ypre), inv_dt, inv_hlam))
    return delta, rel, used


# ---- warm start ----
st = None
cands = ([WARM] if WARM else []) + [f"/tmp/ptc_Re{int(RE)}_N{N}.npz"]
for cand in (*cands,
             f"/tmp/newton_Re{int(RE)}_N{N}.npz",
             f"/tmp/rre_Re{int(RE)}_N{N}.npz",
             f"/tmp/singL_Re{int(RE)}_N{N}.npz",
             f"/tmp/singhr_Re{int(RE)}_N{N}.npz",
             f"/tmp/singrest_Re{int(RE)}_N{N}.npz"):
    if Path(cand).exists():
        d = np.load(cand)
        st = core.SpectralState(u=jnp.asarray(d["u"], jnp.float64),
                                v=jnp.asarray(d["v"], jnp.float64),
                                p=jnp.asarray(d["p"], jnp.float64))
        print(f"warm from {cand}", flush=True)
        break
if st is None:
    st = core.initial_state(ops)
st = core.SpectralState(*core.enforce_bc(ops, st.u, st.v), p=st.p)
x = np.asarray(flat(st.u[1:-1, 1:-1], st.v[1:-1, 1:-1], st.p), np.float64)

# FD-verify the jvp once (random direction)
rng = np.random.default_rng(0)
t = rng.standard_normal(NTOT) * 1e-7
fd = (np.asarray(F_jit(jnp.asarray(x + t))) -
      np.asarray(F_jit(jnp.asarray(x - t)))) / 2
an = np.asarray(jvp_F(jnp.asarray(x), jnp.asarray(t)))
print(f"jvp FD check: rel {np.linalg.norm(fd - an) / np.linalg.norm(an):.2e}",
      flush=True)

t0 = time.time()
Fk = np.asarray(F_jit(jnp.asarray(x)))
nF = np.linalg.norm(Fk)
dt, dt_max = DT0, DT_MAX
for k in range(STEPS):
    inv_dt = jnp.float64(1.0 / dt)
    inv_hlam = 1.0 / (inv_dt - ops.nu * LAM)
    t1 = time.time()
    # backward Euler on dx/dtau = F: (I/dt - J) delta = +F(x_k)
    delta, rel, used = gmres(jnp.asarray(x), jnp.asarray(Fk),
                             inv_dt, inv_hlam, GK, tol=1e-4)
    # line search on ||F||; dt ramps geometrically on full steps
    step = 1.0
    for _ in range(8):
        x_try = x + step * delta
        F_try = np.asarray(F_jit(jnp.asarray(x_try)))
        nF_try = np.linalg.norm(F_try)
        if nF_try < nF:
            break
        step *= 0.5
    else:
        dt *= 0.2
        print(f"  step {k}: line search failed; dt -> {dt:.2e}", flush=True)
        continue
    x, Fk, nF = x_try, F_try, nF_try
    print(f"ptc {k}: ||F|| {nF:.3e} dt {dt:.2e} gmres(rel {rel:.1e}, "
          f"{used} vec) step {step:g} [{time.time()-t1:.0f}s]", flush=True)
    if nF < 1e-9 * np.sqrt(NTOT):
        print("converged", flush=True)
        break
    dt = min(dt * 3.0, dt_max) if step == 1.0 else dt * 0.5
print(f"total {time.time()-t0:.0f}s", flush=True)

ui, vi, pp = unflat(jnp.asarray(x))
u, v = embed(ui, vi)
st = core.SpectralState(u=u, v=v, p=pp)
np.savez(f"/tmp/ptc_Re{int(RE)}_N{N}.npz", u=np.asarray(st.u),
         v=np.asarray(st.v), p=np.asarray(st.p))

Ru, Rv, Rp = core.residuals(ops, st.u, st.v, st.p)
print(f"steady residual: |R_u|_int {float(jnp.max(jnp.abs(Ru[1:-1,1:-1]))):.3e}"
      f"  |div|_max {float(jnp.max(jnp.abs(Rp))/float(ops.beta_sq)):.3e}",
      flush=True)

xn = grid["x_nodes"]
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
    print(f"Re={RE:g} N={N} PTC: ghia_{comp}_err = {srt[0]:.4f} "
          f"(2nd {srt[1]:.4f})", flush=True)
