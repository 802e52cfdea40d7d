"""Fused Pallas kernels for the FV-SIMPLE solver.

The XLA FV step lowers to ~80-100 small kernels (stencil shifts, scatter
adds, reductions) whose per-launch latency dominates at N<=256 (measured
~164 us/iteration at N=128 on a v5e while the arithmetic is microseconds).
``make_pallas_fv_step`` fuses the ENTIRE SIMPLE iteration — pressure /
velocity gradients, momentum coefficient assembly, the joint u/v BiCGSTAB
predictor solve (fixed iteration count, matrix-free 5-point stencil),
Rhie-Chow face velocities, the direct tensor-product pressure solve with one
refinement step, corrections, and the residual/conserved-quantity metrics —
into one launch with everything resident in VMEM.
``make_pallas_fv_chunk_runner`` additionally moves the chunk loop AND the
convergence state machine of models/runner.py in-kernel (per-step relative
iterate change, warmup gate, done-freezing, divergence detection), matching
ops/pallas_chunk.py's contract for the spectral solvers.

Numerics are the same as models/fv.fv_step (reference
src/solvers/fv/solver.py:170-257) with ONE documented difference: the
momentum BiCGSTAB runs a FIXED number of inner iterations (default 16,
warm-started, with a breakdown guard that freezes converged solves) instead
of a tolerance test. The reference itself tolerates non-converged momentum
solves (scipy_solver.py:46-50); SIMPLE's outer iteration recomputes the
divergence from actual fluxes every step, so inner slack costs outer
iterations, never biases the converged solution. Measured effect: the f32
L2 errors against the stored truths match the float64 values exactly
(0.1258%/0.1588% at N=128 Re=100), unlike the tolerance-clamped XLA path.

float32 only (the TPU-native FV mode). Supports the 5-point TVD/MUSCL
configuration of conf/solver/fv.yaml (scheme=TVD with the reference's
extrapolated limiter (psi==1), or upwind; the rarely-used "MUSCL-sharp"
variant stays on the XLA path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fv import FVOps, FVState

__all__ = ["make_pallas_fv_step", "make_pallas_fv_chunk_runner",
           "MAX_FV_STEP_N", "MAX_FV_CHUNK_N"]

# VMEM ceilings measured on a v5e (16 MB scoped limit, BiCGSTAB as an
# in-kernel fori_loop so only one iteration's temporaries are live): the
# step kernel OOMs at N=256, the chunk kernel (which additionally carries
# the 5-array state through its step loop) at N=224. Larger FV grids run
# the XLA step.
MAX_FV_STEP_N = 224
MAX_FV_CHUNK_N = 192
N_METRICS = 6
N_COLS = 7  # rel_iter + 6 metrics (runner METRIC_KEYS order)


def _shift_e(a):
    """East neighbor: a[j, i+1] at [j, i]; zero beyond the last column."""
    ny, nx = a.shape
    return jnp.concatenate([a[:, 1:], jnp.zeros((ny, 1), a.dtype)], axis=1)


def _shift_w(a):
    ny, nx = a.shape
    return jnp.concatenate([jnp.zeros((ny, 1), a.dtype), a[:, :-1]], axis=1)


def _shift_n(a):
    ny, nx = a.shape
    return jnp.concatenate([a[1:, :], jnp.zeros((1, nx), a.dtype)], axis=0)


def _shift_s(a):
    ny, nx = a.shape
    return jnp.concatenate([jnp.zeros((1, nx), a.dtype), a[:-1, :]], axis=0)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _build_statics(params, ops: FVOps):
    """Host-side constant arrays for the kernel."""
    nx, ny = int(params.nx), int(params.ny)
    dx, dy = float(ops.dx), float(ops.dy)
    mu = float(np.asarray(ops.mu))
    f32 = np.float32

    col = np.broadcast_to(np.arange(nx), (ny, nx))
    row = np.broadcast_to(np.arange(ny)[:, None], (ny, nx))
    has_e = (col < nx - 1).astype(f32)
    has_w = (col > 0).astype(f32)
    has_n = (row < ny - 1).astype(f32)
    has_s = (row > 0).astype(f32)
    # pinned cell 0: its neighbors exclude it from gradient stencils
    has_w_g = has_w.copy(); has_w_g[0, 1] = 0.0
    has_s_g = has_s.copy(); has_s_g[1, 0] = 0.0
    pin = np.ones((ny, nx), f32); pin[0, 0] = 0.0

    # boundary-face constants: conductance 2*D on each wall row/col and the
    # Dirichlet source 2*D*bc (zero except the lid row for u)
    Dxc = mu * dy / dx
    Dyc = mu * dx / dy
    aP_bc = np.zeros((ny, nx), f32)
    aP_bc[:, 0] += 2 * Dxc
    aP_bc[:, -1] += 2 * Dxc
    aP_bc[0, :] += 2 * Dyc
    aP_bc[-1, :] += 2 * Dyc
    bc_u_lid = np.asarray(ops.bc_u_n, f32)
    b_bc_u = np.zeros((ny, nx), f32)
    b_bc_u[-1, :] = 2 * Dyc * bc_u_lid

    # FD-ghost gradient boundary sources (conserved quantities): the u-ghost
    # at the lid uses the CONSTANT lid velocity (fv.fd_vorticity note)
    lid_const = float(params.lid_velocity)
    two_bc_u_n = np.zeros((ny, nx), f32)
    two_bc_u_n[-1, :] = 2.0 * lid_const

    # direct pressure solve operators (symmetric eigh: V orthogonal)
    P = ops.poisson
    mats = {
        "has_e": has_e, "has_w": has_w, "has_n": has_n, "has_s": has_s,
        "has_w_g": has_w_g, "has_s_g": has_s_g, "pin": pin,
        "aP_bc": aP_bc, "b_bc_u": b_bc_u, "two_bc_u_n": two_bc_u_n,
        "V1": np.asarray(P.Vx, f32), "V2": np.asarray(P.Vy, f32),
        "inv_lam": np.asarray(P.inv_lam, f32),
        "A1": np.asarray(P.Ax, f32), "A2": np.asarray(P.Ay, f32),
    }
    scal = np.array([[mu, dx, dy, float(ops.alpha_uv), float(ops.alpha_p),
                      float(np.asarray(ops.rho)), lid_const, 0.0]], f32)
    return {k: jnp.asarray(v) for k, v in mats.items()}, jnp.asarray(scal)


def _validate(params, ops: FVOps, max_n: int):
    nx, ny = int(params.nx), int(params.ny)
    if max(nx, ny) > max_n:
        raise ValueError(f"fused FV kernel supports N <= {max_n} "
                         f"(got {max(nx, ny)})")
    if str(ops.limiter or "").lower() == "muscl-sharp":
        raise ValueError("MUSCL-sharp stays on the XLA path")
    if str(ops.rhie_chow) != "compact":
        raise ValueError("fused FV step implements rhie_chow=compact")


def _make_iterate(g, scal_ref, scheme_upwind: bool, K: int, n_ref: int):
    """One SIMPLE iteration over VALUE arrays (shared by step/chunk kernels).

    ``g`` are the static VMEM refs; returns
    ``iterate(u, v, p, mx, my) -> (u, v, p, mx, my, metrics_vec)``.
    """
    mu = scal_ref[0, 0]
    dx = scal_ref[0, 1]
    dy = scal_ref[0, 2]
    alpha_uv = scal_ref[0, 3]
    alpha_p = scal_ref[0, 4]
    rho = scal_ref[0, 5]
    vol = dx * dy
    Dxc = mu * dy / dx
    Dyc = mu * dx / dy

    has_e = g["has_e"][:]
    has_w = g["has_w"][:]
    has_n = g["has_n"][:]
    has_s = g["has_s"][:]
    pin = g["pin"][:]

    def cell_gradient(phi):
        """Unlimited central gradient with pinned cell 0 (fv_stencils)."""
        e = _shift_e(phi)
        w = _shift_w(phi)
        n_ = _shift_n(phi)
        s = _shift_s(phi)
        hw = g["has_w_g"][:]
        hs = g["has_s_g"][:]
        sum_x = has_e * (e - phi) / dx + hw * (phi - w) / dx
        cnt_x = has_e + hw
        gx = jnp.where(cnt_x > 0, sum_x / jnp.maximum(cnt_x, 1.0), 0.0)
        sum_y = has_n * (n_ - phi) / dy + hs * (phi - s) / dy
        cnt_y = has_n + hs
        gy = jnp.where(cnt_y > 0, sum_y / jnp.maximum(cnt_y, 1.0), 0.0)
        return gx * pin, gy * pin

    def divergence(fx, fy):
        return (fx - _shift_w(fx) * has_w + fy - _shift_s(fy) * has_s)

    def psolve(f):
        fhat = _mm(_mm(g["V1"][:].T, f), g["V2"][:])
        return _mm(_mm(g["V1"][:], fhat * g["inv_lam"][:]), g["V2"][:].T)

    def fd_grad(f, two_bc):
        """FD ghost gradient: ghost = 2*bc - interior (base.py:379-430).

        ``two_bc`` carries 2*bc as a full array (zero except where the
        boundary value is nonzero, i.e. the lid row for u).
        """
        e = _shift_e(f)
        w = _shift_w(f)
        n_ = _shift_n(f)
        s = _shift_s(f)
        # interior: (E - W)/2dx; west wall: (E - (2bc - P))/2dx; east wall:
        # ((2bc - P) - W)/2dx. All our side bcs are zero.
        dfdx = jnp.where(
            has_w > 0,
            jnp.where(has_e > 0, (e - w) / (2 * dx), ((-f) - w) / (2 * dx)),
            (e + f) / (2 * dx))
        dfdy = jnp.where(
            has_s > 0,
            jnp.where(has_n > 0, (n_ - s) / (2 * dy),
                      ((two_bc - f) - s) / (2 * dy)),
            (n_ + f) / (2 * dy))
        return dfdx, dfdy

    def iterate(u, v, p, mx, my):
        gpx, gpy = cell_gradient(p)

        # momentum coefficients (shared by u and v)
        mx_pos = jnp.maximum(mx, 0.0)
        mx_neg = jnp.maximum(-mx, 0.0)
        my_pos = jnp.maximum(my, 0.0)
        my_neg = jnp.maximum(-my, 0.0)
        aE = -(mx_neg + Dxc) * has_e
        aW = -(_shift_w(mx_pos) + Dxc) * has_w
        aN = -(my_neg + Dyc) * has_n
        aS = -(_shift_s(my_pos) + Dyc) * has_s
        aP = ((mx_pos + Dxc) * has_e + (_shift_w(mx_neg) + Dxc) * has_w
              + (my_pos + Dyc) * has_n + (_shift_s(my_neg) + Dyc) * has_s
              + g["aP_bc"][:])

        def deferred(phi):
            if scheme_upwind:
                return jnp.zeros_like(phi)
            # With psi == 1 the face source m*(up + (down-up)/2) - m*up
            # = m*(down-up)/2 equals |m|*(N-P)/2 for BOTH flux signs
            # (down-up flips sign with m), P = phi, N = E(phi).
            e = _shift_e(phi)
            dc_x = 0.5 * jnp.abs(mx) * (e - phi) * has_e
            n_ = _shift_n(phi)
            dc_y = 0.5 * jnp.abs(my) * (n_ - phi) * has_n
            # scatter: b[P] -= dc, b[N] += dc
            return (-dc_x + _shift_w(dc_x) * has_w
                    - dc_y + _shift_s(dc_y) * has_s)

        b_u = g["b_bc_u"][:] + deferred(u) - gpx * vol
        b_v = deferred(v) - gpy * vol

        # joint u/v BiCGSTAB (fixed K iterations, Jacobi preconditioner)
        aP_rel = aP / alpha_uv
        scale = (1.0 - alpha_uv) / alpha_uv
        rhs_u = b_u + scale * aP * u
        rhs_v = b_v + scale * aP * v

        def A(x):
            return (aP_rel * x + aE * _shift_e(x) + aW * _shift_w(x)
                    + aN * _shift_n(x) + aS * _shift_s(x))

        def M(x):
            return x / aP_rel

        def dot2(a1, a2, b1, b2):
            return jnp.sum(a1 * b1) + jnp.sum(a2 * b2)

        eps = jnp.float32(1e-30)
        x1, x2 = u, v
        r1 = rhs_u - A(x1)
        r2 = rhs_v - A(x2)
        rh1, rh2 = r1, r2
        rho_k = jnp.float32(1.0)
        alpha_k = jnp.float32(1.0)
        omega_k = jnp.float32(1.0)
        pv1 = jnp.zeros_like(x1)
        pv2 = jnp.zeros_like(x2)
        vv1 = jnp.zeros_like(x1)
        vv2 = jnp.zeros_like(x2)
        # Fixed-count iterations must freeze once converged: at ||r|| ~ f32
        # zero, omega -> 0 and the beta = (rho1/rho)(alpha/omega) update
        # blows up (the classic BiCGSTAB breakdown a tolerance exit avoids).
        rhs_nrm2 = dot2(rhs_u, rhs_v, rhs_u, rhs_v) + eps

        def bicg_iter(_i, carry):
            x1, x2, r1, r2, pv1, pv2, vv1, vv2, rho_k, alpha_k, omega_k = carry
            active = dot2(r1, r2, r1, r2) > jnp.float32(1e-16) * rhs_nrm2

            def sel(new, old):
                return jnp.where(active, new, old)

            rho1 = sel(dot2(rh1, rh2, r1, r2), rho_k)
            beta = (rho1 / (rho_k + eps)) * (alpha_k / (omega_k + eps))
            pv1 = sel(r1 + beta * (pv1 - omega_k * vv1), pv1)
            pv2 = sel(r2 + beta * (pv2 - omega_k * vv2), pv2)
            ph1 = M(pv1)
            ph2 = M(pv2)
            vv1 = sel(A(ph1), vv1)
            vv2 = sel(A(ph2), vv2)
            alpha_k = sel(rho1 / (dot2(rh1, rh2, vv1, vv2) + eps), alpha_k)
            s1 = r1 - alpha_k * vv1
            s2 = r2 - alpha_k * vv2
            sh1 = M(s1)
            sh2 = M(s2)
            t1 = A(sh1)
            t2 = A(sh2)
            omega_new = dot2(t1, t2, s1, s2) / (dot2(t1, t2, t1, t2) + eps)
            omega_k = sel(omega_new, omega_k)
            x1 = sel(x1 + alpha_k * ph1 + omega_k * sh1, x1)
            x2 = sel(x2 + alpha_k * ph2 + omega_k * sh2, x2)
            r1 = sel(s1 - omega_k * t1, r1)
            r2 = sel(s2 - omega_k * t2, r2)
            return (x1, x2, r1, r2, pv1, pv2, vv1, vv2,
                    rho1, alpha_k, omega_k)

        # fori_loop (not a Python unroll) so the compiler's live set is ONE
        # iteration's temporaries — the unrolled form OOMed scoped VMEM at
        # N=160+ in the chunk kernel
        x1, x2, r1, r2, *_rest = jax.lax.fori_loop(
            0, K, bicg_iter,
            (x1, x2, r1, r2, pv1, pv2, vv1, vv2, rho_k, alpha_k, omega_k))
        u_star, v_star = x1, x2

        # Rhie-Chow face velocities + mdot*
        Du = vol / (aP + 1e-14)
        ubar_x = 0.5 * (u_star + _shift_e(u_star))
        vbar_y = 0.5 * (v_star + _shift_n(v_star))
        dpdx_face = (_shift_e(p) - p) / dx
        dpdy_face = (_shift_n(p) - p) / dy
        De = 0.5 * (Du + _shift_e(Du))
        Dn = 0.5 * (Du + _shift_n(Du))
        gpx_f = 0.5 * (gpx + _shift_e(gpx))
        gpy_f = 0.5 * (gpy + _shift_n(gpy))
        Uf_x = (ubar_x - De * (dpdx_face - gpx_f)) * has_e
        Uf_y = (vbar_y - Dn * (dpdy_face - gpy_f)) * has_n
        mx_star = rho * Uf_x * dy
        my_star = rho * Uf_y * dx

        # pressure correction: direct tensor solve + refinement
        rhs_p = -divergence(mx_star, my_star)
        rhs_p = rhs_p - jnp.mean(rhs_p)
        p_prime = psolve(rhs_p)
        for _ in range(n_ref):
            res = rhs_p - (_mm(g["A1"][:], p_prime)
                           + _mm(p_prime, g["A2"][:].T))
            res = res - jnp.mean(res)
            p_prime = p_prime + psolve(res)
        p_prime = p_prime - p_prime[0, 0]

        # corrections
        gppx, gppy = cell_gradient(p_prime)
        u_prime = -Du * gppx
        v_prime = -Du * gppy
        u_new = u_star + u_prime
        v_new = v_star + v_prime
        p_new = p + alpha_p * p_prime
        mx_new = mx_star + rho * 0.5 * (u_prime + _shift_e(u_prime)) \
            * dy * has_e
        my_new = my_star + rho * 0.5 * (v_prime + _shift_n(v_prime)) \
            * dx * has_n

        # metrics
        mass = divergence(mx_new, my_new)
        zero_bc = jnp.zeros_like(u)
        dvdx, _ = fd_grad(v_new, zero_bc)
        _, dudy = fd_grad(u_new, g["two_bc_u_n"][:])
        omega = dvdx - dudy
        dwx, dwy = fd_grad(omega, zero_bc)
        dA = dx * dy
        metrics = jnp.stack([
            jnp.sqrt(jnp.sum(u_prime * u_prime)),
            jnp.sqrt(jnp.sum(v_prime * v_prime)),
            jnp.sqrt(jnp.sum(mass * mass)),
            0.5 * jnp.sum(u_new * u_new + v_new * v_new) * dA,
            0.5 * jnp.sum(omega * omega) * dA,
            0.5 * jnp.sum(dwx * dwx + dwy * dwy) * dA,
        ])
        return u_new, v_new, p_new, mx_new, my_new, metrics

    return iterate


def _pad_state(state: FVState, ny, nx, f32=jnp.float32):
    mx = jnp.zeros((ny, nx), f32).at[:, :nx - 1].set(state.mx.astype(f32))
    my = jnp.zeros((ny, nx), f32).at[:ny - 1, :].set(state.my.astype(f32))
    return (state.u.astype(f32), state.v.astype(f32), state.p.astype(f32),
            mx, my)


def make_pallas_fv_step(params, ops: FVOps, bicgstab_iters: int = 16,
                        interpret: bool = False):
    """Build ``step(state) -> (state, metrics)``, one kernel per iteration."""
    _validate(params, ops, MAX_FV_STEP_N)
    nx, ny = int(params.nx), int(params.ny)
    scheme_upwind = str(ops.scheme).lower() == "upwind"
    mats, scal = _build_statics(params, ops)
    mat_names = list(mats)
    n_mats = len(mat_names)
    f32 = jnp.float32

    def kernel(*args):
        g = dict(zip(mat_names, args[:n_mats]))
        (u_ref, v_ref, p_ref, mx_ref, my_ref, scal_ref,
         u_out, v_out, p_out, mx_out, my_out, metrics_out) = args[n_mats:]
        iterate = _make_iterate(g, scal_ref, scheme_upwind,
                                int(bicgstab_iters), int(ops.n_refine))
        u, v, p, mx, my, metrics = iterate(
            u_ref[:], v_ref[:], p_ref[:], mx_ref[:], my_ref[:])
        u_out[:] = u
        v_out[:] = v
        p_out[:] = p
        mx_out[:] = mx
        my_out[:] = my
        metrics_out[0, :] = metrics

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=tuple([jax.ShapeDtypeStruct((ny, nx), f32)] * 5
                        + [jax.ShapeDtypeStruct((1, N_METRICS), f32)]),
        in_specs=[vmem() for _ in range(n_mats + 5)]
        + [pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=tuple([vmem()] * 6),
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]

    def step(state: FVState):
        u, v, p, mx, my = _pad_state(state, ny, nx)
        u, v, p, mx, my, m = call(*mat_list, u, v, p, mx, my, scal)
        new_state = FVState(u=u, v=v, p=p, mx=mx[:, :nx - 1],
                            my=my[:ny - 1, :])
        metrics = {
            "u_eq": m[0, 0], "v_eq": m[0, 1], "continuity": m[0, 2],
            "energy": m[0, 3], "enstrophy": m[0, 4], "palinstrophy": m[0, 5],
        }
        return new_state, metrics

    return step


def make_pallas_fv_chunk_runner(params, ops: FVOps, chunk: int,
                                tolerance: float, warmup: int,
                                bicgstab_iters: int = 16,
                                interpret: bool = False):
    """Drop-in for runner.make_chunk_runner: K SIMPLE iterations plus the
    convergence state machine inside ONE kernel launch (rel_iter mode).

    Contract: ``chunk_fn(state, start_iter, ref_norm) -> (state, done,
    conv_iter, converged, rows, ref_norm)``.
    """
    _validate(params, ops, MAX_FV_CHUNK_N)
    nx, ny = int(params.nx), int(params.ny)
    scheme_upwind = str(ops.scheme).lower() == "upwind"
    mats, scal = _build_statics(params, ops)
    mat_names = list(mats)
    n_mats = len(mat_names)
    f32 = jnp.float32
    chunk = int(chunk)

    def kernel(*args):
        g = dict(zip(mat_names, args[:n_mats]))
        (u_ref, v_ref, p_ref, mx_ref, my_ref, scal_ref, iscal_ref,
         u_out, v_out, p_out, mx_out, my_out, rows_out, state_out) = \
            args[n_mats:]
        iterate = _make_iterate(g, scal_ref, scheme_upwind,
                                int(bicgstab_iters), int(ops.n_refine))
        start_iter = iscal_ref[0, 0]

        def nrm(a):
            return jnp.sqrt(jnp.sum(a * a))

        def loop_body(i, carry):
            u, v, p, mx, my, done_i, conv_iter = carry
            done = done_i > 0
            idx = start_iter + i

            u_n, v_n, p_n, mx_n, my_n, m = iterate(u, v, p, mx, my)
            rel = jnp.maximum(nrm(u_n - u) / (nrm(u) + 1e-12),
                              nrm(v_n - v) / (nrm(v) + 1e-12))
            nan = jnp.float32(jnp.nan)
            row = jnp.stack([
                jnp.where(done, nan, rel),
                jnp.where(done, nan, m[0]),
                jnp.where(done, nan, m[1]),
                jnp.where(done, nan, m[2]),
                jnp.where(done, nan, m[3]),
                jnp.where(done, nan, m[4]),
                jnp.where(done, nan, m[5]),
            ]).reshape(1, N_COLS)
            rows_out[pl.ds(i, 1), :] = row

            finite = jnp.isfinite(rel)
            newly_conv = (idx >= warmup) & (rel < tolerance) & finite
            newly_div = ~finite & ~done
            now_done = done | newly_conv | newly_div
            conv_iter = jnp.where(~done & now_done, idx + 1, conv_iter)

            keep = lambda new, old: jnp.where(done, old, new)
            return (keep(u_n, u), keep(v_n, v), keep(p_n, p),
                    keep(mx_n, mx), keep(my_n, my),
                    now_done.astype(jnp.int32), conv_iter)

        init = (u_ref[:], v_ref[:], p_ref[:], mx_ref[:], my_ref[:],
                jnp.int32(0), jnp.int32(-1))
        u, v, p, mx, my, done_i, conv_iter = jax.lax.fori_loop(
            0, chunk, loop_body, init)
        u_out[:] = u
        v_out[:] = v
        p_out[:] = p
        mx_out[:] = mx
        my_out[:] = my
        state_out[0, 0] = done_i
        state_out[0, 1] = conv_iter

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=tuple([jax.ShapeDtypeStruct((ny, nx), f32)] * 5
                        + [jax.ShapeDtypeStruct((chunk, N_COLS), f32),
                           jax.ShapeDtypeStruct((1, 2), jnp.int32)]),
        in_specs=[vmem() for _ in range(n_mats + 5)]
        + [pl.BlockSpec((1, 8), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=tuple([vmem()] * 6
                        + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]

    @jax.jit
    def chunk_fn(state: FVState, start_iter, ref_norm):
        u, v, p, mx, my = _pad_state(state, ny, nx)
        iscal = jnp.asarray(start_iter, jnp.int32).reshape(1, 1)
        u, v, p, mx, my, rows, flags = call(*mat_list, u, v, p, mx, my,
                                            scal, iscal)
        new_state = FVState(u=u, v=v, p=p, mx=mx[:, :nx - 1],
                            my=my[:ny - 1, :])
        done = flags[0, 0] > 0
        conv_iter = flags[0, 1]
        converged = done & jnp.isfinite(
            rows[jnp.maximum(conv_iter - 1 - start_iter, 0), 0])
        return new_state, done, conv_iter, converged, rows, ref_norm

    return chunk_fn
