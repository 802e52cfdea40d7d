"""Lane-batched fused FV-SIMPLE chunk kernel.

B sweep lanes (same grid/scheme; per-lane Re, relaxation factors, rho and
lid profile) run their whole SIMPLE chunk plus the convergence state
machine inside ONE Pallas program, with lane states row-stacked as
(B*ny, nx) — the FV counterpart of ops/pallas_lanes_aligned.py.

Why: the B=1 chunk kernel is LATENCY-bound, not compute-bound. The round-5
FV roofline (bench._fv_flop_model, STATUS.md) measured 5.3 us fixed +
1.20 us per BiCGSTAB iteration at N=128 against a 0.11 us flop bound: the
binding constraint is the dependency chain of ~170 serialized full-array
reductions per SIMPLE iteration (momentum inner products, norms, metrics)
whose pipeline-drain latency a single 128x128 solve cannot hide. Stacking
B lanes makes each link of that chain serve every lane at once (the B
per-lane slice reductions inside one link are mutually independent and
overlap), so per-iteration latency stays near-flat in B and AGGREGATE
sweep throughput scales toward Bx — the same amortization the spectral
lane tier applies to launch/sync latency.

Numerics per lane are the B=1 kernel's (ops/pallas_fv.py, itself matching
models/fv.fv_step; reference src/solvers/fv/solver.py:170-257): per-lane
reductions run over each lane's contiguous (ny, nx) row block with the
same shapes and summation order as B=1, per-lane scalars broadcast
through (B*ny, 1) columns, and matmul row/column blocks are independent.
The same f32 expressions evaluated on the stacked shapes can fuse
multiply-adds differently than on (ny, nx), so per-lane results agree
with B=1 to fp rounding (measured 1-2 ulp/iteration in interpret mode)
rather than bit-exactly; tests/test_pallas_fv_lanes.py pins the per-step
agreement tolerance and the converged-state/flag equivalence.

Lane isolation: y-shifts cross lane boundaries in the stacked layout, so
every shifted-operand product is a ``jnp.where`` on the per-lane wall
masks instead of a mask multiply — for finite values the two are
bit-identical (mask is exactly 0/1), but the select also stops a
diverging lane's transient Inf/NaN intermediates from leaking into its
row-neighbors through ``0 * NaN`` (divergence handling parity with the
reference's multigrid/fsg.py:1184-1190 lane tolerance).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fv import FVOps, FVState
from .pallas_fv import (_shift_e, _shift_w, _shift_n, _shift_s, _mm,
                        _build_statics, MAX_FV_CHUNK_N, N_COLS)

__all__ = ["make_fv_lane_runner", "fv_lanes_supported",
           "suggest_fv_lane_count", "maybe_fv_lane_runner"]

# VMEM lane budget: 5 state arrays + 3 per-lane BC fields + 7 tiled masks
# + ~12 BiCGSTAB-carry temporaries + ~12 stage temporaries, all (ny, nx)
# f32 per lane (~39 units), against the raised 100 MB vmem_limit_bytes
# with headroom for the compiler stack. N=128 B=8 measured working.
_VMEM_BUDGET_BYTES = 72 * 2**20
_UNITS_PER_LANE = 39.0


def suggest_fv_lane_count(n: int, requested: int) -> int:
    """Largest B <= requested whose working set fits the VMEM budget."""
    npad = -(-int(n) // 128) * 128
    unit = n * npad * 4
    fit = max(1, int(_VMEM_BUDGET_BYTES / (_UNITS_PER_LANE * unit)))
    return max(1, min(int(requested), fit))


def _validate_fv_lanes(params_list, ops_list) -> None:
    """Lanes must share the grid, scheme and solver structure; only
    mu/alpha_uv/alpha_p/rho and the lid profile may vary per lane."""
    p0, o0 = params_list[0], ops_list[0]
    for k, (p, o) in enumerate(zip(params_list[1:], ops_list[1:]), 1):
        if (int(p.nx), int(p.ny)) != (int(p0.nx), int(p0.ny)):
            raise ValueError(f"lane {k} grid differs from lane 0")
        if int(getattr(p, "fv_inner_iters", 16)) \
                != int(getattr(p0, "fv_inner_iters", 16)):
            raise ValueError(
                f"lane {k} fv_inner_iters differs from lane 0: the "
                "lane-batched BiCGSTAB runs one shared inner count")
        for name in ("dx", "dy", "scheme", "limiter", "rhie_chow",
                     "n_refine"):
            if np.asarray(getattr(o, name)).tolist() \
                    != np.asarray(getattr(o0, name)).tolist():
                raise ValueError(
                    f"lane {k} FV op {name!r} differs from lane 0: "
                    "lane-batched FV kernels need a shared discretization")
    if str(o0.rhie_chow) != "compact":
        raise ValueError("fused FV lane kernel implements rhie_chow=compact")
    if str(o0.limiter or "").lower() == "muscl-sharp":
        raise ValueError("MUSCL-sharp stays on the XLA path")


def fv_lanes_supported(params_list, ops_list) -> bool:
    """True when the FV lane kernel covers this batch."""
    n = max(int(params_list[0].nx), int(params_list[0].ny))
    if n > MAX_FV_CHUNK_N:
        return False
    try:
        _validate_fv_lanes(params_list, ops_list)
    except ValueError:
        return False
    return suggest_fv_lane_count(n, len(params_list)) >= len(params_list)


def maybe_fv_lane_runner(params_list, ops_list, mesh=None, log=None):
    """Factory ``(chunk, tol, warmup) -> chunk_fn`` when the FV lane kernel
    covers this batch, else None (callers fall back to the vmapped XLA
    path). Covers: single device (no mesh), TPU float32 with ``use_pallas``
    not disabled, shared discretization, N within the kernel/VMEM budget.
    Mirrors ops/pallas_lanes.maybe_lane_runner for the spectral tier.
    """
    import jax as _jax

    p0 = params_list[0]
    flag = str(getattr(p0, "use_pallas", "auto")).lower()
    if mesh is not None or flag in ("false", "0", "no"):
        return None
    if flag not in ("true", "1", "yes") and (
            _jax.default_backend() != "tpu"
            or jnp.dtype(p0.dtype) != jnp.float32):
        return None
    if not fv_lanes_supported(params_list, ops_list):
        if log is not None:
            log.info("FV lane kernel unavailable for this batch "
                     "(size/VMEM/discretization); using the vmapped XLA "
                     "path")
        return None
    if log is not None:
        log.info("Lane-batched FV kernel: %d lanes of %dx%d in one Pallas "
                 "program", len(params_list), int(p0.nx), int(p0.ny))
    k_inner = int(getattr(p0, "fv_inner_iters", 16))
    return lambda chunk, tol, warmup: make_fv_lane_runner(
        params_list, ops_list, chunk, tol, warmup,
        bicgstab_iters=k_inner)


def make_fv_lane_runner(params_list, ops_list, chunk: int, tolerance: float,
                        warmup: int, bicgstab_iters: int = 16,
                        interpret: bool = False):
    """Build the fused B-lane FV chunk function.

    Contract (parallel/sweep.py run_batched_sweep chunk_runner):
    ``chunk_fn(states, start_iter) -> (states, done, conv_iter, ever_conv,
    rows)`` with batched ``states`` (leading axis B), per-lane flags of
    shape (B,), and ``rows`` (chunk, B, N_COLS) in runner.METRIC_KEYS
    order.
    """
    B = len(params_list)
    if B < 1:
        raise ValueError("need at least one lane")
    _validate_fv_lanes(params_list, ops_list)
    nx, ny = int(params_list[0].nx), int(params_list[0].ny)
    BN = B * ny
    scheme_upwind = str(ops_list[0].scheme).lower() == "upwind"
    K = int(bicgstab_iters)
    n_ref = int(ops_list[0].n_refine)
    chunk = int(chunk)
    f32 = jnp.float32

    # host prep per lane via the B=1 statics builder (bit-identical
    # constants); shared operators come from lane 0, per-lane fields stack
    preps = [_build_statics(p, o) for p, o in zip(params_list, ops_list)]
    mats0, _ = preps[0]
    _SHARED = ("V1", "V2", "A1", "A2")          # (ny, ny) operator mats
    _TILED = ("has_e", "has_w", "has_n", "has_s", "has_w_g", "has_s_g",
              "pin", "inv_lam")                  # identical per lane
    _PER_LANE = ("aP_bc", "b_bc_u", "two_bc_u_n")  # mu/lid dependent
    mats = {k: mats0[k] for k in _SHARED}
    for k in _TILED:
        mats[k] = jnp.asarray(np.tile(np.asarray(mats0[k], np.float32),
                                      (B, 1)))
    for k in _PER_LANE:
        mats[k] = jnp.concatenate([p[0][k] for p in preps], axis=0)
    mat_names = list(mats)
    n_mats = len(mat_names)
    # per-lane SMEM scalar rows, the B=1 layout [mu, dx, dy, alpha_uv,
    # alpha_p, rho, lid, 0]: derived per-lane scalars (Dxc, (1-a)/a, ...)
    # are computed IN-KERNEL in f32 exactly as the B=1 kernel computes
    # them, preserving bit parity
    scal = jnp.concatenate([p[1] for p in preps], axis=0)  # (B, 8)

    RW = max(128, -(-8 * B // 128) * 128)

    def lane(b):
        return slice(b * ny, (b + 1) * ny)

    def kernel(*args):
        g = dict(zip(mat_names, args[:n_mats]))
        (u_ref, v_ref, p_ref, mx_ref, my_ref, scal_ref, iscal_ref,
         u_out, v_out, p_out, mx_out, my_out, rows_out, state_out) = \
            args[n_mats:]
        dx = scal_ref[0, 1]
        dy = scal_ref[0, 2]
        vol = dx * dy
        start_iter = iscal_ref[0, 0]

        has_e = g["has_e"][:]
        has_w = g["has_w"][:]
        has_n = g["has_n"][:]
        has_s = g["has_s"][:]
        pin = g["pin"][:]

        def lane_col(vals):
            """(BN, 1) broadcast column from B per-lane scalars."""
            return jnp.concatenate(
                [jnp.full((ny, 1), vals[b], f32) for b in range(B)])

        # per-lane derived scalars, computed in f32 exactly as B=1 does
        mu_b = [scal_ref[b, 0] for b in range(B)]
        auv_b = [scal_ref[b, 3] for b in range(B)]
        DXC = lane_col([m * dy / dx for m in mu_b])
        DYC = lane_col([m * dx / dy for m in mu_b])
        AUV = lane_col(auv_b)
        SCALE = lane_col([(1.0 - a) / a for a in auv_b])
        ALPHAP = lane_col([scal_ref[b, 4] for b in range(B)])
        RHO = lane_col([scal_ref[b, 5] for b in range(B)])

        def sel_n(expr):
            """has_n-masked value: a SELECT, so a row-neighbor lane's
            transient NaN cannot leak through 0 * NaN (B=1 parity: the
            mask is exactly 0/1, so select == multiply for finite
            values)."""
            return jnp.where(has_n > 0, expr, 0.0)

        def sel_s(expr):
            return jnp.where(has_s > 0, expr, 0.0)

        def cell_gradient(phi):
            """Unlimited central gradient with pinned cell 0."""
            e = _shift_e(phi)
            w = _shift_w(phi)
            n_ = _shift_n(phi)
            s = _shift_s(phi)
            hw = g["has_w_g"][:]
            hs = g["has_s_g"][:]
            sum_x = has_e * (e - phi) / dx + hw * (phi - w) / dx
            cnt_x = has_e + hw
            gx = jnp.where(cnt_x > 0, sum_x / jnp.maximum(cnt_x, 1.0), 0.0)
            sum_y = sel_n((n_ - phi) / dy) \
                + jnp.where(hs > 0, (phi - s) / dy, 0.0)
            cnt_y = has_n + hs
            gy = jnp.where(cnt_y > 0, sum_y / jnp.maximum(cnt_y, 1.0), 0.0)
            return gx * pin, gy * pin

        def divergence(fx, fy):
            return (fx - _shift_w(fx) * has_w + fy - sel_s(_shift_s(fy)))

        def psolve(f):
            """Per-lane left dots (row blocks are independent — bit-equal
            to B=1), batched rights."""
            fhat = jnp.concatenate(
                [_mm(g["V1"][:].T, f[lane(b), :]) for b in range(B)], axis=0)
            fhat = _mm(fhat, g["V2"][:]) * g["inv_lam"][:]
            out = jnp.concatenate(
                [_mm(g["V1"][:], fhat[lane(b), :]) for b in range(B)], axis=0)
            return _mm(out, g["V2"][:].T)

        def fd_grad(f, two_bc):
            e = _shift_e(f)
            w = _shift_w(f)
            n_ = _shift_n(f)
            s = _shift_s(f)
            dfdx = jnp.where(
                has_w > 0,
                jnp.where(has_e > 0, (e - w) / (2 * dx),
                          ((-f) - w) / (2 * dx)),
                (e + f) / (2 * dx))
            dfdy = jnp.where(
                has_s > 0,
                jnp.where(has_n > 0, (n_ - s) / (2 * dy),
                          ((two_bc - f) - s) / (2 * dy)),
                (n_ + f) / (2 * dy))
            return dfdx, dfdy

        def lane_sums(d):
            """Per-lane full-block sums — same shape/order as B=1's
            jnp.sum over its (ny, nx) array."""
            return tuple(jnp.sum(d[lane(b), :]) for b in range(B))

        def iterate(u, v, p, mx, my):
            gpx, gpy = cell_gradient(p)

            mx_pos = jnp.maximum(mx, 0.0)
            mx_neg = jnp.maximum(-mx, 0.0)
            my_pos = jnp.maximum(my, 0.0)
            my_neg = jnp.maximum(-my, 0.0)
            aE = -(mx_neg + DXC) * has_e
            aW = -(_shift_w(mx_pos) + DXC) * has_w
            aN = -sel_n(my_neg + DYC)
            aS = -sel_s(_shift_s(my_pos) + DYC)
            aP = ((mx_pos + DXC) * has_e
                  + (_shift_w(mx_neg) + DXC) * has_w
                  + sel_n(my_pos + DYC)
                  + sel_s(_shift_s(my_neg) + DYC)
                  + g["aP_bc"][:])

            def deferred(phi):
                if scheme_upwind:
                    return jnp.zeros_like(phi)
                e = _shift_e(phi)
                dc_x = 0.5 * jnp.abs(mx) * (e - phi) * has_e
                n_ = _shift_n(phi)
                dc_y = sel_n(0.5 * jnp.abs(my) * (n_ - phi))
                return (-dc_x + _shift_w(dc_x) * has_w
                        - dc_y + sel_s(_shift_s(dc_y)))

            b_u = g["b_bc_u"][:] + deferred(u) - gpx * vol
            b_v = deferred(v) - gpy * vol

            aP_rel = aP / AUV
            rhs_u = b_u + SCALE * aP * u
            rhs_v = b_v + SCALE * aP * v

            def A(x):
                return (aP_rel * x + aE * _shift_e(x) + aW * _shift_w(x)
                        + sel_n(aN * _shift_n(x)) + sel_s(aS * _shift_s(x)))

            def M(x):
                return x / aP_rel

            def dot2(a1, a2, b1, b2):
                """Per-lane (B,) tuple of sum(a1*b1) + sum(a2*b2)."""
                s1 = lane_sums(a1 * b1)
                s2 = lane_sums(a2 * b2)
                return tuple(s1[b] + s2[b] for b in range(B))

            eps = jnp.float32(1e-30)
            x1, x2 = u, v
            r1 = rhs_u - A(x1)
            r2 = rhs_v - A(x2)
            rh1, rh2 = r1, r2
            one_t = tuple(jnp.float32(1.0) for _ in range(B))
            pv1 = jnp.zeros_like(x1)
            pv2 = jnp.zeros_like(x2)
            vv1 = jnp.zeros_like(x1)
            vv2 = jnp.zeros_like(x2)
            rhs_nrm2 = tuple(
                d + eps for d in dot2(rhs_u, rhs_v, rhs_u, rhs_v))

            def bicg_iter(_i, carry):
                (x1, x2, r1, r2, pv1, pv2, vv1, vv2,
                 rho_k, alpha_k, omega_k) = carry
                rr = dot2(r1, r2, r1, r2)
                active = tuple(
                    rr[b] > jnp.float32(1e-16) * rhs_nrm2[b]
                    for b in range(B))
                act_col = lane_col([jnp.where(a, 1.0, 0.0) for a in active])

                def sel_s_(new, old):
                    return tuple(jnp.where(active[b], new[b], old[b])
                                 for b in range(B))

                def sel_v(new, old):
                    return jnp.where(act_col > 0.5, new, old)

                rho1 = sel_s_(dot2(rh1, rh2, r1, r2), rho_k)
                beta = tuple(
                    (rho1[b] / (rho_k[b] + eps))
                    * (alpha_k[b] / (omega_k[b] + eps)) for b in range(B))
                beta_c = lane_col(beta)
                omega_c = lane_col(omega_k)
                pv1 = sel_v(r1 + beta_c * (pv1 - omega_c * vv1), pv1)
                pv2 = sel_v(r2 + beta_c * (pv2 - omega_c * vv2), pv2)
                ph1 = M(pv1)
                ph2 = M(pv2)
                vv1 = sel_v(A(ph1), vv1)
                vv2 = sel_v(A(ph2), vv2)
                den = dot2(rh1, rh2, vv1, vv2)
                alpha_k = sel_s_(
                    tuple(rho1[b] / (den[b] + eps) for b in range(B)),
                    alpha_k)
                alpha_c = lane_col(alpha_k)
                s1 = r1 - alpha_c * vv1
                s2 = r2 - alpha_c * vv2
                sh1 = M(s1)
                sh2 = M(s2)
                t1 = A(sh1)
                t2 = A(sh2)
                ts = dot2(t1, t2, s1, s2)
                tt = dot2(t1, t2, t1, t2)
                omega_k = sel_s_(
                    tuple(ts[b] / (tt[b] + eps) for b in range(B)),
                    omega_k)
                omega_c2 = lane_col(omega_k)
                x1 = sel_v(x1 + alpha_c * ph1 + omega_c2 * sh1, x1)
                x2 = sel_v(x2 + alpha_c * ph2 + omega_c2 * sh2, x2)
                r1 = sel_v(s1 - omega_c2 * t1, r1)
                r2 = sel_v(s2 - omega_c2 * t2, r2)
                return (x1, x2, r1, r2, pv1, pv2, vv1, vv2,
                        rho1, alpha_k, omega_k)

            x1, x2, r1, r2, *_rest = jax.lax.fori_loop(
                0, K, bicg_iter,
                (x1, x2, r1, r2, pv1, pv2, vv1, vv2,
                 one_t, one_t, one_t))
            u_star, v_star = x1, x2

            # Rhie-Chow face velocities + mdot*
            Du = vol / (aP + 1e-14)
            ubar_x = 0.5 * (u_star + _shift_e(u_star))
            dpdx_face = (_shift_e(p) - p) / dx
            De = 0.5 * (Du + _shift_e(Du))
            gpx_f = 0.5 * (gpx + _shift_e(gpx))
            Uf_x = (ubar_x - De * (dpdx_face - gpx_f)) * has_e
            Uf_y = sel_n(0.5 * (v_star + _shift_n(v_star))
                         - 0.5 * (Du + _shift_n(Du))
                         * ((_shift_n(p) - p) / dy
                            - 0.5 * (gpy + _shift_n(gpy))))
            mx_star = RHO * Uf_x * dy
            my_star = RHO * Uf_y * dx

            # pressure correction: direct tensor solve + refinement
            rhs_p = -divergence(mx_star, my_star)
            n_cells = jnp.float32(ny * nx)
            rhs_p = rhs_p - lane_col(
                [s / n_cells for s in lane_sums(rhs_p)])
            p_prime = psolve(rhs_p)
            for _ in range(n_ref):
                res = rhs_p - (
                    jnp.concatenate(
                        [_mm(g["A1"][:], p_prime[lane(b), :])
                         for b in range(B)], axis=0)
                    + _mm(p_prime, g["A2"][:].T))
                res = res - lane_col(
                    [s / n_cells for s in lane_sums(res)])
                p_prime = p_prime + psolve(res)
            p_prime = p_prime - lane_col(
                [p_prime[b * ny, 0] for b in range(B)])

            # corrections
            gppx, gppy = cell_gradient(p_prime)
            u_prime = -Du * gppx
            v_prime = -Du * gppy
            u_new = u_star + u_prime
            v_new = v_star + v_prime
            p_new = p + ALPHAP * p_prime
            mx_new = mx_star + RHO * 0.5 * (u_prime + _shift_e(u_prime)) \
                * dy * has_e
            my_new = my_star + sel_n(
                RHO * 0.5 * (v_prime + _shift_n(v_prime)) * dx)

            # metrics (per-lane)
            mass = divergence(mx_new, my_new)
            zero_bc = jnp.zeros_like(u)
            dvdx, _ = fd_grad(v_new, zero_bc)
            _, dudy = fd_grad(u_new, g["two_bc_u_n"][:])
            omega = dvdx - dudy
            dwx, dwy = fd_grad(omega, zero_bc)
            dA = dx * dy
            up2 = lane_sums(u_prime * u_prime)
            vp2 = lane_sums(v_prime * v_prime)
            m2 = lane_sums(mass * mass)
            ke = lane_sums(u_new * u_new + v_new * v_new)
            om2 = lane_sums(omega * omega)
            pal = lane_sums(dwx * dwx + dwy * dwy)
            metrics = tuple(
                (jnp.sqrt(up2[b]), jnp.sqrt(vp2[b]), jnp.sqrt(m2[b]),
                 0.5 * ke[b] * dA, 0.5 * om2[b] * dA, 0.5 * pal[b] * dA)
                for b in range(B))
            return u_new, v_new, p_new, mx_new, my_new, metrics

        def loop_body(i, carry):
            u, v, p, mx, my, done_t, conv_t = carry
            idx = start_iter + i

            u_n, v_n, p_n, mx_n, my_n, m = iterate(u, v, p, mx, my)
            du2 = [jnp.sum((u_n[lane(b), :] - u[lane(b), :]) ** 2)
                   for b in range(B)]
            dv2 = [jnp.sum((v_n[lane(b), :] - v[lane(b), :]) ** 2)
                   for b in range(B)]
            un2 = [jnp.sum(u[lane(b), :] ** 2) for b in range(B)]
            vn2 = [jnp.sum(v[lane(b), :] ** 2) for b in range(B)]

            nan = jnp.float32(jnp.nan)
            lane_octets = []
            new_done, new_conv = [], []
            for b in range(B):
                done_b = done_t[b] > 0
                rel = jnp.maximum(
                    jnp.sqrt(du2[b]) / (jnp.sqrt(un2[b]) + 1e-12),
                    jnp.sqrt(dv2[b]) / (jnp.sqrt(vn2[b]) + 1e-12))
                vals = (rel,) + m[b] + (jnp.float32(0.0),)
                octet = jnp.stack(
                    [jnp.where(done_b, nan, val) for val in vals]
                ).reshape(1, 8)
                lane_octets.append(octet)

                finite = jnp.isfinite(rel)
                newly_conv = (idx >= warmup) & (rel < tolerance) & finite
                newly_div = ~finite & ~done_b
                now_done = done_b | newly_conv | newly_div
                new_conv.append(jnp.where(~done_b & now_done, idx + 1,
                                          conv_t[b]))
                new_done.append(now_done.astype(jnp.int32))
            if RW > 8 * B:
                lane_octets.append(jnp.zeros((1, RW - 8 * B), f32))
            rows_out[pl.ds(i, 1), :] = jnp.concatenate(lane_octets, axis=1)

            done_col = lane_col([jnp.where(done_t[b] > 0, 1.0, 0.0)
                                 for b in range(B)])
            keep = lambda new, old: jnp.where(done_col > 0.5, old, new)
            return (keep(u_n, u), keep(v_n, v), keep(p_n, p),
                    keep(mx_n, mx), keep(my_n, my),
                    tuple(new_done), tuple(new_conv))

        init = (u_ref[:], v_ref[:], p_ref[:], mx_ref[:], my_ref[:],
                tuple(jnp.int32(0) for _ in range(B)),
                tuple(jnp.int32(-1) for _ in range(B)))
        u, v, p, mx, my, done_t, conv_t = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk), loop_body, init)
        u_out[:] = u
        v_out[:] = v
        p_out[:] = p
        mx_out[:] = mx
        my_out[:] = my
        for b in range(B):
            state_out[0, b] = done_t[b]
            state_out[0, B + b] = conv_t[b]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=tuple([jax.ShapeDtypeStruct((BN, nx), f32)] * 5
                        + [jax.ShapeDtypeStruct((chunk, RW), f32),
                           jax.ShapeDtypeStruct((1, 2 * B), jnp.int32)]),
        in_specs=[vmem() for _ in range(n_mats + 5)]
        + [pl.BlockSpec((B, 8), memory_space=pltpu.SMEM),
           pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=tuple([vmem()] * 6
                        + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20) if not interpret else None),
        interpret=interpret,
    )
    mat_list = [mats[k] for k in mat_names]

    @jax.jit
    def chunk_fn(states: FVState, start_iter):
        # (B, ny, nx) state -> row-stacked (B*ny, nx); mx/my padded
        # per lane exactly as the B=1 _pad_state
        u = states.u.astype(f32).reshape(BN, nx)
        v = states.v.astype(f32).reshape(BN, nx)
        p = states.p.astype(f32).reshape(BN, nx)
        mx = jnp.pad(states.mx.astype(f32),
                     ((0, 0), (0, 0), (0, 1))).reshape(BN, nx)
        my = jnp.pad(states.my.astype(f32),
                     ((0, 0), (0, 1), (0, 0))).reshape(BN, nx)
        iscal = jnp.asarray(start_iter, jnp.int32).reshape(1, 1)
        u, v, p, mx, my, rows, flags = call(*mat_list, u, v, p, mx, my,
                                            scal, iscal)
        new_states = FVState(
            u=u.reshape(B, ny, nx), v=v.reshape(B, ny, nx),
            p=p.reshape(B, ny, nx),
            mx=mx.reshape(B, ny, nx)[:, :, :nx - 1],
            my=my.reshape(B, ny, nx)[:, :ny - 1, :])
        done = flags[0, :B] > 0
        conv_iter = flags[0, B:]
        rows_b = jnp.stack(
            [rows[:, b * 8: b * 8 + N_COLS] for b in range(B)], axis=1)
        conv_row = jnp.maximum(conv_iter - 1 - start_iter, 0)
        ever_conv = done & jnp.isfinite(
            rows_b[conv_row, jnp.arange(B), 0])
        return new_states, done, conv_iter, ever_conv, rows_b

    return chunk_fn
