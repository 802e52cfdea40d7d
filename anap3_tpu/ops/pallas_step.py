"""Fully-fused Pallas RK4 step kernel for the spectral solver.

Motivation: at N=128 one XLA RK4 step costs ~29 us while its FLOPs cost
~2.6 us — the gap is ~30 small kernel launches and HBM round-trips between
them. Every operand of the whole step fits comfortably in VMEM
(~20 x 66 KB at N=128), so the entire 4-stage update — 56 matmuls on the
MXU, boundary selects, the adaptive-CFL reduction and the residual-norm /
conserved-quantity reductions — can be ONE kernel with no intermediate HBM
traffic and one launch per timestep.

The kernel reproduces models/spectral_sg.sg_step bit-for-bit in exact
arithmetic (same operator matrices, same stage structure); float32 results
match the XLA path to roundoff. Selected via SpectralParameters.use_pallas
or directly through make_pallas_sg_step.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spectral_sg import SpectralOps, SpectralState

__all__ = ["make_pallas_sg_step", "MAX_FUSED_N"]

_RK4_ALPHAS = (0.25, 1.0 / 3.0, 0.5, 1.0)
N_METRICS = 6  # u_eq, v_eq, continuity, energy, enstrophy, palinstrophy

# Largest polynomial order whose whole-step working set fits the ~16 MB VMEM
# scoped limit (measured: N=128 uses well under; N=256 OOMs at 19.7 MB).
MAX_FUSED_N = 192


def _dot(a, b):
    # HIGHEST: multi-pass bf16 decomposition for full f32 matmul accuracy on
    # the MXU. Single-pass (DEFAULT) is ~2x faster but the ~1e-3 derivative
    # error poisons steady states at 1e-6 tolerances.
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _step_kernel(u_ref, v_ref, p_ref,
                 Dx_ref, DyT_ref, Dxx_ref, DyyT_ref,
                 Ix_ref, IyT_ref, Gx_ref, GyT_ref,
                 bc_u_ref, bc_v_ref, interior_ref, W2d_ref,
                 scal_ref,
                 u_out, v_out, p_out, metrics_out):
    """One RK4 pseudo-timestep, entirely in VMEM.

    ``scal_ref`` (SMEM, shape (1, 6)): nu, beta_sq, CFL, lid_velocity,
    inv_dx_min, inv_dy_min.
    """
    nu = scal_ref[0, 0]
    beta_sq = scal_ref[0, 1]
    cfl = scal_ref[0, 2]
    lid = scal_ref[0, 3]
    inv_dx = scal_ref[0, 4]
    inv_dy = scal_ref[0, 5]

    u0 = u_ref[:]
    v0 = v_ref[:]
    p0_full = p_ref[:]  # inner pressure pre-embedded in a zero boundary ring
    Dx = Dx_ref[:]
    DyT = DyT_ref[:]
    Dxx = Dxx_ref[:]
    DyyT = DyyT_ref[:]
    Ix = Ix_ref[:]
    IyT = IyT_ref[:]
    Gx = Gx_ref[:]
    GyT = GyT_ref[:]
    interior = interior_ref[:]
    bc_u = bc_u_ref[:]
    bc_v = bc_v_ref[:]

    # adaptive CFL timestep (sg.py:387-408)
    u_max = jnp.maximum(jnp.max(jnp.abs(u0)), lid)
    v_max = jnp.maximum(jnp.max(jnp.abs(v0)), 1e-10)
    lam_x = (u_max + jnp.sqrt(u_max * u_max + beta_sq)) * inv_dx \
        + nu * inv_dx * inv_dx
    lam_y = (v_max + jnp.sqrt(v_max * v_max + beta_sq)) * inv_dy \
        + nu * inv_dy * inv_dy
    dt = cfl / (lam_x + lam_y)

    def residuals(u, v, p):
        du_dx = _dot(Dx, u)
        du_dy = _dot(u, DyT)
        dv_dx = _dot(Dx, v)
        dv_dy = _dot(v, DyT)
        lap_u = _dot(Dxx, u) + _dot(u, DyyT)
        lap_v = _dot(Dxx, v) + _dot(v, DyyT)
        dp_dx = _dot(_dot(Gx, p), IyT)
        dp_dy = _dot(_dot(Ix, p), GyT)
        R_u = -(u * du_dx + v * du_dy) - dp_dx + nu * lap_u
        R_v = -(u * dv_dx + v * dv_dy) - dp_dy + nu * lap_v
        # inner-grid continuity residual embedded in a full-size masked array
        R_p_full = -beta_sq * (du_dx + dv_dy) * interior
        return R_u, R_v, R_p_full

    u, v = u0, v0
    p_full = p0_full

    R_u = R_v = R_p = None
    for alpha in _RK4_ALPHAS:
        R_u, R_v, R_p = residuals(u, v, p_full[1:-1, 1:-1])
        u = u0 + (alpha * dt) * R_u
        v = v0 + (alpha * dt) * R_v
        p_full = p0_full + (alpha * dt) * R_p
        u = jnp.where(interior > 0.5, u, bc_u)
        v = jnp.where(interior > 0.5, v, bc_v)

    u_out[:] = u
    v_out[:] = v
    p_out[:] = p_full

    # metrics of the last stage evaluation + conserved quantities
    W2d = W2d_ref[:]
    omega = _dot(Dx, v) - _dot(u, DyT)
    dwx = _dot(Dx, omega)
    dwy = _dot(omega, DyT)
    metrics_out[0, :] = jnp.stack([
        jnp.sqrt(jnp.sum(R_u * R_u)),
        jnp.sqrt(jnp.sum(R_v * R_v)),
        jnp.sqrt(jnp.sum(R_p * R_p)),
        0.5 * jnp.sum(W2d * (u * u + v * v)),
        0.5 * jnp.sum(W2d * omega * omega),
        0.5 * jnp.sum(W2d * (dwx * dwx + dwy * dwy)),
    ])


def make_pallas_sg_step(ops: SpectralOps, interpret: bool = False):
    """Build a drop-in replacement for core.sg_step backed by one kernel.

    The returned function has the signature ``step(state) -> (state,
    metrics_dict)`` with the same metric keys as the XLA path. float32 only
    (the MXU path); pass ``interpret=True`` to run on CPU for testing.
    """
    nf = ops.bc_u.shape[0]
    if nf - 1 > MAX_FUSED_N:
        raise ValueError(
            f"fused step kernel supports N <= {MAX_FUSED_N} (got N={nf - 1}): "
            "the whole-step working set must fit VMEM; use the XLA step")
    ni = nf - 2
    f32 = jnp.float32

    Dx = ops.Dx.astype(f32)
    DyT = ops.DyT.astype(f32)
    Dxx = ops.Dxx.astype(f32)
    DyyT = ops.DyyT.astype(f32)
    Ix = ops.Ix.astype(f32)
    IyT = ops.IyT.astype(f32)
    Gx = ops.Gx.astype(f32)
    GyT = ops.GyT.astype(f32)
    bc_u = ops.bc_u.astype(f32)
    bc_v = ops.bc_v.astype(f32)
    interior = ops.interior.astype(f32)
    W2d = ops.W2d.astype(f32)
    scal = jnp.stack([ops.nu, ops.beta_sq, ops.CFL, ops.lid_velocity,
                      ops.inv_dx_min, ops.inv_dy_min]).astype(f32).reshape(1, 6)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _step_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nf, nf), f32),
            jax.ShapeDtypeStruct((nf, nf), f32),
            jax.ShapeDtypeStruct((nf, nf), f32),
            jax.ShapeDtypeStruct((1, N_METRICS), f32),
        ),
        in_specs=[vmem() for _ in range(15)]
        + [pl.BlockSpec((1, 6), memory_space=pltpu.SMEM)],
        out_specs=(vmem(), vmem(), vmem(), vmem()),
        interpret=interpret,
    )

    def step(state: SpectralState):
        # embed the inner pressure in a zero boundary ring OUTSIDE the kernel
        # (Mosaic has no dynamic_update_slice); pad/slice fuse into the
        # surrounding XLA program at negligible cost
        p_pad = jnp.pad(state.p.astype(f32), 1)
        u, v, p_full, m = call(
            state.u.astype(f32), state.v.astype(f32), p_pad,
            Dx, DyT, Dxx, DyyT, Ix, IyT, Gx, GyT,
            bc_u, bc_v, interior, W2d, scal,
        )
        p = p_full[1:-1, 1:-1]
        metrics = {
            "u_eq": m[0, 0], "v_eq": m[0, 1], "continuity": m[0, 2],
            "energy": m[0, 3], "enstrophy": m[0, 4], "palinstrophy": m[0, 5],
        }
        return SpectralState(u=u, v=v, p=p), metrics

    return step
