"""Vectorized structured-grid stencil kernels for the FV-SIMPLE solver.

TPU-native replacement for the reference's unstructured face-list Numba
kernels (src/solvers/fv/{assembly,discretization,core}): on the uniform
Cartesian grid the reference actually builds (simple_structured.py:148-312),
owner/neighbor face loops reduce to shifted-array arithmetic that XLA fuses
into a handful of VPU kernels. Conventions:

- cell arrays have shape (ny, nx), index [j, i] (y slow, x fast), cell id
  j*nx + i — identical to the reference cell ordering;
- x-faces sit between (j, i) and (j, i+1): arrays (ny, nx-1), positive flux
  = +x direction (owner = left cell);
- y-faces sit between (j, i) and (j+1, i): arrays (ny-1, nx), positive flux
  = +y direction (owner = bottom cell);
- boundary mass fluxes are identically zero for the cavity (all walls have
  u·n = 0), so boundary faces only contribute diffusion.

Reference quirks reproduced deliberately:
- every gradient call pins cell 0 (grad = 0 there, and neighbors exclude it
  from both the difference stencil and the limiter;
  structured_gradient.py:11-140 with default pinned_idx=0);
- ``bold_D`` uses the UNRELAXED momentum diagonal (fv/solver.py:150-168
  captures A.diagonal() before Patankar relaxation).

Deliberate improvements (documented divergences):
- the TVD limiter argument r uses the true second-upstream neighbor where it
  exists; the reference's linear extrapolation (upwind.py:30-46) makes r == 1
  identically, i.e. plain central deferred correction. Passing
  ``limiter=None`` with scheme="TVD" reproduces the reference behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "cell_gradient",
    "momentum_coefficients",
    "deferred_correction",
    "face_average_x",
    "face_average_y",
    "divergence_from_fluxes",
    "apply_momentum_operator",
]


def _shift_pad(a, axis, direction):
    """Neighbor values along ±axis with zero padding (mask separately)."""
    if axis == 1 and direction == +1:   # east neighbor
        return jnp.pad(a[:, 1:], ((0, 0), (0, 1)))
    if axis == 1 and direction == -1:   # west neighbor
        return jnp.pad(a[:, :-1], ((0, 0), (1, 0)))
    if axis == 0 and direction == +1:   # north neighbor
        return jnp.pad(a[1:, :], ((0, 1), (0, 0)))
    if axis == 0 and direction == -1:   # south neighbor
        return jnp.pad(a[:-1, :], ((1, 0), (0, 0)))
    raise ValueError


def _neighbor_masks(shape, dtype, pin_cell0: bool):
    """Validity masks for E/W/N/S neighbors, excluding the pinned cell."""
    ny, nx = shape
    has_e = jnp.ones((ny, nx), dtype).at[:, -1].set(0)
    has_w = jnp.ones((ny, nx), dtype).at[:, 0].set(0)
    has_n = jnp.ones((ny, nx), dtype).at[-1, :].set(0)
    has_s = jnp.ones((ny, nx), dtype).at[0, :].set(0)
    if pin_cell0:
        # neighbors of the pinned cell (0,0) skip it: cell (0,1) has no west,
        # cell (1,0) has no south
        has_w = has_w.at[0, 1].set(0)
        has_s = has_s.at[1, 0].set(0)
    return has_e, has_w, has_n, has_s


def cell_gradient(phi: jnp.ndarray, dx: float, dy: float,
                  use_limiter: bool = True, pin_cell0: bool = True):
    """Central-difference cell gradients with optional Barth-Jespersen limiter.

    Vectorized equivalent of compute_cell_gradients_structured
    (structured_gradient.py:11-140): one-sided at walls, averaged where both
    neighbors exist, pinned cell zeroed and excluded from neighbor stencils.
    Returns (ddx, ddy) with the limiter applied to both components.
    """
    dt = phi.dtype
    has_e, has_w, has_n, has_s = _neighbor_masks(phi.shape, dt, pin_cell0)
    phi_e = _shift_pad(phi, 1, +1)
    phi_w = _shift_pad(phi, 1, -1)
    phi_n = _shift_pad(phi, 0, +1)
    phi_s = _shift_pad(phi, 0, -1)

    sum_x = has_e * (phi_e - phi) / dx + has_w * (phi - phi_w) / dx
    cnt_x = has_e + has_w
    gx = jnp.where(cnt_x > 0, sum_x / jnp.maximum(cnt_x, 1), 0.0)
    sum_y = has_n * (phi_n - phi) / dy + has_s * (phi - phi_s) / dy
    cnt_y = has_n + has_s
    gy = jnp.where(cnt_y > 0, sum_y / jnp.maximum(cnt_y, 1), 0.0)

    if use_limiter:
        big = jnp.asarray(jnp.finfo(dt).max, dt)
        neg = -big
        cand_max = jnp.stack([
            jnp.where(has_e > 0, phi_e, neg), jnp.where(has_w > 0, phi_w, neg),
            jnp.where(has_n > 0, phi_n, neg), jnp.where(has_s > 0, phi_s, neg),
            phi[None][0] * jnp.ones_like(phi),
        ])
        cand_min = jnp.stack([
            jnp.where(has_e > 0, phi_e, big), jnp.where(has_w > 0, phi_w, big),
            jnp.where(has_n > 0, phi_n, big), jnp.where(has_s > 0, phi_s, big),
            phi[None][0] * jnp.ones_like(phi),
        ])
        umax = jnp.max(cand_max, axis=0)
        umin = jnp.min(cand_min, axis=0)

        def face_ratio(mask, delta):
            pos = delta > 1e-20
            negd = delta < -1e-20
            r = jnp.where(pos, (umax - phi) / jnp.where(pos, delta, 1.0), 1.0)
            r = jnp.where(negd, (umin - phi) / jnp.where(negd, delta, 1.0), r)
            return jnp.where(mask > 0, r, 1.0)

        lim = jnp.ones_like(phi)
        for mask, ddx, ddy in ((has_e, dx, 0.0), (has_w, -dx, 0.0),
                               (has_n, 0.0, dy), (has_s, 0.0, -dy)):
            lim = jnp.minimum(lim, face_ratio(mask, gx * ddx + gy * ddy))
        active = (umax > phi) | (umin < phi)
        lim = jnp.where(active, lim, 1.0)
        gx = lim * gx
        gy = lim * gy

    if pin_cell0:
        gx = gx.at[0, 0].set(0.0)
        gy = gy.at[0, 0].set(0.0)
    return gx, gy


class MomentumCoeffs(NamedTuple):
    """5-point stencil coefficients and the convection-free RHS part.

    aP includes boundary diffusion; aE/aW/aN/aS are the off-diagonal
    coefficients (zero where the neighbor does not exist). ``b`` carries the
    boundary Dirichlet contributions and the deferred-correction source.
    """

    aP: jnp.ndarray
    aE: jnp.ndarray
    aW: jnp.ndarray
    aN: jnp.ndarray
    aS: jnp.ndarray
    b: jnp.ndarray


def momentum_coefficients(mx, my, mu, dx, dy, bc_w, bc_e, bc_s, bc_n):
    """Assemble upwind + diffusion stencil coefficients (Moukalled 15.72 form).

    ``mx``/``my``: internal-face mass fluxes; ``bc_*``: Dirichlet boundary
    values of the transported component along each wall (vectors of length ny
    for w/e, nx for s/n). Matches convection_diffusion_matrix.py:15-124 on the
    uniform grid.
    """
    ny, nx = mx.shape[0], my.shape[1]
    dt = mx.dtype
    Dx = mu * dy / dx
    Dy = mu * dx / dy

    mx_pos = jnp.maximum(mx, 0.0)   # (ny, nx-1)
    mx_neg = jnp.maximum(-mx, 0.0)
    my_pos = jnp.maximum(my, 0.0)   # (ny-1, nx)
    my_neg = jnp.maximum(-my, 0.0)

    # face coefficient of the DOWNSTREAM-side unknown, from the owner's view:
    #   owner equation:    aP += max(m,0)+D ; aE = -max(-m,0)-D
    #   neighbor equation: aP += max(-m,0)+D ; aW = -max(m,0)-D
    aE = jnp.zeros((ny, nx), dt).at[:, :-1].set(-(mx_neg + Dx))
    aW = jnp.zeros((ny, nx), dt).at[:, 1:].set(-(mx_pos + Dx))
    aN = jnp.zeros((ny, nx), dt).at[:-1, :].set(-(my_neg + Dy))
    aS = jnp.zeros((ny, nx), dt).at[1:, :].set(-(my_pos + Dy))

    aP = jnp.zeros((ny, nx), dt)
    aP = aP.at[:, :-1].add(mx_pos + Dx)
    aP = aP.at[:, 1:].add(mx_neg + Dx)
    aP = aP.at[:-1, :].add(my_pos + Dy)
    aP = aP.at[1:, :].add(my_neg + Dy)

    # boundary faces: half-cell diffusion distance => conductance 2*D
    # (d_Cb = dx/2; convection flux is zero at all cavity walls)
    b = jnp.zeros((ny, nx), dt)
    aP = aP.at[:, 0].add(2.0 * Dx)
    b = b.at[:, 0].add(2.0 * Dx * bc_w)
    aP = aP.at[:, -1].add(2.0 * Dx)
    b = b.at[:, -1].add(2.0 * Dx * bc_e)
    aP = aP.at[0, :].add(2.0 * Dy)
    b = b.at[0, :].add(2.0 * Dy * bc_s)
    aP = aP.at[-1, :].add(2.0 * Dy)
    b = b.at[-1, :].add(2.0 * Dy * bc_n)
    return MomentumCoeffs(aP=aP, aE=aE, aW=aW, aN=aN, aS=aS, b=b)


def _muscl(r):
    """Symmetric MUSCL limiter psi(r) = max(0, min(2, 2r, (1+r)/2)) for r>0."""
    return jnp.where(
        r > 0.0,
        jnp.maximum(0.0, jnp.minimum(jnp.minimum(2.0, 2.0 * r),
                                     0.5 * (1.0 + r))),
        0.0,
    )


def deferred_correction(phi, mx, my, scheme: str = "TVD",
                        limiter: str | None = "MUSCL"):
    """Per-cell deferred-correction source from high-order convection.

    convDC = m*(phi_HO - phi_upwind) per face, scattered with opposite signs
    into owner (-) and neighbor (+) RHS (convection_diffusion_matrix.py:96-98).

    Limiter modes:
    - None: psi == 1 (pure central deferred correction);
    - "MUSCL" (default): the reference formulation — the upstream-upstream
      value is LINEARLY EXTRAPOLATED, phi_W = 2*phi_up - phi_down
      (upwind.py:30-46), which makes r = (down-up)/(down-up+eps) ~= 1 and so
      psi ~= 1; kept for parity and because it converges cleanly at steady
      state;
    - "MUSCL-sharp": the true second-upstream neighbor where it exists. A
      genuinely limited scheme — sharper on under-resolved fronts, but the
      limiter switching can limit-cycle in steady SIMPLE iterations, so use
      with looser tolerances.
    """
    if scheme.lower() == "upwind":
        return jnp.zeros_like(phi)
    sharp = limiter is not None and str(limiter).lower() == "muscl-sharp"

    def face_dc(m, up, down, upup_valid, upup):
        if limiter is None:
            psi = jnp.ones_like(up)
        else:
            if sharp:
                denom = jnp.where(upup_valid, up - upup, down - up) + 1e-12
            else:
                # reference extrapolation: phi_W = 2*up - down
                denom = (down - up) + 1e-12
            r = (down - up) / denom
            psi = _muscl(r)
        return m * (up + 0.5 * psi * (down - up)) - m * up

    # x-faces between (j,i) and (j,i+1)
    P = phi[:, :-1]
    N = phi[:, 1:]
    pos = mx >= 0
    up = jnp.where(pos, P, N)
    down = jnp.where(pos, N, P)
    # upstream-upstream: W of P when m>=0, E of N when m<0
    W = jnp.pad(phi[:, :-2], ((0, 0), (1, 0)))       # aligned with P index i
    has_W = jnp.zeros_like(pos).at[:, 1:].set(True)
    E2 = jnp.pad(phi[:, 2:], ((0, 0), (0, 1)))       # aligned with N index i+1
    has_E2 = jnp.zeros_like(pos).at[:, :-1].set(True)
    upup = jnp.where(pos, W, E2)
    upup_valid = jnp.where(pos, has_W, has_E2)
    dc_x = face_dc(mx, up, down, upup_valid, upup)

    # y-faces between (j,i) and (j+1,i)
    P = phi[:-1, :]
    N = phi[1:, :]
    pos = my >= 0
    up = jnp.where(pos, P, N)
    down = jnp.where(pos, N, P)
    S = jnp.pad(phi[:-2, :], ((1, 0), (0, 0)))
    has_S = jnp.zeros_like(pos).at[1:, :].set(True)
    N2 = jnp.pad(phi[2:, :], ((0, 1), (0, 0)))
    has_N2 = jnp.zeros_like(pos).at[:-1, :].set(True)
    upup = jnp.where(pos, S, N2)
    upup_valid = jnp.where(pos, has_S, has_N2)
    dc_y = face_dc(my, up, down, upup_valid, upup)

    # scatter: b[P] -= dc, b[N] += dc
    b = jnp.zeros_like(phi)
    b = b.at[:, :-1].add(-dc_x)
    b = b.at[:, 1:].add(dc_x)
    b = b.at[:-1, :].add(-dc_y)
    b = b.at[1:, :].add(dc_y)
    return b


def face_average_x(c: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of a cell field to internal x-faces (g = 1/2)."""
    return 0.5 * (c[:, :-1] + c[:, 1:])


def face_average_y(c: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (c[:-1, :] + c[1:, :])


def divergence_from_fluxes(mx: jnp.ndarray, my: jnp.ndarray) -> jnp.ndarray:
    """Per-cell divergence of internal-face fluxes (boundary fluxes are zero).

    Matches divergence.py:5-25 with the structured owner/neighbor layout.
    """
    ny, nx = mx.shape[0], my.shape[1]
    div = jnp.zeros((ny, nx), mx.dtype)
    div = div.at[:, :-1].add(mx)     # flux leaves owner
    div = div.at[:, 1:].add(-mx)     # flux enters neighbor
    div = div.at[:-1, :].add(my)
    div = div.at[1:, :].add(-my)
    return div


def apply_momentum_operator(coeffs: MomentumCoeffs, phi: jnp.ndarray,
                            aP_override: jnp.ndarray | None = None) -> jnp.ndarray:
    """Matrix-free A @ phi for the 5-point momentum stencil."""
    aP = coeffs.aP if aP_override is None else aP_override
    out = aP * phi
    out = out + coeffs.aE * _shift_pad(phi, 1, +1)
    out = out + coeffs.aW * _shift_pad(phi, 1, -1)
    out = out + coeffs.aN * _shift_pad(phi, 0, +1)
    out = out + coeffs.aS * _shift_pad(phi, 0, -1)
    return out
