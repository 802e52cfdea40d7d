"""Analytic corner-singularity fields (ops/singular.py).

Every identity is verified by central finite differences on points away from
the corners, which pins all sign conventions of the global-frame formulas:

- u = d(psi)/dy, v = -d(psi)/dx  (streamfunction consistency);
- the returned du/dx ... dv/dy match FD of the returned u, v;
- div(u_s) = 0 and omega = dv/dx - du/dy = returned omega;
- grad(omega) matches FD of omega;
- Stokes balance nu*lap(u) = grad(p) for nu = 1 (p = nu * p_over_nu);
- no-slip wall values and the sharp-lid limit; continuity of the
  subtracted boundary data at the corners.
"""

import numpy as np
import pytest

from anap3_tpu.ops.singular import (corner_coefficients, eval_singular_psi,
                                    eval_singular_uv, singular_fields_on_grid,
                                    _corner_terms)

H = 1e-6


def fd(f, x, y, axis):
    if axis == 0:
        return (f(x + H, y) - f(x - H, y)) / (2 * H)
    return (f(x, y + H) - f(x, y - H)) / (2 * H)


def corner_field(which, key):
    """Scalar-field evaluator for one corner in global coordinates."""
    signs = dict(A=(-1.0, -1.0, +1.0), B=(+1.0, +1.0, -1.0))[which]

    def f(x, y):
        if which == "A":
            xi, eta = x, 1.0 - y
        else:
            xi, eta = 1.0 - x, 1.0 - y
        t = _corner_terms(np.asarray(xi), np.asarray(eta), 1.0, *signs)
        return t[key]

    return f


# interior probe points, away from both corners
PTS = [(0.31, 0.42), (0.77, 0.15), (0.5, 0.93), (0.08, 0.6), (0.93, 0.88)]


class TestCornerSolutions:
    @pytest.mark.parametrize("which", ["A", "B"])
    def test_streamfunction_generates_velocity(self, which):
        psi = corner_field(which, "psi")
        u = corner_field(which, "u")
        v = corner_field(which, "v")
        for x, y in PTS:
            assert fd(psi, x, y, 1) == pytest.approx(u(x, y), abs=1e-7)
            assert -fd(psi, x, y, 0) == pytest.approx(v(x, y), abs=1e-7)

    @pytest.mark.parametrize("which", ["A", "B"])
    def test_velocity_gradients(self, which):
        u = corner_field(which, "u")
        v = corner_field(which, "v")
        for x, y in PTS:
            assert corner_field(which, "dudx")(x, y) == pytest.approx(
                fd(u, x, y, 0), abs=1e-6)
            assert corner_field(which, "dudy")(x, y) == pytest.approx(
                fd(u, x, y, 1), abs=1e-6)
            assert corner_field(which, "dvdx")(x, y) == pytest.approx(
                fd(v, x, y, 0), abs=1e-6)
            assert corner_field(which, "dvdy")(x, y) == pytest.approx(
                fd(v, x, y, 1), abs=1e-6)

    @pytest.mark.parametrize("which", ["A", "B"])
    def test_divergence_free_and_vorticity(self, which):
        for x, y in PTS:
            div = (corner_field(which, "dudx")(x, y)
                   + corner_field(which, "dvdy")(x, y))
            assert div == pytest.approx(0.0, abs=1e-12)
            om = (corner_field(which, "dvdx")(x, y)
                  - corner_field(which, "dudy")(x, y))
            assert om == pytest.approx(
                corner_field(which, "omega")(x, y), abs=1e-9)

    @pytest.mark.parametrize("which", ["A", "B"])
    def test_vorticity_gradient(self, which):
        om = corner_field(which, "omega")
        for x, y in PTS:
            assert corner_field(which, "dwx")(x, y) == pytest.approx(
                fd(om, x, y, 0), rel=1e-4, abs=1e-5)
            assert corner_field(which, "dwy")(x, y) == pytest.approx(
                fd(om, x, y, 1), rel=1e-4, abs=1e-5)

    @pytest.mark.parametrize("which", ["A", "B"])
    def test_stokes_balance(self, which):
        """nu lap(u) = grad(p) with nu=1: lap via FD of the velocity field."""
        u = corner_field(which, "u")
        v = corner_field(which, "v")
        p = corner_field(which, "p_over_nu")
        h = 1e-4
        for x, y in PTS:
            lap_u = (u(x + h, y) + u(x - h, y) + u(x, y + h) + u(x, y - h)
                     - 4 * u(x, y)) / h**2
            lap_v = (v(x + h, y) + v(x - h, y) + v(x, y + h) + v(x, y - h)
                     - 4 * v(x, y)) / h**2
            dpdx = (p(x + h, y) - p(x - h, y)) / (2 * h)
            dpdy = (p(x, y + h) - p(x, y - h)) / (2 * h)
            assert lap_u == pytest.approx(dpdx, rel=2e-4, abs=2e-4)
            assert lap_v == pytest.approx(dpdy, rel=2e-4, abs=2e-4)

    @pytest.mark.parametrize("which", ["A", "B"])
    def test_own_wall_boundary_conditions(self, which):
        """Each corner solution: u = U on its lid ray, no-slip on its wall."""
        u = corner_field(which, "u")
        v = corner_field(which, "v")
        for t in (0.1, 0.45, 0.9):
            assert u(t, 1.0) == pytest.approx(1.0, abs=1e-12)  # lid ray
            assert v(t, 1.0) == pytest.approx(0.0, abs=1e-12)
        xw = 0.0 if which == "A" else 1.0
        for yv in (0.2, 0.6, 0.95):
            assert u(xw, yv) == pytest.approx(0.0, abs=1e-12)
            assert v(xw, yv) == pytest.approx(0.0, abs=1e-12)


class TestCombinedFields:
    def test_coefficients(self):
        A, C, D = corner_coefficients(1.0)
        th = 0.3
        f = A * np.sin(th) + C * th * np.sin(th) + D * th * np.cos(th)
        # f(0)=0, f'(0)=-U, f(pi/2)=0, f'(pi/2)=0
        assert A + D == pytest.approx(-1.0)
        assert A + C * np.pi / 2 == pytest.approx(0.0, abs=1e-14)
        assert C - D * np.pi / 2 == pytest.approx(0.0, abs=1e-14)
        assert np.isfinite(f)

    def test_grid_layout_and_lid_row(self):
        x = np.linspace(0, 1, 9)
        y = np.linspace(0, 1, 9)
        F = singular_fields_on_grid(x, y)
        assert F["u"].shape == (9, 9)
        # lid row j = -1: both corner solutions contribute U each
        np.testing.assert_allclose(F["u"][:, -1], 2.0, atol=1e-12)
        np.testing.assert_allclose(F["v"][:, -1], 0.0, atol=1e-12)
        # psi vanishes on the lid (theta=0 ray of BOTH corners); on the other
        # walls only the adjacent corner's contribution vanishes, so the
        # streamfunction solve needs the -psi_s boundary lift
        np.testing.assert_allclose(F["psi"][:, -1], 0.0, atol=1e-12)
        assert np.max(np.abs(F["psi"][0, :])) > 0.1
        # derivative samples are finite everywhere incl. the corner nodes
        for k, a in F.items():
            assert np.all(np.isfinite(a)), k

    def test_subtracted_lid_bc_is_continuous_at_corners(self):
        """u_tilde boundary data (sharp BC minus u_s) is continuous: the lid
        row approaches U - 2U = -U, and the side walls approach -U too."""
        eps = 1e-9
        # along the lid toward corner B
        u_lid, _ = eval_singular_uv(np.array([1.0 - eps]), np.array([1.0]))
        # down the right wall toward corner B
        u_wall, _ = eval_singular_uv(np.array([1.0]), np.array([1.0 - eps]))
        bc_lid = 1.0 - u_lid[0]      # sharp lid u = U
        bc_wall = 0.0 - u_wall[0]    # no-slip wall
        assert bc_lid == pytest.approx(-1.0, abs=1e-6)
        assert bc_wall == pytest.approx(-1.0, abs=1e-6)
        # and corner A
        u_lid, _ = eval_singular_uv(np.array([eps]), np.array([1.0]))
        u_wall, _ = eval_singular_uv(np.array([0.0]), np.array([1.0 - eps]))
        assert 1.0 - u_lid[0] == pytest.approx(-1.0, abs=1e-6)
        assert 0.0 - u_wall[0] == pytest.approx(-1.0, abs=1e-6)

    def test_point_eval_matches_grid(self):
        x = np.array([0.3, 0.8])
        y = np.array([0.4, 0.9])
        F = singular_fields_on_grid(x, y)
        u, v = eval_singular_uv(*np.meshgrid(x, y, indexing="ij"))
        np.testing.assert_allclose(u, F["u"])
        np.testing.assert_allclose(v, F["v"])
        psi = eval_singular_psi(*np.meshgrid(x, y, indexing="ij"))
        np.testing.assert_allclose(psi, F["psi"])
