"""Optional PyVista render tier (plotting/pyvista_render.py).

pyvista is absent from this image, so these tests pin the DISPATCH
contract: matplotlib fallback when the library is missing or disabled,
and matplotlib back-fill when the PyVista path produces incomplete
artifacts (crashed/timed-out subprocess). When real pyvista is installed,
the full-render test at the bottom runs instead of skipping.
"""

import sys
import types

import numpy as np
import pytest

from anap3_tpu.plotting import pyvista_render as R


def toy_fields(n=20):
    """Flat point arrays, the load_fields_from_vts layout."""
    x = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    return {
        "x": X.ravel(), "y": Y.ravel(),
        "u": (np.sin(np.pi * X) * np.cos(np.pi * Y)).ravel(),
        "v": (-np.cos(np.pi * X) * np.sin(np.pi * Y)).ravel(),
        "pressure": 0.25 * (np.cos(2 * np.pi * X)
                            + np.cos(2 * np.pi * Y)).ravel(),
    }


class TestDispatch:
    def test_unavailable_without_import(self):
        assert "pyvista" not in sys.modules
        assert not R.pyvista_available()

    def test_env_kill_switch(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "pyvista", types.ModuleType("pv"))
        assert R.pyvista_available()
        monkeypatch.setenv("ANAP3_DISABLE_PYVISTA", "1")
        assert not R.pyvista_available()

    def test_fallback_renders_matplotlib_artifacts(self, tmp_path):
        out = R.generate_field_plots_auto(toy_fields(), tmp_path,
                                          resample_n=64)
        for name in ("u", "v", "pressure", "vel-mag", "streamlines"):
            assert name in out and out[name].exists(), name

    def test_backfill_when_pyvista_tier_incomplete(self, tmp_path,
                                                   monkeypatch):
        """A present-but-broken pyvista (the crash case the subprocess
        isolation guards) must still yield the five artifacts."""
        monkeypatch.setitem(sys.modules, "pyvista", types.ModuleType("pv"))
        calls = {}

        def broken(fields, output_dir):
            calls["pyvista"] = True
            return {}

        monkeypatch.setattr(R, "generate_field_plots_pyvista", broken)
        out = R.generate_field_plots_auto(toy_fields(), tmp_path,
                                          resample_n=64)
        assert calls.get("pyvista")
        for name in ("u", "v", "pressure", "vel-mag", "streamlines"):
            assert name in out and out[name].exists(), name

    def test_backfill_is_selective(self, tmp_path, monkeypatch):
        """One failed PyVista render must be back-filled WITHOUT
        re-rendering (overwriting) the screenshots that succeeded, and
        streamlines_3d (matplotlib-only) must always be produced."""
        monkeypatch.setitem(sys.modules, "pyvista", types.ModuleType("pv"))

        def partial(fields, output_dir):
            # simulate four successful PyVista screenshots on disk
            done = {}
            for name in ("u", "v", "pressure", "vel-mag"):
                p = tmp_path / f"{name}.png"
                p.write_bytes(b"PYVISTA")
                done[name] = p
            return done  # streamline subprocess "timed out"

        monkeypatch.setattr(R, "generate_field_plots_pyvista", partial)
        out = R.generate_field_plots_auto(toy_fields(), tmp_path,
                                          resample_n=64)
        for name in ("u", "v", "pressure", "vel-mag"):
            assert (tmp_path / f"{name}.png").read_bytes() == b"PYVISTA", \
                f"{name} was clobbered by the back-fill"
        assert out["streamlines"].exists()
        assert out["streamlines"].stat().st_size > 100
        assert "streamlines_3d" in out and out["streamlines_3d"].exists()

    def test_streamlines_3d_present_when_pyvista_complete(self, tmp_path,
                                                          monkeypatch):
        """Even a fully successful PyVista tier must not drop the
        streamlines_3d artifact (it has no PyVista counterpart here)."""
        monkeypatch.setitem(sys.modules, "pyvista", types.ModuleType("pv"))

        def complete(fields, output_dir):
            done = {}
            for name in ("u", "v", "pressure", "vel-mag", "streamlines"):
                p = tmp_path / f"{name}.png"
                p.write_bytes(b"PYVISTA")
                done[name] = p
            return done

        monkeypatch.setattr(R, "generate_field_plots_pyvista", complete)
        out = R.generate_field_plots_auto(toy_fields(), tmp_path,
                                          resample_n=64)
        assert "streamlines_3d" in out and out["streamlines_3d"].exists()
        for name in ("u", "v", "pressure", "vel-mag", "streamlines"):
            assert (tmp_path / f"{name}.png").read_bytes() == b"PYVISTA"


@pytest.mark.skipif(not R.pyvista_available(),
                    reason="pyvista not installed (optional render tier)")
class TestRealPyVista:
    def test_five_artifacts_at_reference_scale(self, tmp_path):
        out = R.generate_field_plots_pyvista(toy_fields(33), tmp_path)
        for name in ("u", "v", "pressure", "vel-mag"):
            assert out[name].exists()
        import PIL.Image

        with PIL.Image.open(out["u"]) as im:
            assert im.size == (R.WINDOW, R.WINDOW)
