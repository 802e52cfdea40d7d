"""Native (C++) runtime components, loaded via ctypes.

Builds ``csrc/*.cpp`` on first use with g++ into ``build/native/`` and binds
the C ABI. Every consumer has a pure-Python fallback, so a missing toolchain
degrades gracefully (SURVEY §2.4: the reference's native tier must become
real compiled code, but the framework must still run without it).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)

__all__ = ["vts_codec", "build_native"]

_REPO = Path(__file__).resolve().parents[2]
_BUILD = _REPO / "build" / "native"
_CACHE = {}


def build_native(name: str, sources, extra_flags=()) -> Optional[Path]:
    """Compile a shared library from csrc/ if stale; return its path."""
    _BUILD.mkdir(parents=True, exist_ok=True)
    out = _BUILD / f"lib{name}.so"
    srcs = [_REPO / "csrc" / s for s in sources]
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime
                            for s in srcs):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(out)] + \
        [str(s) for s in srcs] + list(extra_flags)
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=120)
        log.info("Built native library %s", out.name)
        return out
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", "") or str(exc)
        log.warning("Native build of %s failed (%s); using Python fallback",
                    name, detail.strip()[:300])
        return None


class _VtsCodec:
    """ctypes binding for csrc/vts_codec.cpp."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.vts_encode.restype = ctypes.c_longlong
        lib.vts_encode.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                   ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_longlong]
        lib.vts_decode.restype = ctypes.c_longlong
        lib.vts_decode.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                   ctypes.c_char_p, ctypes.c_longlong]
        lib.vts_decoded_size.restype = ctypes.c_longlong
        lib.vts_decoded_size.argtypes = [ctypes.c_char_p, ctypes.c_longlong]

    def encode(self, data: bytes, level: int = 5) -> str:
        cap = 4 * ((len(data) + 64 + 2) // 3) + 64
        buf = ctypes.create_string_buffer(cap)
        n = self._lib.vts_encode(data, len(data), level, buf, cap)
        if n < 0:
            cap = -n + 8
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.vts_encode(data, len(data), level, buf, cap)
            if n < 0:
                raise RuntimeError("vts_encode failed")
        return buf.raw[:n].decode("ascii")

    def decode(self, text: str) -> bytes:
        raw = text.encode("ascii")
        size = self._lib.vts_decoded_size(raw, len(raw))
        if size < 0:
            raise ValueError("corrupt VTS payload header")
        buf = ctypes.create_string_buffer(max(int(size), 1))
        n = self._lib.vts_decode(raw, len(raw), buf, size)
        if n < 0:
            raise ValueError("corrupt VTS payload")
        return buf.raw[:n]


def vts_codec() -> Optional[_VtsCodec]:
    """The native codec, or None when unavailable."""
    if "vts" not in _CACHE:
        lib_path = build_native("vtscodec", ["vts_codec.cpp"], ["-lz"])
        if lib_path is None:
            _CACHE["vts"] = None
        else:
            try:
                _CACHE["vts"] = _VtsCodec(ctypes.CDLL(str(lib_path)))
            except OSError as exc:
                log.warning("Failed to load native VTS codec: %s", exc)
                _CACHE["vts"] = None
    return _CACHE["vts"]
