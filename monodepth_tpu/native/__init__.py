"""Native (C++) host-pipeline bindings via ctypes.

Builds `libmdt_host.so` from host_pipeline.cc on first use (g++ -O3,
links system libjpeg) and exposes `decode_resize(path, h, w, flip)`.
ctypes releases the GIL for the duration of the call, so the Python
loader's thread pool scales decode across host cores — the role the
reference delegated to 12 forked DataLoader workers
(reference: model_tool/loader.py:60-61).

If the toolchain or libjpeg is unavailable the import still succeeds and
`available()` returns False; the dataset falls back to PIL.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_pipeline.cc")


def _host_key() -> str:
    """Cache key for the host's CPU microarchitecture. The .so is built
    with -march=native; a checkout shared across heterogeneous hosts
    (NFS, container image reuse) must not load another host's binary or
    it can SIGILL on unsupported instructions. Keyed on the CPU feature
    flags (the instruction-set surface -march=native compiles against),
    not the model name — identical-flag hosts share the artifact."""
    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        # No readable /proc/cpuinfo (hardened container, non-Linux):
        # platform.processor() is often "" or a generic "x86_64" — NOT
        # ISA-discriminating, so hashing it would let two hosts with
        # different instruction sets share one -march=native binary
        # (the SIGILL this key exists to prevent). Key on the hostname
        # instead: it disables cross-host sharing rather than colliding.
        feat += f" no-cpu-flags {platform.node()}"
    return hashlib.sha1(feat.encode()).hexdigest()[:12]


def _lib_dir() -> str:
    """Where the built .so lives: next to the source in a checkout, or a
    per-user cache dir when the package is installed read-only
    (pip install into site-packages)."""
    if os.access(_DIR, os.W_OK):
        return _DIR
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    d = os.path.join(base, "monodepth_tpu")
    os.makedirs(d, exist_ok=True)
    return d


_LIB = os.path.join(_lib_dir(), f"libmdt_host-{_host_key()}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # pid-suffixed temp so concurrent builders never clobber each other
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        # TimeoutExpired carries stderr=None when the process wrote nothing
        stderr = getattr(e, "stderr", None) or b""
        print(f">>> native host pipeline build failed ({e}); "
              f"falling back to PIL. {stderr[:500]!r}")
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.mdt_decode_resize.restype = ctypes.c_int
        lib.mdt_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize(path: str, height: int, width: int,
                  flip: bool = False) -> np.ndarray:
    """JPEG file -> [height, width, 3] uint8 RGB (Lanczos, optional
    horizontal flip). Raises RuntimeError on decode failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host pipeline unavailable")
    with open(path, "rb") as f:
        data = f.read()
    out = np.empty((height, width, 3), dtype=np.uint8)
    rc = lib.mdt_decode_resize(
        data, len(data), height, width, int(flip),
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError(f"jpeg decode failed: {path}")
    return out
