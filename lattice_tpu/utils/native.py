"""ctypes bindings for the C++ host kernels (native/lattice_native.cpp).

pybind11 is not available in this environment, so the native library exposes
a C ABI and this module is the typed Python face. The shared object is built
on demand with g++ the first time it is needed and cached next to the
source; every caller degrades gracefully to the pure-Python implementation
when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "lattice_native.cpp"
_SO = _NATIVE_DIR / "liblattice_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    if not _SRC.is_file():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as exc:
        logger.debug("native build failed: %s", exc)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _SO.is_file() and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as exc:
            logger.debug("native load failed: %s", exc)
            _load_failed = True
            return None
        lib.lattice_sha256_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.lattice_sha256_file.restype = ctypes.c_int
        lib.lattice_sha256_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p]
        lib.lattice_sha256_bytes.restype = ctypes.c_int
        lib.lattice_bpe_create.argtypes = [ctypes.c_char_p]
        lib.lattice_bpe_create.restype = ctypes.c_void_p
        lib.lattice_bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.lattice_bpe_count.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
        lib.lattice_bpe_count.restype = ctypes.c_int64
        _lib = lib
        return _lib


def sha256_file(path: str) -> str | None:
    """Hex digest of a file via the C++ kernel; None -> caller falls back."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(65)
    rc = lib.lattice_sha256_file(path.encode("utf-8"), out)
    if rc != 0:
        return None
    return out.value.decode("ascii")


def sha256_bytes(data: bytes) -> str | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(65)
    lib.lattice_sha256_bytes(data, len(data), out)
    return out.value.decode("ascii")


class BPECounter:
    """Token counter over a local merges.txt (tiktoken replacement)."""

    def __init__(self, merges_path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.lattice_bpe_create(merges_path.encode("utf-8"))
        if not self._handle:
            raise RuntimeError(f"cannot load merges from {merges_path}")

    def count(self, text: str) -> int:
        data = text.encode("utf-8")
        return int(self._lib.lattice_bpe_count(self._handle, data, len(data)))

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            try:
                self._lib.lattice_bpe_destroy(handle)
            except Exception:
                pass
            self._handle = None
