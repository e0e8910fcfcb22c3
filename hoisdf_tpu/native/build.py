"""Build the native pipeline shared library with plain g++.

pybind11 is not in this image, so the binding layer is ctypes
(hoisdf_tpu/native/__init__.py); this module only owns compilation:
``ensure_built()`` compiles ``src/pipeline.cc`` into
``_build/libhoisdf_pipeline.so`` iff the source is newer than the binary
(mtime + size stamp), and returns the .so path — or ``None`` when the
toolchain or the jpeg/png dev headers are unavailable, in which case the
data pipeline silently falls back to the pure-PIL path (identical bits,
see tests/test_native_pipeline.py).
"""

from __future__ import annotations

import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "src", "pipeline.cc")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SO = os.path.join(_BUILD_DIR, "libhoisdf_pipeline.so")
_STAMP = os.path.join(_BUILD_DIR, "stamp.txt")
_CXX = os.environ.get("CXX", "g++")
_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-fno-math-errno"]
_LIBS = ["-ljpeg", "-lpng", "-lz"]

_lock = threading.Lock()
_cached: "str | None | bool" = False  # False = not attempted yet


def _stamp() -> str:
    st = os.stat(_SRC)
    return f"{st.st_mtime_ns}:{st.st_size}:{_CXX}:{' '.join(_FLAGS)}"


def ensure_built(verbose: bool = False) -> "str | None":
    """Compile if stale; return the .so path or None if unavailable."""
    global _cached
    with _lock:
        if _cached is not False:
            return _cached  # type: ignore[return-value]
        if os.environ.get("HOISDF_DISABLE_NATIVE"):
            _cached = None
            return None
        try:
            if os.path.exists(_SO) and os.path.exists(_STAMP):
                with open(_STAMP) as f:
                    if f.read() == _stamp():
                        _cached = _SO
                        return _SO
            os.makedirs(_BUILD_DIR, exist_ok=True)
            # cross-PROCESS safety (multi-host dryrun, process-mode loader
            # workers): serialize on an flock, re-check staleness inside,
            # and publish via atomic rename so no reader ever dlopens a
            # half-written .so.
            import fcntl

            with open(os.path.join(_BUILD_DIR, ".lock"), "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                try:
                    if os.path.exists(_SO) and os.path.exists(_STAMP):
                        with open(_STAMP) as f:
                            if f.read() == _stamp():
                                _cached = _SO
                                return _SO
                    tmp = _SO + f".tmp.{os.getpid()}"
                    cmd = [_CXX, *_FLAGS, _SRC, "-o", tmp, *_LIBS]
                    res = subprocess.run(
                        cmd, capture_output=True, text=True, timeout=300
                    )
                    if res.returncode != 0:
                        if verbose:
                            print(f"[hoisdf native] build failed:\n{res.stderr}")
                        _cached = None
                        return None
                    os.replace(tmp, _SO)
                    with open(_STAMP, "w") as f:
                        f.write(_stamp())
                finally:
                    fcntl.flock(lockf, fcntl.LOCK_UN)
            _cached = _SO
            return _SO
        except (OSError, subprocess.SubprocessError) as e:  # no toolchain etc.
            if verbose:
                print(f"[hoisdf native] build unavailable: {e}")
            _cached = None
            return None


if __name__ == "__main__":
    path = ensure_built(verbose=True)
    print(path or "BUILD FAILED")
