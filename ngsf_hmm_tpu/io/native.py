"""ctypes binding for the native IO core (native/ngsf_io.cpp).

Loads ``native/libngsf_io.so``, building it with the native Makefile on
first use if a compiler is available. ``available()`` gates the fast
path; the NumPy readers in readers.py are the fallback and oracle.
Errors surface as ValueError with the reference's message strings.

Disable with NGSF_NO_NATIVE=1 (e.g. to force the oracle path).
"""

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libngsf_io.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("NGSF_NO_NATIVE") == "1":
            return None
        src = _NATIVE_DIR / "ngsf_io.cpp"
        stale = (
            _LIB_PATH.exists() and src.exists()
            and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
        )
        if (stale or not _LIB_PATH.exists()) and (
            _NATIVE_DIR / "Makefile"
        ).exists():
            if stale:
                try:
                    _LIB_PATH.unlink()
                except OSError:
                    pass
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    capture_output=True,
                    check=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError, OSError):
                return None
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        u64, i32 = ctypes.c_uint64, ctypes.c_int
        dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.ngsf_read_geno_binary.argtypes = [
            ctypes.c_char_p, u64, u64, i32, dptr, ctypes.c_char_p, ctypes.c_size_t]
        lib.ngsf_read_geno_text.argtypes = [
            ctypes.c_char_p, u64, u64, i32, i32, dptr, ctypes.c_char_p,
            ctypes.c_size_t]
        lib.ngsf_read_pos_dist.argtypes = [
            ctypes.c_char_p, u64, dptr, ctypes.c_char_p, ctypes.c_size_t]
        lib.ngsf_read_geno_binary_slab.argtypes = [
            ctypes.c_char_p, u64, u64, u64, u64, u64, u64, i32, dptr,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.ngsf_read_geno_text_slab.argtypes = [
            ctypes.c_char_p, u64, u64, u64, u64, u64, u64, i32, i32, dptr,
            ctypes.c_char_p, ctypes.c_size_t]
        fns = [lib.ngsf_read_geno_binary, lib.ngsf_read_geno_text,
               lib.ngsf_read_pos_dist, lib.ngsf_read_geno_binary_slab,
               lib.ngsf_read_geno_text_slab]
        i64 = ctypes.c_longlong
        try:
            lib.ngsf_vexp.argtypes = [dptr, dptr, i64]
            lib.ngsf_vlog.argtypes = [dptr, dptr, i64]
            fns += [lib.ngsf_vexp, lib.ngsf_vlog]
        except AttributeError:  # stale .so without the libm helpers
            pass
        for f in fns:
            f.restype = i32
        _lib = lib
        return _lib


def available():
    return _load() is not None


def _libm_elementwise(fn_name, math_fn, x):
    """Elementwise glibc transcendental: bit-identical to the reference
    binary's libm calls (numpy's/XLA's vectorised f64 kernels differ by
    1 ulp on a few percent of inputs). Falls back to a scalar math-
    module loop (also glibc) when the native core is unavailable."""
    import math  # noqa: F401 (fallback path)

    x = np.ascontiguousarray(x, np.float64)
    out = np.empty_like(x)
    lib = _load()
    fn = getattr(lib, fn_name, None) if lib is not None else None
    if fn is not None:
        fn(x.reshape(-1), out.reshape(-1), x.size)
        return out
    flat = x.reshape(-1)
    o = out.reshape(-1)
    for i in range(flat.size):
        o[i] = math_fn(flat[i])
    return out


def vexp(x):
    import math

    return _libm_elementwise("ngsf_vexp", math.exp, x)


def vlog(x):
    import math

    def _log(v):  # C log domain behaviour for the scalar fallback
        if v > 0.0:
            return math.log(v)
        return float("-inf") if v == 0.0 else float("nan")

    return _libm_elementwise("ngsf_vlog", _log, x)


def _call(fn, *args):
    err = ctypes.create_string_buffer(512)
    rc = fn(*args, err, ctypes.sizeof(err))
    if rc != 0:
        raise ValueError(err.value.decode() or f"native IO error {rc}")


def read_geno_binary(path, n_ind, n_sites, log_scale):
    lib = _load()
    out = np.empty((n_sites, n_ind, 3), dtype=np.float64)
    _call(lib.ngsf_read_geno_binary, os.fsencode(path), n_ind, n_sites,
          int(log_scale), out)
    return out


def read_geno_text(path, n_ind, n_sites, probs, log_scale):
    lib = _load()
    out = np.empty((n_sites, n_ind, 3), dtype=np.float64)
    _call(lib.ngsf_read_geno_text, os.fsencode(path), n_ind, n_sites,
          int(probs), int(log_scale), out)
    return out


def read_geno_binary_slab(path, n_ind, n_sites, log_scale,
                          site_off, site_cnt, ind_off, ind_cnt):
    """Slab read for multi-host loading: sites [site_off, site_off+site_cnt)
    x individuals [ind_off, ind_off+ind_cnt) -> [site_cnt, ind_cnt, 3]."""
    lib = _load()
    out = np.empty((site_cnt, ind_cnt, 3), dtype=np.float64)
    _call(lib.ngsf_read_geno_binary_slab, os.fsencode(path), n_ind, n_sites,
          site_off, site_cnt, ind_off, ind_cnt, int(log_scale), out)
    return out


def read_geno_text_slab(path, n_ind, n_sites, probs, log_scale,
                        site_off, site_cnt, ind_off, ind_cnt):
    lib = _load()
    out = np.empty((site_cnt, ind_cnt, 3), dtype=np.float64)
    _call(lib.ngsf_read_geno_text_slab, os.fsencode(path), n_ind, n_sites,
          site_off, site_cnt, ind_off, ind_cnt, int(probs), int(log_scale),
          out)
    return out


def read_pos_dist(path, n_sites):
    lib = _load()
    out = np.empty(n_sites, dtype=np.float64)
    _call(lib.ngsf_read_pos_dist, os.fsencode(path), n_sites, out)
    return out
