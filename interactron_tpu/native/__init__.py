"""Native (C++) host-runtime components.

`get_fastloader()` returns the compiled JPEG episode loader, building it on
first use with the system toolchain (g++ + libjpeg); returns None when the
toolchain or libjpeg is unavailable so callers fall back to the PIL path.
"""

import os
import subprocess
import sysconfig

_cached = None
_tried = False


def _build(src, out):
    import numpy as np

    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{include_np}",
        src, "-ljpeg", "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_fastloader():
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "fastloader.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_fastloader" + suffix)
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            _build(src, out)
        import importlib.util

        spec = importlib.util.spec_from_file_location("_fastloader", out)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception:
        _cached = None
    return _cached
