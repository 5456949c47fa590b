"""Build librav1e_tpu.so (the rav1e-compatible C ABI, capi.c).

Compiled on demand with g++ against the embedding libpython; written
via temp-file + atomic rename so concurrent builders never load a
half-written object.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
import tempfile
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_REPO = _DIR.parent.parent


def lib_path() -> Path:
    return _DIR / "librav1e_tpu.so"


def build(force: bool = False) -> Path:
    so = lib_path()
    src = _DIR / "capi.c"
    hdr = _DIR / "rav1e.h"
    if (so.exists() and not force
            and so.stat().st_mtime >= max(src.stat().st_mtime,
                                          hdr.stat().st_mtime)):
        return so
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = sysconfig.get_config_var("LDVERSION")
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.check_call([
            "g++", "-O2", "-shared", "-fPIC", "-o", tmp, str(src),
            f"-I{inc}", f"-I{_DIR}",
            f"-L{libdir}", f"-lpython{ver}",
            f"-Wl,-rpath,{libdir}",
            f"-DRAV1E_TPU_ROOT=\"{_REPO}\"",
        ])
        os.replace(tmp, so)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return so


if __name__ == "__main__":
    print(build(force=True))
