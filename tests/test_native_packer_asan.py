"""Sanitized (ASAN+UBSAN) run of the native-packer byte-identity suite.

SURVEY §5.2: the reference runs its asm/unsafe layers under
sanitizers in CI; our analog is the C++ packer driven through raw
ctypes buffers — one OOB write away from silent corruption that the
byte-identity test alone wouldn't catch if both sides agreed. This
test rebuilds packer.cpp with -fsanitize=address,undefined
(-fno-sanitize-recover=all, so any finding aborts) and re-runs
tests/test_native_packer.py in a subprocess with libasan preloaded.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent


def _libasan() -> str:
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, check=True
                             ).stdout.strip()
    except (OSError, subprocess.CalledProcessError):
        return ""
    return out if os.path.sep in out and os.path.exists(out) else ""


def test_packer_byte_identity_under_asan():
    asan = _libasan()
    if not asan:
        pytest.skip("libasan not available")
    env = dict(os.environ)
    env.update({
        "RAV1E_TPU_PACKER_SAN": "1",
        "LD_PRELOAD": asan,
        # python itself "leaks" interned objects at exit; ODR noise
        # from the preloaded runtime vs libstdc++ is not ours either
        "ASAN_OPTIONS": "detect_leaks=0:detect_odr_violation=0",
        "UBSAN_OPTIONS": "print_stacktrace=1",
    })
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         str(_REPO / "tests" / "test_native_packer.py")],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (
        f"sanitized packer run failed\n--- stdout ---\n{r.stdout[-4000:]}"
        f"\n--- stderr ---\n{r.stderr[-4000:]}")
