"""C ABI (librav1e_tpu.so) conformance.

Reference parity: librav1e 0.5.1's C API contract (rav1e src/capi.rs;
SURVEY.md Appendix A.5). Two rings:

1. ctypes in-process drive of the full send/receive loop — packets
   must be byte-identical to the pure-Python Context with the same
   config, and the stream must decode on dav1d.
2. a standalone C program (true embedding: the shim boots its own
   interpreter) encoding via the ABI — proves non-Python hosts work.
"""

import ctypes as ct
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from rav1e_tpu.api.context import Config
from rav1e_tpu.capi.build import build, lib_path
from rav1e_tpu.conform import dav1d


def _frames(w=96, h=64, n=5):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (h + 8, w + 8), dtype=np.uint8)
    out = []
    for t in range(n):
        y = base[t:t + h, t:t + w].copy()
        out.append([y,
                    np.full((h // 2, w // 2), 100 + t, np.uint8),
                    np.full((h // 2, w // 2), 140 - t, np.uint8)])
    return out


class _CApi:
    """Thin ctypes view of the 36-function ABI."""

    def __init__(self, path: Path):
        lib = ct.CDLL(str(path))
        self.lib = lib
        lib.rav1e_config_default.restype = ct.c_void_p
        lib.rav1e_config_parse.argtypes = [ct.c_void_p, ct.c_char_p,
                                           ct.c_char_p]
        lib.rav1e_config_parse_int.argtypes = [ct.c_void_p, ct.c_char_p,
                                               ct.c_int]
        lib.rav1e_context_new.argtypes = [ct.c_void_p]
        lib.rav1e_context_new.restype = ct.c_void_p
        lib.rav1e_frame_new.argtypes = [ct.c_void_p]
        lib.rav1e_frame_new.restype = ct.c_void_p
        lib.rav1e_frame_fill_plane.argtypes = [
            ct.c_void_p, ct.c_int, ct.c_char_p, ct.c_size_t,
            ct.c_ssize_t, ct.c_int]
        lib.rav1e_send_frame.argtypes = [ct.c_void_p, ct.c_void_p]
        lib.rav1e_receive_packet.argtypes = [
            ct.c_void_p, ct.POINTER(ct.POINTER(_RaPacket))]
        lib.rav1e_packet_unref.argtypes = [ct.c_void_p]
        lib.rav1e_frame_unref.argtypes = [ct.c_void_p]
        lib.rav1e_context_unref.argtypes = [ct.c_void_p]
        lib.rav1e_config_unref.argtypes = [ct.c_void_p]
        lib.rav1e_container_sequence_header.argtypes = [ct.c_void_p]
        lib.rav1e_container_sequence_header.restype = \
            ct.POINTER(_RaData)
        lib.rav1e_data_unref.argtypes = [ct.c_void_p]
        lib.rav1e_status_to_str.restype = ct.c_char_p
        lib.rav1e_version_full.restype = ct.c_char_p
        lib.rav1e_twopass_bytes_needed.argtypes = [ct.c_void_p]
        lib.rav1e_twopass_bytes_needed.restype = ct.c_size_t


class _RaPacket(ct.Structure):
    _fields_ = [("data", ct.POINTER(ct.c_uint8)),
                ("len", ct.c_size_t),
                ("input_frameno", ct.c_uint64),
                ("frame_type", ct.c_int),
                ("opaque", ct.c_void_p)]


class _RaData(ct.Structure):
    _fields_ = [("data", ct.POINTER(ct.c_uint8)),
                ("len", ct.c_size_t)]


@pytest.fixture(scope="module")
def capi():
    return _CApi(build())


def _encode_capi(capi, frames, w, h, q=110):
    lib = capi.lib
    cfg = lib.rav1e_config_default()
    lib.rav1e_config_parse_int(cfg, b"width", w)
    lib.rav1e_config_parse_int(cfg, b"height", h)
    lib.rav1e_config_parse_int(cfg, b"quantizer", q)
    lib.rav1e_config_parse(cfg, b"speed", b"6")
    ctx = lib.rav1e_context_new(cfg)
    assert ctx, "rav1e_context_new failed"
    for f in frames:
        fr = lib.rav1e_frame_new(ctx)
        for i, p in enumerate(f):
            data = np.ascontiguousarray(p).tobytes()
            lib.rav1e_frame_fill_plane(fr, i, data, len(data),
                                       p.shape[1], 1)
        assert lib.rav1e_send_frame(ctx, fr) == 0
        lib.rav1e_frame_unref(fr)
    lib.rav1e_send_frame(ctx, None)          # flush
    pkts = []
    while True:
        pp = ct.POINTER(_RaPacket)()
        st = lib.rav1e_receive_packet(ctx, ct.byref(pp))
        if st == 0 and pp:
            pkts.append((bytes(ct.cast(pp.contents.data,
                                       ct.POINTER(ct.c_uint8 *
                                                  pp.contents.len))
                               .contents),
                         pp.contents.input_frameno,
                         pp.contents.frame_type))
            lib.rav1e_packet_unref(pp)
        elif st == 3:                        # LIMIT_REACHED
            break
        elif st == 1:                        # NEED_MORE_DATA
            break
        else:
            raise AssertionError(
                f"receive_packet status {st}")
    lib.rav1e_context_unref(ctx)
    lib.rav1e_config_unref(cfg)
    return pkts


def test_capi_matches_python_context(capi):
    w, h = 96, 64
    frames = _frames(w, h)
    pkts_c = _encode_capi(capi, frames, w, h)

    cfg = Config.parse({"width": w, "height": h, "quantizer": 110,
                        "speed": 6})
    ctx = cfg.new_context()
    for f in frames:
        ctx.send_frame(f)
    ctx.flush()
    pkts_py = []
    while True:
        _, p = ctx.receive_packet()
        if p is None:
            break
        pkts_py.append(p)

    assert len(pkts_c) == len(pkts_py)
    for (cd, cfn, cft), pp in zip(pkts_c, pkts_py):
        assert cd == pp.data, "C ABI packet differs from Python packet"
        assert cfn == pp.input_frameno
    # and the stream decodes
    decoded = dav1d.decode_all([d for d, _, _ in pkts_c])
    assert len(decoded) == len(frames)


def test_capi_sequence_header_and_status(capi):
    lib = capi.lib
    cfg = lib.rav1e_config_default()
    lib.rav1e_config_parse_int(cfg, b"width", 64)
    lib.rav1e_config_parse_int(cfg, b"height", 64)
    ctx = lib.rav1e_context_new(cfg)
    hdr = lib.rav1e_container_sequence_header(ctx)
    assert hdr and hdr.contents.len > 0
    raw = bytes(ct.cast(hdr.contents.data,
                        ct.POINTER(ct.c_uint8 * hdr.contents.len))
                .contents)
    # OBU_SEQUENCE_HEADER type = 1 → first byte 0b0_0001_010 = 0x0a
    assert raw[0] == 0x0A
    lib.rav1e_data_unref(hdr)
    assert lib.rav1e_status_to_str(0) == b"success"
    assert lib.rav1e_status_to_str(-1) == b"failure"
    assert b"rav1e" in lib.rav1e_version_full()
    assert lib.rav1e_twopass_bytes_needed(ctx) == 0
    lib.rav1e_context_unref(ctx)
    lib.rav1e_config_unref(cfg)


_C_DRIVER = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "rav1e.h"

int main(int argc, char **argv) {
  const int W = 64, H = 64, N = 3;
  RaConfig *cfg = rav1e_config_default();
  rav1e_config_parse_int(cfg, "width", W);
  rav1e_config_parse_int(cfg, "height", H);
  rav1e_config_parse_int(cfg, "quantizer", 120);
  /* one packet per frame (the reordered default emits non-shown
     anchors + show_existing packets) */
  rav1e_config_parse_int(cfg, "low_latency", 1);
  RaContext *ctx = rav1e_context_new(cfg);
  if (!ctx) { fprintf(stderr, "ctx fail\n"); return 2; }
  uint8_t *y = malloc(W * H), *u = malloc(W * H / 4),
          *v = malloc(W * H / 4);
  FILE *out = fopen(argv[1], "wb");
  for (int t = 0; t < N; t++) {
    for (int i = 0; i < W * H; i++) y[i] = (uint8_t)(i + 37 * t);
    memset(u, 100, W * H / 4);
    memset(v, 140, W * H / 4);
    RaFrame *f = rav1e_frame_new(ctx);
    rav1e_frame_fill_plane(f, 0, y, W * H, W, 1);
    rav1e_frame_fill_plane(f, 1, u, W * H / 4, W / 2, 1);
    rav1e_frame_fill_plane(f, 2, v, W * H / 4, W / 2, 1);
    if (rav1e_send_frame(ctx, f) != 0) return 3;
    rav1e_frame_unref(f);
  }
  rav1e_send_frame(ctx, NULL);
  int got = 0;
  for (;;) {
    RaPacket *p = NULL;
    RaEncoderStatus st = rav1e_receive_packet(ctx, &p);
    if (st == RA_ENCODER_STATUS_SUCCESS && p) {
      uint32_t len = (uint32_t)p->len;
      fwrite(&len, 4, 1, out);
      fwrite(p->data, 1, p->len, out);
      got++;
      rav1e_packet_unref(p);
    } else if (st == RA_ENCODER_STATUS_LIMIT_REACHED) {
      break;
    } else if (st == RA_ENCODER_STATUS_NEED_MORE_DATA) {
      break;
    } else {
      fprintf(stderr, "status %d\n", st);
      return 4;
    }
  }
  fclose(out);
  rav1e_context_unref(ctx);
  rav1e_config_unref(cfg);
  printf("packets=%d\n", got);
  return got == N ? 0 : 5;
}
"""


def test_capi_standalone_embedding(tmp_path):
    """Compile a real C program against the ABI and run it — the shim
    must boot its own CPython and produce a decodable stream."""
    so = build()
    capi_dir = Path(so).parent
    src = tmp_path / "driver.c"
    src.write_text(_C_DRIVER)
    exe = tmp_path / "driver"
    subprocess.check_call(
        ["gcc", "-O1", "-o", str(exe), str(src), f"-I{capi_dir}",
         f"-L{capi_dir}", "-lrav1e_tpu", f"-Wl,-rpath,{capi_dir}"])
    outfile = tmp_path / "pkts.bin"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([str(exe), str(outfile)], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)
    blob = outfile.read_bytes()
    pkts, off = [], 0
    while off < len(blob):
        ln = int.from_bytes(blob[off:off + 4], "little")
        pkts.append(blob[off + 4:off + 4 + ln])
        off += 4 + ln
    decoded = dav1d.decode_all(pkts)
    assert len(decoded) == 3
