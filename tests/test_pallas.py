"""Pallas TPU kernels vs their host/XLA twins (bit-exact).

On CPU the kernels run in interpreter mode; on the real chip they
compile through Mosaic (tools/bench_ec_pallas.py exercises that).
The CDEF Pallas kernel was measured against the XLA formulation and
deleted: XLA generates the full 8-candidate 1080p ladder in 0.13 ms
(HBM-write roofline), leaving nothing for a hand kernel to win
(tools/bench_cdef_pallas.py keeps the measurement)."""

import numpy as np


def test_ec_pallas_random_streams():
    """On-TPU od_ec packer (entropy/ec_pallas): byte-identical to the
    host ECEncoder over random adapting-CDF streams with bools and
    literals mixed in (SURVEY 7.2 Plan B prototype)."""
    from rav1e_tpu.entropy.ec import ECEncoder, PROB_TOP
    from rav1e_tpu.entropy.ec_pallas import RecordingEncoder, pack_symbols

    rng = np.random.default_rng(11)

    def make_cdf(n):
        cuts = sorted(rng.integers(1, PROB_TOP, n - 1).tolist(),
                      reverse=True)
        return list(cuts) + [0, 0]

    for trial in range(3):
        cdfs = [make_cdf(n) for n in (2, 3, 5, 8, 13, 16)]
        cdfs2 = [list(c) for c in cdfs]
        enc = ECEncoder()
        rec = RecordingEncoder()
        for i in range(3000):
            which = rng.integers(0, len(cdfs))
            n = len(cdfs[which]) - 2
            s = int(rng.integers(0, n))
            enc.encode_symbol(s, cdfs[which])
            rec.encode_symbol(s, cdfs2[which])
            if i % 7 == 0:
                v = int(rng.integers(0, 256))
                enc.encode_literal(v, 8)
                rec.encode_literal(v, 8)
            if i % 11 == 0:
                b = int(rng.integers(0, 2))
                f = int(rng.integers(64, PROB_TOP - 64))
                enc.encode_bool(b, f)
                rec.encode_bool(b, f)
        assert pack_symbols(np.asarray(rec.ir, np.int32)) == enc.done()


def test_ec_pallas_real_tile():
    """The Pallas coder reproduces a REAL keyframe tile byte-for-byte:
    capture the tile's symbol stream with RecordingEncoder, pack it on
    device, compare against the python TileWriter's tile bytes."""
    from rav1e_tpu.entropy.ec_pallas import RecordingEncoder, pack_symbols
    from rav1e_tpu.pipeline.intra import encode_keyframe
    import rav1e_tpu.entropy.tile as tilemod

    rng = np.random.default_rng(5)
    y = rng.integers(0, 255, (64, 96)).astype(np.uint8)
    u = rng.integers(0, 255, (32, 48)).astype(np.uint8)
    v = rng.integers(0, 255, (32, 48)).astype(np.uint8)

    captured = {}

    class _Rec(RecordingEncoder):
        def done(self):
            captured["ir"] = np.asarray(self.ir, np.int32)
            return b""

    orig = tilemod.ECEncoder
    # reference tile bytes (normal writer)
    pkt_ref, _ = encode_keyframe([y, u, v], qindex=100)
    try:
        tilemod.ECEncoder = _Rec
        encode_keyframe([y, u, v], qindex=100)
    finally:
        tilemod.ECEncoder = orig
    ir = captured["ir"]
    assert len(ir) > 1000
    tile_dev = pack_symbols(ir)
    # the reference packet embeds the tile as its trailing bytes
    assert tile_dev in pkt_ref
