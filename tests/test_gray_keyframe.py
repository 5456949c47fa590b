"""M1a e2e milestone: all-skip DC keyframe must decode via dav1d to a
uniform 128 (mid-gray) frame — validating OBU headers, the range coder,
partition/skip/mode CDF tables, and context derivation end to end.

Mirrors the reference's conformance oracle (rav1e test_encode_decode).
"""

import numpy as np
import pytest

from rav1e_tpu.conform import dav1d
from rav1e_tpu.core.constants import BlockSize, FrameType, PartitionType
from rav1e_tpu.entropy.obu import FrameParams, Sequence, TileInfo, keyframe_packet
from rav1e_tpu.entropy.tile import BlockDecision, TileWriter


def encode_gray(width: int, height: int) -> bytes:
    seq = Sequence(width=width, height=height)
    fp = FrameParams(frame_type=FrameType.KEY, base_q_idx=100)
    ti = TileInfo(seq)
    assert ti.n_tiles == 1
    mi_cols = 2 * ((width + 7) >> 3)
    mi_rows = 2 * ((height + 7) >> 3)
    tw = TileWriter(mi_rows, mi_cols, fp.base_q_idx)
    blocks = {}
    for r in range(0, mi_rows, 16):
        for c in range(0, mi_cols, 16):
            blocks[(r, c)] = BlockDecision()
    partitions = {}  # all NONE at 64x64
    # partial SBs at frame edges need real partitions: split until the
    # block fits or the implicit rules allow it. For M1a use frame
    # sizes that are multiples of 64.
    tile = tw.write_tile(partitions, blocks)
    return keyframe_packet(seq, fp, ti, [tile])


@pytest.mark.parametrize("w,h", [(64, 64), (128, 64), (64, 128),
                                 (192, 128), (256, 256), (640, 480)])
def test_gray_keyframe_decodes(w, h):
    if w % 64 or h % 64:
        pytest.skip("partial superblocks land with the intra encoder")
    pkt = encode_gray(w, h)
    frames = dav1d.decode_all([pkt])
    assert len(frames) == 1
    f = frames[0]
    assert f.planes[0].shape == (h, w)
    for p in f.planes:
        assert np.all(p == 128)
    # second conformance oracle (reference uses both dav1d and libaom)
    from rav1e_tpu.conform import aom
    out = aom.decode_all([pkt])
    for p in out[0]:
        assert np.all(p == 128)
