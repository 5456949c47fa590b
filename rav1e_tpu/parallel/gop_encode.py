"""GOP-parallel encoding across devices and hosts.

SURVEY §5.7/§5.8 sequence-parallel translation: AV1 GOPs that begin
with a KEY frame share no state — no reference planes, no entropy
context, no rate history cross the boundary — so GOPs are the natural
*outer* parallel axis (the reference gets the same effect from
frame-level threading inside one host; we scale it over a TPU mesh and
over hosts).

Two layers:

* ``GopScheduler`` — single-process, multi-device (ICI): GOP g is
  pinned to device ``g % n`` with ``jax.default_device``; one worker
  thread per device keeps every chip's dispatch queue full while the
  host threads entropy-pack concurrently (ctypes packer calls drop the
  GIL). Packets are reassembled in input order.

* ``DistributedGopScheduler`` — multi-host (DCN): process p encodes
  GOPs ``p, p+P, ...`` with its local ``GopScheduler``, then packet
  bytes are gathered to every host with ONE padded uint8 all-gather
  (`ProcessGroup.allgather_bytes`) — control-plane traffic only; pixel
  data never crosses DCN. The process group is injectable: production
  uses ``JaxProcessGroup`` (jax.distributed / multihost_utils), tests
  use ``MockProcessGroup`` which runs P simulated processes as threads
  over disjoint slices of the local (virtual) device list, exercising
  the identical scatter/gather code path.

Bit-exactness: scheduling never changes the per-GOP byte stream — the
same frames encode to the same packets at any device count (asserted
by tests/test_gop_parallel.py against dav1d).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

# serializes first-compile of the GOP step across scheduler threads
# (concurrent XLA:CPU compiles segfault intermittently)
_COMPILE_LOCK = threading.Lock()


def split_gops(frames, key_interval: int, detector=None):
    """Split frames into GOPs: fixed keyframe cadence plus optional
    scene-cut detector (analysis/scenechange.py instance with
    analyze_next_frame). Returns list of frame-lists."""
    gops, cur = [], []
    for i, f in enumerate(frames):
        cut = (len(cur) >= key_interval
               or (detector is not None
                   and detector.analyze_next_frame(f[0]) and cur))
        if cur and cut:
            gops.append(cur)
            cur = []
        cur.append(f)
    if cur:
        gops.append(cur)
    return gops


def _encode_one_gop(frames, qindex: int, speed: int, cdef):
    from rav1e_tpu.pipeline.tpu_inter import encode_gop_tpu
    pkts, recs = encode_gop_tpu(frames, qindex=qindex, speed=speed,
                                cdef=cdef)
    return pkts, recs


class GopScheduler:
    """Single-host GOP dispatcher over the local devices.

    devices: explicit jax device list (default: all local devices).
    Each device gets a dedicated worker thread; GOP g runs entirely
    (uploads, compute dispatches, fetches) under
    ``jax.default_device(devices[g % n])``.
    """

    def __init__(self, devices=None):
        import jax
        self.devices = list(devices if devices is not None
                            else jax.local_devices())

    def encode(self, frames, key_interval: int = 16, qindex: int = 100,
               speed: int = 6, cdef=None, detector=None,
               gop_indices=None, want_recs: bool = False):
        """Encode frames as GOP-parallel streams. Returns the ordered
        packet list (and recon list when want_recs).

        gop_indices: encode only these GOP positions (multi-host
        round-robin); packets still come back keyed by GOP index.
        """
        import jax
        gops = split_gops(frames, key_interval, detector)
        mine = (range(len(gops)) if gop_indices is None
                else list(gop_indices))
        results: dict[int, tuple] = {}
        lock = threading.Lock()

        def run(gi: int, dev):
            with jax.default_device(dev):
                out = _encode_one_gop(gops[gi], qindex, speed, cdef)
            with lock:
                results[gi] = out

        n = len(self.devices)
        if len(mine) > 0:
            # warm the compile caches under a process-wide lock: all
            # GOPs share shapes, and concurrent first-compiles (from
            # worker threads here, or from the per-rank threads of the
            # mock-distributed scheduler) have segfaulted XLA:CPU in
            # backend_compile/pjit_lowering
            first = mine[0]
            with _COMPILE_LOCK:
                run(first, self.devices[0])
            mine = [gi for gi in mine if gi != first]
        with ThreadPoolExecutor(max_workers=n) as ex:
            futs = [ex.submit(run, gi, self.devices[k % n])
                    for k, gi in enumerate(mine)]
            for f in futs:
                f.result()
        if gop_indices is not None:
            return results
        pkts = [p for gi in sorted(results) for p in results[gi][0]]
        if want_recs:
            recs = [r for gi in sorted(results) for r in results[gi][1]]
            return pkts, recs
        return pkts


# ---- multi-host (DCN) layer ------------------------------------------------


class ProcessGroup:
    """Minimal process-collective surface the scheduler needs. The
    production implementation rides jax.distributed; the mock runs
    in-process. Only control-plane bytes (packets) ever cross it."""

    @property
    def rank(self) -> int:
        raise NotImplementedError

    @property
    def size(self) -> int:
        raise NotImplementedError

    def local_devices(self):
        raise NotImplementedError

    def allgather_bytes(self, blobs: list[bytes]) -> list[list[bytes]]:
        """Every process contributes a list of byte strings; every
        process receives [size][...] all lists, rank-ordered."""
        raise NotImplementedError


class JaxProcessGroup(ProcessGroup):
    """jax.distributed-backed group (real pods). Call
    jax.distributed.initialize() before constructing (or pass
    coordinator params here)."""

    def __init__(self, coordinator: str | None = None,
                 num_processes: int | None = None,
                 process_id: int | None = None):
        import jax
        if coordinator is not None:
            jax.distributed.initialize(coordinator, num_processes,
                                       process_id)
        self._jax = jax

    @property
    def rank(self) -> int:
        return self._jax.process_index()

    @property
    def size(self) -> int:
        return self._jax.process_count()

    def local_devices(self):
        return self._jax.local_devices()

    def allgather_bytes(self, blobs: list[bytes]) -> list[list[bytes]]:
        from jax.experimental import multihost_utils
        flat = b"".join(blobs)
        lens = np.asarray([len(b) for b in blobs], np.int64)
        # pad the variable-size payloads to the global max: ONE
        # all-gather for the framing and one for the bytes
        meta = np.zeros(2, np.int64)
        meta[0], meta[1] = len(blobs), len(flat)
        metas = multihost_utils.process_allgather(meta)
        max_n = int(metas[:, 0].max())
        max_b = int(metas[:, 1].max())
        lens_p = np.full(max_n, -1, np.int64)
        lens_p[:len(lens)] = lens
        data_p = np.zeros(max_b, np.uint8)
        data_p[:len(flat)] = np.frombuffer(flat, np.uint8)
        all_lens = multihost_utils.process_allgather(lens_p)
        all_data = multihost_utils.process_allgather(data_p)
        out = []
        for r in range(self.size):
            ls = [int(x) for x in all_lens[r] if x >= 0]
            buf = all_data[r].tobytes()
            pos, items = 0, []
            for ln in ls:
                items.append(buf[pos:pos + ln])
                pos += ln
            out.append(items)
        return out


class MockProcessGroup(ProcessGroup):
    """P simulated processes inside one real process (tests): thread
    r owns devices[r::P] and the all-gather is a shared-memory
    barrier. Use via MockCluster.run()."""

    def __init__(self, cluster: "MockCluster", rank: int):
        self._c = cluster
        self._rank = rank

    @property
    def rank(self) -> int:
        return self._rank

    @property
    def size(self) -> int:
        return self._c.size

    def local_devices(self):
        import jax
        devs = jax.local_devices()
        return devs[self._rank::self._c.size] or [devs[0]]

    def allgather_bytes(self, blobs: list[bytes]) -> list[list[bytes]]:
        return self._c._exchange(self._rank, blobs)


class MockCluster:
    """In-process stand-in for a jax.distributed pod: run(fn) launches
    fn(group) on `size` threads and returns their results."""

    def __init__(self, size: int):
        self.size = size
        self._box: list = [None] * size
        self._barrier = threading.Barrier(size)

    def _exchange(self, rank: int, blobs):
        self._box[rank] = list(blobs)
        self._barrier.wait()
        out = [list(b) for b in self._box]
        self._barrier.wait()      # don't reset _box under readers
        return out

    def run(self, fn):
        outs = [None] * self.size
        errs = [None] * self.size

        def work(r):
            try:
                outs[r] = fn(MockProcessGroup(self, r))
            except BaseException as e:      # surfaced below
                errs[r] = e
                try:
                    self._barrier.abort()
                except Exception:
                    pass

        ts = [threading.Thread(target=work, args=(r,))
              for r in range(self.size)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for e in errs:
            if e is not None:
                raise e
        return outs


@dataclass
class DistributedGopScheduler:
    """Multi-host GOP parallelism: process p encodes GOPs p, p+P, ...
    on its local chips, then every host assembles the full ordered
    stream from one byte all-gather."""

    group: ProcessGroup

    def encode(self, frames, key_interval: int = 16, qindex: int = 100,
               speed: int = 6, cdef=None, detector=None):
        gops = split_gops(frames, key_interval, detector)
        P = self.group.size
        mine = list(range(self.group.rank, len(gops), P))
        local = GopScheduler(self.group.local_devices())
        results = local.encode(frames, key_interval, qindex, speed,
                               cdef, detector, gop_indices=mine)
        # frame [gop_index: u32][n_pkts: u32] + packets per GOP
        blobs = []
        for gi in mine:
            pkts = results[gi][0]
            hdr = np.asarray([gi, len(pkts)], np.uint32).tobytes()
            blobs.append(hdr + b"".join(
                np.asarray([len(p)], np.uint32).tobytes() + bytes(p)
                for p in pkts))
        gathered = self.group.allgather_bytes(blobs)
        by_gop: dict[int, list[bytes]] = {}
        for rank_blobs in gathered:
            for blob in rank_blobs:
                gi, npk = np.frombuffer(blob[:8], np.uint32)
                pos, pkts = 8, []
                for _ in range(npk):
                    ln, = np.frombuffer(blob[pos:pos + 4], np.uint32)
                    pos += 4
                    pkts.append(blob[pos:pos + ln])
                    pos += ln
                by_gop[int(gi)] = pkts
        assert sorted(by_gop) == list(range(len(gops)))
        return [p for gi in sorted(by_gop) for p in by_gop[gi]]
