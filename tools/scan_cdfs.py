"""Scan a stripped codec .so for AV1 default CDF tables.

AV1 default CDFs are stored AOM-style in .rodata as u16 records:
n-symbol CDF = [v1 >= v2 >= ... >= v_{n-1} > 0, 0, 0], values < 32768
(strictly decreasing in practice, final 0 terminator + counter slot 0).
Arrays of records with identical n abut contiguously, so grouping
consecutive records by length recovers table shapes, which — combined
with the known inventory of spec table shapes and a few remembered
anchor values — identifies each table.

Usage: python tools/scan_cdfs.py /usr/lib/x86_64-linux-gnu/libaom.so.3
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np


def rodata(path: str) -> tuple[np.ndarray, int]:
    """Return (.rodata as u16 array, file offset)."""
    out = subprocess.check_output(["readelf", "-S", "-W", path], text=True)
    for line in out.splitlines():
        if ".rodata" in line:
            parts = line.split("]")[1].split()
            # name type addr off size ...
            off = int(parts[3], 16)
            size = int(parts[4], 16)
            break
    else:
        raise RuntimeError("no .rodata")
    with open(path, "rb") as f:
        f.seek(off)
        raw = f.read(size)
    return np.frombuffer(raw[: len(raw) & ~1], dtype=np.uint16), off


def find_records(u16: np.ndarray, min_n=2, max_n=17):
    """Yield (u16_offset, nsyms) for every CDF-looking record."""
    vals = u16
    n = len(vals)
    records = []
    i = 0
    while i < n - 2:
        # try to parse a record starting at i
        v0 = vals[i]
        if not (0 < v0 < 32768):
            i += 1
            continue
        j = i + 1
        while j < n and 0 < vals[j] <= vals[j - 1] and vals[j] < 32768:
            j += 1
        # need terminator 0 + counter 0
        k = j - i  # number of decreasing values = nsyms - 1
        if (
            j + 1 < n
            and vals[j] == 0
            and vals[j + 1] == 0
            and min_n <= k + 1 <= max_n
        ):
            records.append((i, k + 1))
            i = j + 2
        else:
            i += 1
    return records


def group(records):
    """Group contiguous same-length records into arrays."""
    groups = []
    cur = None
    for off, nsym in records:
        size = nsym + 1
        if cur and cur["nsym"] == nsym and off == cur["end"]:
            cur["count"] += 1
            cur["end"] = off + size
        else:
            if cur:
                groups.append(cur)
            cur = {"off": off, "nsym": nsym, "count": 1, "end": off + size}
    if cur:
        groups.append(cur)
    return groups


def main():
    path = sys.argv[1]
    u16, base = rodata(path)
    records = find_records(u16)
    groups = group(records)
    keep = [g for g in groups if g["count"] >= 2 or g["nsym"] >= 6]
    print(f"{len(records)} records, {len(groups)} groups, {len(keep)} kept")
    for g in keep:
        first = u16[g["off"] : g["off"] + min(g["nsym"] - 1, 6)]
        print(
            f"u16off={g['off']:8d} nsym={g['nsym']:3d} x{g['count']:4d} "
            f"first={list(32768 - first.astype(np.int32))}"
        )


if __name__ == "__main__":
    main()
