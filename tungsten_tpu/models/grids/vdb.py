"""Minimal OpenVDB (.vdb) container reader: header, metadata, and grid
descriptors only — the 5-4-3 TREE PAYLOAD IS NOT DECODED. Every .vdb load
fails loudly at _read_grid with repack instructions; use an
OpenVDB-enabled Python offline to dump the density grid to .npy and
reference it as a {"type": "dense"} grid spec (models/grids/grid.py).

The reference links full OpenVDB (src/core/grids/VdbGrid.cpp); this
environment has neither OpenVDB nor any .vdb test asset, so a blind tree
decoder could not be validated — the honest boundary is the descriptor
walk (useful for error messages naming the grids a file DOES contain).

Format notes (derived from the public openvdb/io/* layout):
  header: int64 magic 0x56444220 | uint32 file version | 2x uint32 library
  version | bool hasGridOffsets | (>=220) char compression | uuid string |
  metadata map | uint32 grid count | per-grid descriptors.
Tree_float_5_4_3: RootNode -> Internal(32^3) -> Internal(16^3) -> Leaf(8^3).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 0x56444220

COMPRESS_NONE = 0
COMPRESS_ZIP = 0x1
COMPRESS_ACTIVE_MASK = 0x2
COMPRESS_BLOSC = 0x4


class _R:
    def __init__(self, data: bytes):
        self.b = data
        self.o = 0

    def read(self, n):
        v = self.b[self.o : self.o + n]
        if len(v) < n:
            raise EOFError("truncated .vdb")
        self.o += n
        return v

    def u32(self):
        return struct.unpack("<I", self.read(4))[0]

    def u64(self):
        return struct.unpack("<Q", self.read(8))[0]

    def i32(self):
        return struct.unpack("<i", self.read(4))[0]

    def i64(self):
        return struct.unpack("<q", self.read(8))[0]

    def f64(self):
        return struct.unpack("<d", self.read(8))[0]

    def boolean(self):
        return self.read(1)[0] != 0

    def name(self):
        return self.read(self.u32()).decode("utf-8", "replace")


def _read_metadata(r: _R):
    meta = {}
    count = r.u32()
    for _ in range(count):
        key = r.name()
        typ = r.name()
        size = r.u32()
        raw = r.read(size)
        if typ == "string":
            meta[key] = raw[4:].decode("utf-8", "replace") if size >= 4 else ""
        elif typ == "int64":
            meta[key] = struct.unpack("<q", raw)[0]
        elif typ == "bool":
            meta[key] = raw[0] != 0
        elif typ == "vec3i":
            meta[key] = struct.unpack("<3i", raw)
        elif typ == "vec3d":
            meta[key] = struct.unpack("<3d", raw)
        else:
            meta[key] = raw
    return meta


def read_vdb(path: str, grid_name: str = "density") -> np.ndarray:
    """Read one float grid as a dense (nz, ny, nx) array over its active
    bounding box. Raises NotImplementedError for blosc/half/non-float data."""
    with open(path, "rb") as f:
        data = f.read()
    r = _R(data)
    if r.u64() != MAGIC:
        raise ValueError(f"{path}: not a .vdb file")
    file_version = r.u32()
    r.u32()
    r.u32()  # library major/minor
    has_offsets = r.boolean()
    compression = COMPRESS_ZIP | COMPRESS_ACTIVE_MASK
    if file_version >= 220:
        compression = r.read(1)[0]
    if file_version >= 222:
        r.name()  # uuid
    if compression & COMPRESS_BLOSC:
        raise NotImplementedError(
            f"{path}: blosc-compressed .vdb — repack to .npy with OpenVDB "
            "offline and use a {'type': 'dense'} grid spec"
        )
    _read_metadata(r)
    if not has_offsets:
        raise NotImplementedError(f"{path}: streamed .vdb without grid offsets")
    grid_count = r.u32()
    names = []
    for _ in range(grid_count):
        gname = r.name()
        names.append(gname.split("\x1e")[0])
        gtype = r.name()
        if file_version >= 216:
            r.boolean()  # save-float-as-half handled per-grid below
        r.u64()  # grid byte offset
        pos = r.u64()
        r.u64()  # block offset / end offset
        if names[-1] == grid_name:
            return _read_grid(data, pos, gtype, file_version, compression, path)
        r.o = pos  # descriptors are sequential; jump to next via end offset
        # (the three u64s are grid/blocks/end offsets; continue from here)
    raise KeyError(f"{path}: grid '{grid_name}' not found (has {names})")


def _read_grid(data, pos, gtype, file_version, compression, path):
    if "float" not in gtype:
        raise NotImplementedError(f"{path}: grid type {gtype!r} (float only)")
    raise NotImplementedError(
        f"{path}: .vdb tree decoding for {gtype!r} at offset {pos} is not "
        "implemented in this minimal reader — repack the asset to .npy "
        "(density array) and reference it as {'type': 'dense', 'file': ...}"
    )
