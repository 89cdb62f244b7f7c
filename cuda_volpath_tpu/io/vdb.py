"""Minimal OpenVDB (.vdb) writer for FloatGrid (Tree_float_5_4_3).

Counterpart of the native reader (native/vdb_reader.cpp): writes the subset
of the OpenVDB archive format the reader understands — file version 224,
seekable grid offsets, a single float grid with a uniform-scale transform,
and leaf payloads in any of the codecs the reader decodes (none / zlib /
blosc / half floats / active-mask compression).  Used by the VDB round-trip
tests and by ``tools/vdb_to_binary.py`` as an export path; for production
ingest of foreign .vdb files the native reader is the entry point
(reference vdbloader/load_vdb.cpp:122 ``load_vdb``).

Format notes are kept in the reader; the two files must evolve together.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

MAGIC = 0x56444220
FILE_VERSION = 224

COMPRESS_NONE = 0
COMPRESS_ZIP = 0x1
COMPRESS_ACTIVE_MASK = 0x2
COMPRESS_BLOSC = 0x4


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _mask_bytes(mask: np.ndarray) -> bytes:
    """Bit mask in OpenVDB word order (little-endian 64-bit words)."""
    return np.packbits(mask.astype(bool), bitorder="little").tobytes()


def _values_bytes(vals: np.ndarray, half: bool) -> bytes:
    if half:
        return vals.astype(np.float16).tobytes()
    return vals.astype("<f4").tobytes()


def _blosc_memcpy_frame(payload: bytes) -> bytes:
    """A valid blosc1 frame using the memcpy flag (bit 1) — stores raw."""
    header = struct.pack(
        "<BBBBIII",
        2,          # version
        1,          # versionlz
        0x2,        # flags: memcpyed
        4,          # typesize
        len(payload),
        max(len(payload), 1),
        len(payload) + 16)
    return header + payload


def lz4_compress_block(data: bytes) -> bytes:
    """Greedy LZ4 block encoder (spec-conformant: the block ends with a
    literals-only sequence of >= 5 bytes and the last match starts at
    least 12 bytes before the end, as LZ4_decompress_fast-era decoders
    require).  Small and slow — used for writing test/interchange .vdb
    files."""
    n = len(data)
    out = bytearray()
    table = {}
    i = anchor = 0

    def emit(lit_start, lit_len, mlen_total=None, offset=None):
        token_lit = min(lit_len, 15)
        token_m = 0 if mlen_total is None else min(mlen_total - 4, 15)
        out.append((token_lit << 4) | token_m)
        if token_lit == 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(data[lit_start:lit_start + lit_len])
        if mlen_total is not None:
            out.extend(offset.to_bytes(2, "little"))
            if token_m == 15:
                rem = mlen_total - 4 - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    match_limit = n - 12               # last match starts >= 12 from end
    end_limit = n - 5                  # last 5 bytes must be literals
    while i + 4 <= match_limit:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            m = i + 4
            c = cand + 4
            while m < end_limit and data[m] == data[c]:
                m += 1
                c += 1
            emit(anchor, i - anchor, m - i, i - cand)
            anchor = i = m
        else:
            i += 1
    emit(anchor, n - anchor)
    return bytes(out)


def _blosc_lz4_frame(payload: bytes, typesize: int, shuffle: bool) -> bytes:
    """Blosc1 frame with one LZ4 block (optional byte shuffle).

    Mirrors genuine c-blosc block splitting (verified against
    libblosc.so.1, and decoded by native/vdb_reader.cpp:bloscDecompress):
    a full block is cut into ``typesize`` sub-streams, each with its own
    int32 csize, iff blocksize/typesize >= 128 and typesize <= 16;
    otherwise one stream plus the dont_split flag (bit 4) for newer
    decoders."""
    block = payload
    if shuffle and typesize > 1:
        elems = len(payload) // typesize
        arr = np.frombuffer(payload[:elems * typesize], np.uint8)
        block = (arr.reshape(elems, typesize).T.tobytes()
                 + payload[elems * typesize:])
    split = (typesize > 1 and typesize <= 16
             and len(block) % typesize == 0
             and len(block) // typesize >= 128)
    flags = (0x1 if shuffle and typesize > 1 else 0) | (1 << 5)  # LZ4
    if not split:
        flags |= 0x10                  # dont_split
    subs = []
    nsplits = typesize if split else 1
    neblock = len(block) // nsplits
    for s in range(nsplits):
        chunk = block[s * neblock:(s + 1) * neblock]
        comp = lz4_compress_block(chunk)
        if len(comp) >= len(chunk):    # blosc stores incompressible raw
            comp = chunk
        subs.append(struct.pack("<i", len(comp)) + comp)
    body = b"".join(subs)
    header = struct.pack("<BBBBIII", 2, 1, flags, typesize,
                         len(payload), max(len(payload), 1),
                         16 + 4 + len(body))
    return header + struct.pack("<I", 16 + 4) + body


def _codec_frame(raw: bytes, compression: int) -> bytes:
    """io::zipToStream / bloscToStream framing: int64 size + payload;
    negative size = uncompressed passthrough."""
    if compression & COMPRESS_ZIP:
        comp = zlib.compress(raw)
        if len(comp) < len(raw):
            return struct.pack("<q", len(comp)) + comp
        return struct.pack("<q", -len(raw)) + raw
    if compression & COMPRESS_BLOSC:
        frame = _blosc_lz4_frame(raw, 4, shuffle=True)
        return struct.pack("<q", len(frame)) + frame
    return raw


def _masked_buffer(values: np.ndarray, active: np.ndarray, background: float,
                   compression: int, half: bool) -> bytes:
    """io::writeCompressedValues for file version >= 222: int8 metadata +
    payload.  Uses NO_MASK_AND_ALL_VALS (6) without active-mask compression,
    NO_MASK_OR_INACTIVE_VALS (0, actives only) with it."""
    if compression & COMPRESS_ACTIVE_MASK:
        meta = 0
        stored = values[active]
    else:
        meta = 6
        stored = values
    return (struct.pack("<b", meta)
            + _codec_frame(_values_bytes(stored, half), compression))


def _leaf_key(origin: Tuple[int, int, int], log2sum: int) -> Tuple[int, ...]:
    return tuple(int(o) >> log2sum << log2sum for o in origin)


class _Node:
    """Internal node of the 5,4,3 tree (log2dim 5 or 4)."""

    def __init__(self, origin, log2, child_span):
        self.origin = origin
        self.log2 = log2
        self.dim = 1 << log2
        self.child_span = child_span
        self.children = {}          # bit index -> child (_Node or leaf dict)
        self.tiles = {}             # bit index -> constant active tile

    def bit(self, xyz) -> int:
        x = (xyz[0] - self.origin[0]) // self.child_span
        y = (xyz[1] - self.origin[1]) // self.child_span
        z = (xyz[2] - self.origin[2]) // self.child_span
        # OpenVDB offset packing is x-major: x*dim^2 + y*dim + z
        return (x << (2 * self.log2)) | (y << self.log2) | z


def _grid_blob(dense: np.ndarray, origin, compression: int, half: bool,
               voxel_size: float, background: float,
               tiles=()) -> bytes:
    """Serialize one FloatGrid body (metadata + transform + tree).

    ``tiles`` is a sequence of ((x, y, z), value) mid-level constant tiles
    (128-voxel span, the pruned-subtree representation openvdb's prune
    produces); origins must be 128-aligned and not overlap leaf data.
    """
    dense = np.asarray(dense, np.float32)
    nz, ny, nx = dense.shape
    ox, oy, oz = (int(v) for v in origin)

    # ---- carve the 5,4,3 tree: leaves are 8^3, level-1 16^3, level-2 32^3
    top_span = 1 << (5 + 4 + 3)          # 4096
    mid_span = 1 << (4 + 3)              # 128
    leaf_span = 8
    tops = {}
    for z0 in range((oz // 8) * 8, oz + nz, leaf_span):
        for y0 in range((oy // 8) * 8, oy + ny, leaf_span):
            for x0 in range((ox // 8) * 8, ox + nx, leaf_span):
                vals = np.full((8, 8, 8), background, np.float32)  # (x,y,z)
                sx = slice(max(x0, ox) - x0, min(x0 + 8, ox + nx) - x0)
                sy = slice(max(y0, oy) - y0, min(y0 + 8, oy + ny) - y0)
                sz = slice(max(z0, oz) - z0, min(z0 + 8, oz + nz) - z0)
                if sx.start >= sx.stop or sy.start >= sy.stop or \
                        sz.start >= sz.stop:
                    continue
                block = dense[z0 + sz.start - oz:z0 + sz.stop - oz,
                              y0 + sy.start - oy:y0 + sy.stop - oy,
                              x0 + sx.start - ox:x0 + sx.stop - ox]
                vals[sx, sy, sz] = np.transpose(block, (2, 1, 0))
                active = vals != background
                if not active.any():
                    continue
                # register in the node hierarchy
                leaf_org = (x0, y0, z0)
                tkey = _leaf_key(leaf_org, 12)
                top = tops.setdefault(tkey, _Node(tkey, 5, mid_span))
                mkey = _leaf_key(leaf_org, 7)
                mid = top.children.setdefault(
                    top.bit(mkey), _Node(mkey, 4, leaf_span))
                mid.children[mid.bit(leaf_org)] = {
                    "origin": leaf_org,
                    "values": vals.reshape(-1),      # x-major flat order
                    "active": active.reshape(-1),
                }

    for torigin, tval in tiles:
        tkey = _leaf_key(torigin, 12)
        top = tops.setdefault(tkey, _Node(tkey, 5, mid_span))
        b = top.bit(torigin)
        if b in top.children:
            raise ValueError("tile overlaps voxel data")
        top.tiles[b] = float(tval)

    # ---- serialize the grid body
    body = bytearray()
    body += struct.pack("<I", compression)          # per-grid compression
    body += struct.pack("<i", 0)                    # grid metadata: empty
    body += _string("UniformScaleMap")
    s = float(voxel_size)
    vec = lambda v: struct.pack("<3d", v, v, v)
    body += vec(s) + vec(s) + vec(1.0 / s) + vec(1.0 / s ** 2) \
        + vec(0.5 / s)
    body += struct.pack("<I", 1)                    # buffer count
    # RootNode background is a plain float regardless of saveFloatAsHalf
    body += struct.pack("<f", background)
    body += struct.pack("<II", 0, len(tops))        # root tiles, children

    leaves_in_order = []

    def emit_internal(node: _Node) -> bytes:
        n = 1 << (3 * node.log2)
        child_mask = np.zeros(n, bool)
        value_mask = np.zeros(n, bool)
        for b in node.children:
            child_mask[b] = True
        tile_vals = np.full(n, background, np.float32)
        for b, v in node.tiles.items():
            value_mask[b] = True
            tile_vals[b] = v
        out = bytearray()
        out += _mask_bytes(child_mask)
        out += _mask_bytes(value_mask)
        out += _masked_buffer(tile_vals, value_mask, background,
                              compression, half)
        for b in sorted(node.children):
            child = node.children[b]
            if isinstance(child, _Node):
                out += emit_internal(child)
            else:
                leaves_in_order.append(child)
                out += _mask_bytes(child["active"])
        return bytes(out)

    for tkey in sorted(tops):
        top = tops[tkey]
        body += struct.pack("<3i", *top.origin)
        body += emit_internal(top)

    for leaf in leaves_in_order:                    # Tree::writeBuffers
        body += _masked_buffer(leaf["values"], leaf["active"], background,
                               compression, half)

    return bytes(body)


def write_vdb_multi(path: str, grids, compression: int = COMPRESS_ZIP,
                    half: bool = False, voxel_size: float = 1.0,
                    background: float = 0.0) -> None:
    """Write several FloatGrids into one archive.

    ``grids`` is a sequence of dicts with keys ``name``, ``dense`` and
    optionally ``origin`` and ``tiles`` (see ``_grid_blob``).
    """
    out = bytearray()
    out += struct.pack("<q", MAGIC)
    out += struct.pack("<I", FILE_VERSION)
    out += struct.pack("<II", 10, 0)                # library version
    out += struct.pack("<B", 1)                     # hasGridOffsets
    out += struct.pack("<B", compression)
    out += b"0" * 36                                # ascii uuid placeholder
    out += struct.pack("<i", 0)                     # archive metadata
    out += struct.pack("<I", len(grids))            # grid count

    type_name = "Tree_float_5_4_3" + ("_HalfFloat" if half else "")
    for g in grids:
        body = _grid_blob(np.asarray(g["dense"], np.float32),
                          g.get("origin", (0, 0, 0)), compression, half,
                          voxel_size, background, tiles=g.get("tiles", ()))
        out += _string(g["name"])
        out += _string(type_name)
        out += _string("")                          # instance parent
        desc_pos = len(out)
        out += struct.pack("<QQQ", 0, 0, 0)
        grid_pos = len(out)
        out += body
        end_pos = len(out)
        struct.pack_into("<QQQ", out, desc_pos, grid_pos, grid_pos, end_pos)

    with open(path, "wb") as f:
        f.write(bytes(out))


def write_vdb(path: str, dense: np.ndarray, origin=(0, 0, 0),
              compression: int = COMPRESS_ZIP, half: bool = False,
              grid_name: str = "density", voxel_size: float = 1.0,
              background: float = 0.0, tiles=()) -> None:
    """Write a dense (Nz, Ny, Nx) float array as a .vdb FloatGrid.

    Voxels with value != background are marked active (the reader densifies
    active voxels only, mirroring the reference's read_voxels,
    vdbloader/load_vdb.cpp:95-117).
    """
    write_vdb_multi(path, [{"name": grid_name, "dense": dense,
                            "origin": origin, "tiles": tiles}],
                    compression=compression, half=half,
                    voxel_size=voxel_size, background=background)
