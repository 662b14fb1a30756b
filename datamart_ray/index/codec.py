"""Posting-list compression codecs (vectorized numpy, no Python per-value loops).

Two codecs:

- **varbyte**: classic 7-bit variable-byte encoding (continuation bit set on
  all but the last byte of each value). Used for delta-encoded docID gaps.
  Encode and decode are fully vectorized: the only Python-level loops run
  once per *byte position* (≤10 iterations), never per value. This is the
  byte-aligned member of the SIMD-BP128 family called for by the north star.
- **packed**: fixed-width bit packing per block — the whole array is stored
  at the smallest uint width that fits its max value (1 tag byte + raw
  little-endian data). Used for term frequencies (almost always uint8).

Chunk layout (one parquet row per posting chunk, see index/build.py):
``docs`` = varbyte([docids[0], diff(docids)...]), ``tfs`` = packed(tfs).
"""

from __future__ import annotations

import numpy as np

_VB_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def _varbyte_emit(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Shared varbyte kernel: encode a non-empty unsigned array into a
    flat byte buffer. Returns (uint8 byte buffer, per-value END offsets)
    so callers can slice the stream per value/group. The only Python
    loop runs once per OCCUPIED byte position (≤10 iterations, usually
    1-3 — the threshold scan stops at the array max, and uint32 input
    stays uint32, so small-delta posting streams touch a fraction of
    the memory the unconditional uint64 version did)."""
    amax = a.max()
    nbytes = np.ones(a.size, dtype=np.int64)
    for t in _VB_THRESHOLDS:
        if amax < t:
            break
        nbytes += a >= a.dtype.type(t)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    dt = a.dtype.type
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        chunk = (a[mask] >> dt(7 * j)) & dt(0x7F)
        more = (nbytes[mask] - 1) > j
        out[starts[mask] + j] = chunk.astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
    return out, ends


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to variable-byte bytes."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    out, _ = _varbyte_emit(a)
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode variable-byte bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        out[mask] |= (b[starts[mask] + j] & np.uint8(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * j)
    return out


_PACK_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.uint32, 3: np.uint64}


def pack_ints(values: np.ndarray) -> bytes:
    """Fixed-width pack: 1 tag byte (dtype code) + little-endian raw data."""
    a = np.asarray(values)
    m = int(a.max(initial=0))
    if m < (1 << 8):
        code = 0
    elif m < (1 << 16):
        code = 1
    elif m < (1 << 32):
        code = 2
    else:
        code = 3
    data = np.ascontiguousarray(a.astype(_PACK_DTYPES[code]))
    return bytes([code]) + data.tobytes()


def unpack_ints(buf: bytes) -> np.ndarray:
    if not buf:
        return np.empty(0, dtype=np.uint64)
    code = buf[0]
    return np.frombuffer(buf, dtype=_PACK_DTYPES[code], offset=1)


def varbyte_encode_grouped(
    values: np.ndarray, group_offsets: np.ndarray
) -> "pa.BinaryArray":
    """Varbyte-encode `values` once and slice the byte stream into one
    binary cell per group (groups delimited by `group_offsets`, length
    n_groups+1) — the vectorized builder for per-(term,doc) position
    blobs. No per-group Python: one encode pass over all values, then the
    group byte boundaries index straight into the shared buffer via
    ``BinaryArray.from_buffers`` (zero-copy)."""
    import pyarrow as pa

    go = np.ascontiguousarray(group_offsets, dtype=np.int64)
    n_groups = int(go.size - 1)
    a = np.ascontiguousarray(values)
    if a.dtype not in (np.dtype(np.uint32), np.dtype(np.uint64)):
        a = a.astype(np.uint64)  # uint32 passes through un-upcast
    if a.size == 0:
        return pa.array([b""] * n_groups, type=pa.binary())
    out, ends = _varbyte_emit(a)
    total = int(ends[-1])
    if total >= (1 << 31):  # binary offsets are int32
        raise ValueError(
            f"grouped varbyte stream too large for one batch ({total} B);"
            " reduce batch size"
        )
    cum = np.concatenate(([0], ends))
    byte_offsets = cum[go].astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        n_groups,
        [
            None,
            pa.py_buffer(byte_offsets.tobytes()),
            pa.py_buffer(out.tobytes()),
        ],
    )


def decode_grouped_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of the per-group delta encoding used for position blobs:
    `buf` is a concatenation of per-group varbyte delta streams, `counts`
    gives the number of positions in each group (= tf per doc). Returns
    the flat absolute positions (int64), groups back-to-back in order.

    Each group's first delta is its absolute first position, so the
    global cumsum minus the running total at each group start restores
    absolutes without a per-group loop."""
    deltas = varbyte_decode(buf).astype(np.int64)
    c = np.ascontiguousarray(counts, dtype=np.int64)
    if deltas.size != int(c.sum()):
        raise ValueError(
            f"position blob has {deltas.size} values, counts sum to "
            f"{int(c.sum())}"
        )
    if deltas.size == 0:
        return deltas
    run = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(c)))[:-1]
    adj = np.zeros(c.size, dtype=np.int64)
    nz = starts > 0
    adj[nz] = run[starts[nz] - 1]
    return run - np.repeat(adj, c)


def encode_docids(docids: np.ndarray) -> bytes:
    """Delta + varbyte encode a sorted array of docIDs."""
    a = np.ascontiguousarray(docids, dtype=np.int64)
    if a.size == 0:
        return b""
    deltas = np.empty(a.size, dtype=np.uint64)
    deltas[0] = np.uint64(a[0])
    if a.size > 1:
        deltas[1:] = np.diff(a).astype(np.uint64)
    return varbyte_encode(deltas)


def decode_docids(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_docids`; returns int64 docIDs."""
    deltas = varbyte_decode(buf)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.int64))


# ----------------------------------------------------------------------
# BP128-style block bit packing (the bit-aligned member of the family;
# varbyte above is the byte-aligned one). MEASURED DECISION: on this
# stack (pure numpy, no SIMD intrinsics) bp128 stores 13-25% fewer
# bytes but decodes 4-6x SLOWER than varbyte (400k uint64: 28 vs 6 ms
# small-delta, 141 vs 24 ms large) because the bit-matrix expansion is
# O(n*width) element ops while varbyte is O(bytes) byte passes - so
# varbyte stays the serving codec (decode latency dominates query
# time) and bp128 is kept as the tested, size-optimal alternative for
# cold archival segments. Layout per buffer:
#   [u32 n_values][per-block: 1 width byte + ceil(128*w/8) data bytes]
# Values are packed little-endian-bit-first within each 128-value block
# at the block's max bit width. Encode/decode are vectorized by GROUPING
# BLOCKS OF EQUAL WIDTH (≤ 33 distinct widths → ≤ 33 numpy passes over
# all blocks of that width at once, never per value or per block).
# ----------------------------------------------------------------------

BP_BLOCK = 128


def bp128_encode(values: np.ndarray) -> bytes:
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = a.size
    header = np.uint32(n).tobytes()
    if n == 0:
        return header
    nblocks = -(-n // BP_BLOCK)
    padded = np.zeros(nblocks * BP_BLOCK, dtype=np.uint64)
    padded[:n] = a
    blocks = padded.reshape(nblocks, BP_BLOCK)
    maxes = blocks.max(axis=1)
    widths = np.zeros(nblocks, dtype=np.int64)
    nz = maxes > 0
    widths[nz] = np.floor(np.log2(maxes[nz].astype(np.float64))).astype(
        np.int64
    ) + 1
    # float log2 can under-report at 2^k boundaries — repair exactly.
    # Clamp the shift to 63: shifting a uint64 by 64 is C-level UB
    # (platform-dependent in numpy), and a width-64 block can never need
    # the repair anyway, so those lanes are masked out.
    shift = np.minimum(widths, 63).astype(np.uint64)
    bad = nz & (widths < 64) & ((maxes >> shift) > 0)
    widths[bad] += 1
    out_parts: list[bytes] = []
    block_bytes = np.where(widths > 0, (BP_BLOCK * widths + 7) // 8, 0)
    offsets = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(block_bytes + 1, out=offsets[1:])  # +1 width byte each
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    buf[offsets[:-1]] = widths.astype(np.uint8)
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        vals = blocks[sel]  # (k, 128)
        # bit matrix (k, 128, w), LSB first per value
        shifts = np.arange(w, dtype=np.uint64)
        bits = (
            (vals[:, :, None] >> shifts[None, None, :]) & np.uint64(1)
        ).astype(np.uint8)
        packed = np.packbits(
            bits.reshape(len(sel), BP_BLOCK * int(w)),
            axis=1,
            bitorder="little",
        )  # (k, ceil(128w/8))
        pb = int((BP_BLOCK * int(w) + 7) // 8)
        dst = (
            offsets[sel][:, None] + 1 + np.arange(pb)[None, :]
        ).ravel()
        buf[dst] = packed.ravel()
    out_parts.append(buf.tobytes())
    return header + b"".join(out_parts)


def bp128_decode(buf: bytes) -> np.ndarray:
    if len(buf) < 4:
        return np.empty(0, dtype=np.uint64)
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nblocks = -(-n // BP_BLOCK)
    data = np.frombuffer(buf, dtype=np.uint8, offset=4)
    # walk widths to find block offsets (O(nblocks) tiny python loop —
    # nblocks = n/128, and each step is one indexed read)
    widths = np.zeros(nblocks, dtype=np.int64)
    offsets = np.zeros(nblocks, dtype=np.int64)
    pos = 0
    for i in range(nblocks):
        offsets[i] = pos
        w = int(data[pos])
        widths[i] = w
        pos += 1 + ((BP_BLOCK * w + 7) // 8 if w else 0)
    out = np.zeros(nblocks * BP_BLOCK, dtype=np.uint64)
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        pb = int((BP_BLOCK * int(w) + 7) // 8)
        src = (
            offsets[sel][:, None] + 1 + np.arange(pb)[None, :]
        ).ravel()
        packed = data[src].reshape(len(sel), pb)
        bits = np.unpackbits(
            packed, axis=1, count=BP_BLOCK * int(w), bitorder="little"
        ).reshape(len(sel), BP_BLOCK, int(w)).astype(np.uint64)
        shifts = np.arange(int(w), dtype=np.uint64)
        vals = (bits << shifts[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )
        out[(sel[:, None] * BP_BLOCK + np.arange(BP_BLOCK)[None, :])] = (
            vals
        )
    return out[:n]
