"""Dependency-free SPSS system-file (.sav / .zsav) reader (S11 —
reference: lib_materialize/datamart_materialize/spss.py:6-16, which
shells out to pyreadstat; this container lacks pyreadstat, so the
format is parsed natively from its PUBLIC specification, the PSPP
developer documentation "System File Format").

Supported (the subset a tabular converter needs):
- both byte orders (layout_code detection) and both magics
  ($FL2 bytecode/uncompressed, $FL3 zlib a.k.a. .zsav)
- numeric and string variables, incl. multi-element strings
  (continuation records, type == -1)
- compression 0 (raw), 1 (bias-centered bytecode RLE) and
  2 (zlib block stream over bytecode, via the ztrailer block table)
- long variable names (extension record subtype 13)
- system-missing → null; padded strings are right-stripped

Not supported (raise with a clear message rather than mis-parse):
very-long-string segmentation (>255 byte widths, subtype 14) and
EBCDIC-encoded files.

Like the XLSX/Stata readers this is a DRIVER-side converter: a .sav
file is single-node data by construction; the parquet it writes then
enters the distributed pipeline like any other table.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SYSMIS = -1.7976931348623157e308  # lowest finite double


class _Var:
    __slots__ = ("name", "width", "n_elems")

    def __init__(self, name: str, width: int):
        self.name = name
        self.width = width  # 0 = numeric, >0 = string byte width
        self.n_elems = 1 if width == 0 else (width + 7) // 8


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise ValueError(f"truncated .sav file (wanted {n} bytes)")
    return b


def _parse_header_and_dictionary(f):
    """Consume everything up to (and including) the type-999 dictionary
    terminator. Returns (endian, compression, bias, n_cases, vars)."""
    magic = _read_exact(f, 4)
    if magic not in (b"$FL2", b"$FL3"):
        raise ValueError(f"not an SPSS system file (magic {magic!r})")
    _read_exact(f, 60)  # product name
    layout_raw = _read_exact(f, 4)
    # layout_code is 2 (sometimes 3) — its byte order tells us the file's
    (lay_le,) = struct.unpack("<i", layout_raw)
    endian = "<" if lay_le in (2, 3) else ">"
    _nominal, compression, _weight, n_cases = struct.unpack(
        endian + "4i", _read_exact(f, 16)
    )
    (bias,) = struct.unpack(endian + "d", _read_exact(f, 8))
    _read_exact(f, 84)  # creation date/time, file label, padding
    if magic == b"$FL3" and compression != 2:
        compression = 2

    variables: list[_Var] = []
    long_names: dict[str, str] = {}
    while True:
        (rec,) = struct.unpack(endian + "i", _read_exact(f, 4))
        if rec == 999:
            _read_exact(f, 4)  # filler
            break
        if rec == 2:  # variable record
            vtype, has_label, n_missing = struct.unpack(
                endian + "3i", _read_exact(f, 12)
            )
            _read_exact(f, 8)  # print/write formats
            name = (
                _read_exact(f, 8).decode("latin-1").rstrip()
            )
            if has_label:
                (llen,) = struct.unpack(endian + "i", _read_exact(f, 4))
                _read_exact(f, (llen + 3) // 4 * 4)
            if n_missing:
                _read_exact(f, 8 * abs(n_missing))
            if vtype == -1:
                continue  # continuation of the preceding string
            if vtype > 255:
                raise ValueError(
                    "very-long-string (>255 bytes) .sav variables are "
                    "not supported by the native reader"
                )
            variables.append(_Var(name, vtype))
        elif rec == 3:  # value labels (skipped) …
            (n,) = struct.unpack(endian + "i", _read_exact(f, 4))
            for _ in range(n):
                _read_exact(f, 8)
                (ll,) = struct.unpack("B", _read_exact(f, 1))
                _read_exact(f, (ll // 8 + 1) * 8 - 1)
        elif rec == 4:  # … and their variable list
            (n,) = struct.unpack(endian + "i", _read_exact(f, 4))
            _read_exact(f, 4 * n)
        elif rec == 6:  # documents
            (n,) = struct.unpack(endian + "i", _read_exact(f, 4))
            _read_exact(f, 80 * n)
        elif rec == 7:  # extension records
            subtype, size, count = struct.unpack(
                endian + "3i", _read_exact(f, 12)
            )
            data = _read_exact(f, size * count)
            if subtype == 13:  # long variable names: SHORT=Long\tSHORT=…
                for pair in data.decode("latin-1").split("\t"):
                    if "=" in pair:
                        short, long = pair.split("=", 1)
                        long_names[short.rstrip()] = long
            elif subtype == 14:
                raise ValueError(
                    "very-long-string .sav files are not supported by "
                    "the native reader"
                )
        else:
            raise ValueError(f"unknown .sav dictionary record type {rec}")

    for v in variables:
        v.name = long_names.get(v.name, v.name)
    return endian, compression, bias, n_cases, variables


def _zsav_payload(f, endian: str) -> bytes:
    """Decompress the .zsav ($FL3) zlib block stream into the bytecode
    payload, using the ztrailer's block table."""
    zheader_ofs, ztrailer_ofs, ztrailer_len = struct.unpack(
        endian + "3q", _read_exact(f, 24)
    )
    f.seek(ztrailer_ofs)
    trailer = _read_exact(f, ztrailer_len)
    # trailer: int64 bias, int64 zero, int32 block_size, int32 n_blocks
    _tb, _tz, _bsize, n_blocks = struct.unpack(
        endian + "qqii", trailer[:24]
    )
    out = []
    pos = 24
    for _ in range(n_blocks):
        _unc_ofs, comp_ofs, _unc_sz, comp_sz = struct.unpack(
            endian + "qqii", trailer[pos : pos + 24]
        )
        pos += 24
        f.seek(comp_ofs)
        out.append(zlib.decompress(_read_exact(f, comp_sz)))
    return b"".join(out)


def _decode_bytecode(payload: bytes, bias: float, endian: str) -> bytes:
    """Expand the bias-centered RLE bytecode stream into raw 8-byte
    elements. Command bytes arrive in groups of eight; literal blocks
    for 253-commands follow their group in order."""
    out = bytearray()
    spaces = b" " * 8
    sysmis8 = struct.pack(endian + "d", SYSMIS)
    i, n = 0, len(payload)
    while i < n:
        cmds = payload[i : i + 8]
        i += 8
        for c in cmds:
            if c == 0:  # padding
                continue
            if c == 252:  # end of data
                return bytes(out)
            if c == 253:  # literal block follows
                out += payload[i : i + 8]
                i += 8
            elif c == 254:
                out += spaces
            elif c == 255:
                out += sysmis8
            else:  # 1..251: the number (c - bias)
                out += struct.pack(endian + "d", c - bias)
    return bytes(out)


def read_sav(path: str) -> pa.Table:
    """Parse a .sav/.zsav file into an Arrow table (numeric → float64
    with system-missing as null, strings → utf8 right-stripped)."""
    with open(path, "rb") as f:
        endian, compression, bias, n_cases, variables = (
            _parse_header_and_dictionary(f)
        )
        if compression == 2:
            raw = _zsav_payload(f, endian)
            raw = _decode_bytecode(raw, bias, endian)
        elif compression == 1:
            raw = _decode_bytecode(f.read(), bias, endian)
        elif compression == 0:
            raw = f.read()
        else:
            raise ValueError(f"unknown .sav compression {compression}")

    elems_per_case = sum(v.n_elems for v in variables)
    if elems_per_case == 0:
        return pa.table({})
    n_rows = len(raw) // (8 * elems_per_case)
    if n_cases >= 0:
        n_rows = min(n_rows, n_cases)
    grid = np.frombuffer(
        raw[: n_rows * elems_per_case * 8], dtype=np.uint8
    ).reshape(n_rows, elems_per_case * 8)

    cols: dict[str, pa.Array] = {}
    e = 0
    dt = np.dtype(np.float64).newbyteorder(endian)
    for v in variables:
        span = grid[:, e * 8 : (e + v.n_elems) * 8]
        if v.width == 0:
            vals = span.copy().view(dt).ravel().astype(np.float64)
            cols[v.name] = pa.array(vals, mask=(vals == SYSMIS))
        else:
            data = span.tobytes()
            w = v.n_elems * 8
            cols[v.name] = pa.array(
                [
                    data[r * w : r * w + v.width]
                    .decode("latin-1")
                    .rstrip(" \x00")
                    for r in range(n_rows)
                ],
                type=pa.string(),
            )
        e += v.n_elems
    return pa.table(cols)


def convert_spss_to_parquet(src: str, out_dir: str) -> str:
    """SPSS .sav/.zsav → parquet directory (native parser, no optional
    dependency — supersedes the earlier pyreadstat-gated stub)."""
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(read_sav(src), os.path.join(out_dir, "data-00000.parquet"))
    return out_dir
