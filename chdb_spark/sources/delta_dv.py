"""Delta Lake deletion-vector decoding — pure Python, no delta-spark.

Deletion vectors (PROTOCOL.md §Deletion Vectors) mark rows of a parquet
data file as deleted without rewriting the file: the ``add`` action
carries a descriptor ``{storageType, pathOrInlineDv, offset,
sizeInBytes, cardinality}`` and the vector itself is a 64-bit roaring
bitmap of deleted row indexes.

Binary layout implemented here, straight from the published spec and
the roaring format spec (github.com/RoaringBitmap/RoaringFormatSpec):

- DV FILE ('u'/'p' storage): 1 version byte (=1), then per vector at
  ``offset``: 4-byte big-endian data size, ``size`` bytes of data,
  4-byte big-endian CRC-32 of the data.
- DV DATA (also the 'i' inline payload): 4-byte little-endian magic
  1681511377, then the "portable" RoaringBitmapArray: 8-byte LE bitmap
  count, then per 32-bit bitmap a 4-byte LE high key + a standard
  32-bit roaring serialization (cookie 12346/12347, array / bitmap /
  run containers, all little-endian).
- 'u' storage path: pathOrInlineDv = ``<randomPrefix><z85 uuid>`` where
  the last 20 chars decode to the 16-byte UUID of
  ``deletion_vector_<uuid>.bin``. The encoding is **Z85** (ZeroMQ
  RFC 32 — the variant the spec names and delta-kernel implementations
  use), NOT Python's ``base64.b85*`` RFC-1924 alphabet; the two swap
  their letter/digit ranges, so the wrong codec yields a wrong UUID.
  Implemented below (stdlib gets ``z85decode`` only in 3.13).

The scan-side filtering lives in delta_py._scan_with_dv: descriptors
are expanded to (file, row_index) pairs in EXECUTORS via mapInPandas
and anti-joined against ``_metadata.row_index`` — the same
row-index-filter plan delta-spark itself executes, with no driver-side
row materialization.
"""

from __future__ import annotations

import os
import struct
import uuid
import zlib

import numpy as np

DV_MAGIC = 1681511377
_SERIAL_COOKIE = 12347  # with run containers (num containers in cookie)
_SERIAL_COOKIE_NO_RUN = 12346

#: Z85 alphabet (ZeroMQ RFC 32) — 4-byte big-endian blocks → 5 chars
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Standard Z85 over 4-byte blocks; inputs that are not a multiple
    of 4 are ZERO-PADDED first (delta's Base85Codec does the same for
    inline DVs — the descriptor's sizeInBytes trims on decode)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        block = []
        for _ in range(5):
            block.append(_Z85_ALPHABET[n % 85])
            n //= 85
        out.extend(reversed(block))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85: input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"z85: invalid character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError(
                f"z85: block {s[i:i + 5]!r} decodes above 2^32-1 "
                "(corrupt or wrong-alphabet input)"
            )
        out += n.to_bytes(4, "big")
    return bytes(out)


def dv_local_path(desc: dict, table_path: str) -> str:
    """Absolute path of the DV file named by a 'u'/'p' descriptor."""
    st = desc.get("storageType")
    rel = desc.get("pathOrInlineDv") or ""
    if st == "p":
        p = rel
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        return p if os.path.isabs(p) else os.path.join(table_path, p)
    if st == "u":
        prefix, enc = rel[:-20], rel[-20:]
        u = uuid.UUID(bytes=z85_decode(enc))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(table_path, prefix, name) if prefix else \
            os.path.join(table_path, name)
    raise NotImplementedError(
        f"Delta deletion vector storageType {st!r} (spec knows u/i/p)"
    )


def dv_data(desc: dict, table_path: str) -> bytes:
    """The raw DV data bytes (magic + bitmap) for any storage type,
    CRC-validated when stored in a file."""
    st = desc.get("storageType")
    if st == "i":
        raw = z85_decode(desc["pathOrInlineDv"])
        size = desc.get("sizeInBytes")
        # encode-side zero padding to the 4-byte block boundary is
        # trimmed by the descriptor's true size
        return raw[: int(size)] if size else raw
    fp = dv_local_path(desc, table_path)
    offset = int(desc.get("offset") or 0)
    size = int(desc["sizeInBytes"])
    with open(fp, "rb") as f:
        f.seek(offset)
        (stored_size,) = struct.unpack(">i", f.read(4))
        if stored_size != size:
            raise ValueError(
                f"deletion vector size mismatch in {fp}@{offset}: "
                f"stored {stored_size} != descriptor {size}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">i", f.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc & 0xFFFFFFFF:
        raise ValueError(f"deletion vector checksum mismatch in {fp}@{offset}")
    return data


def parse_dv(data: bytes) -> np.ndarray:
    """Deleted row indexes (sorted uint64) from DV data bytes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(
            f"deletion vector magic {magic} != {DV_MAGIC} (portable "
            "RoaringBitmapArray)"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    off = 12
    parts: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<i", data, off)
        off += 4
        vals, off = _parse_roaring32(data, off)
        parts.append(vals.astype(np.uint64) | (np.uint64(key) << np.uint64(32)))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


def _parse_roaring32(data: bytes, off: int) -> tuple[np.ndarray, int]:
    """One standard 32-bit roaring bitmap; returns (uint32 values, new
    offset). Container order and layouts per RoaringFormatSpec."""
    (cookie,) = struct.unpack_from("<I", data, off)
    off += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        run_flag_bytes = (n + 7) // 8
        run_flags = data[off : off + run_flag_bytes]
        off += run_flag_bytes
        has_run = True
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, off)
        off += 4
        run_flags = b""
        has_run = False
    else:
        raise ValueError(f"roaring: unknown cookie {cookie}")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, c = struct.unpack_from("<HH", data, off)
        off += 4
        keys[i], cards[i] = k, c + 1
    # offset section present unless (run-format and n < 4)
    if not has_run or n >= 4:
        off += 4 * n  # parsed sequentially; offsets are redundant
    parts: list[np.ndarray] = []
    for i in range(n):
        is_run = has_run and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, off)
            off += 2
            runs = np.frombuffer(
                data, dtype="<u2", count=2 * n_runs, offset=off
            ).reshape(-1, 2)
            off += 4 * n_runs
            vals = (
                np.concatenate(
                    [
                        # int() first: under NumPy 2 promotion rules a
                        # uint16 s+ln+1 would wrap at 65535 and the run
                        # would decode empty
                        np.arange(int(s), int(s) + int(ln) + 1,
                                  dtype=np.uint32)
                        for s, ln in runs
                    ]
                )
                if n_runs
                else np.empty(0, dtype=np.uint32)
            )
        elif cards[i] <= 4096:
            vals = np.frombuffer(
                data, dtype="<u2", count=int(cards[i]), offset=off
            ).astype(np.uint32)
            off += 2 * int(cards[i])
        else:
            words = np.frombuffer(data, dtype="<u8", count=1024, offset=off)
            off += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(vals | (np.uint32(keys[i]) << np.uint32(16)))
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, off


# -- write half: used by tests/fixtures to build spec-shaped DVs -------------


def serialize_dv(indexes) -> bytes:
    """DV data bytes (magic + portable RoaringBitmapArray) for a set of
    row indexes — array containers only, which the spec permits for any
    cardinality ≤ 4096 per 16-bit chunk; larger chunks use bitmaps."""
    idx = np.asarray(sorted(set(int(i) for i in indexes)), dtype=np.uint64)
    out = [struct.pack("<i", DV_MAGIC)]
    highs = (idx >> np.uint64(32)).astype(np.uint32)
    out.append(struct.pack("<q", len(np.unique(highs)) if len(idx) else 0))
    for hk in np.unique(highs):
        sub = (idx[highs == hk] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out.append(struct.pack("<i", int(hk)))
        out.append(_serialize_roaring32(sub))
    return b"".join(out)


def _serialize_roaring32(vals: np.ndarray) -> bytes:
    keys16 = (vals >> np.uint32(16)).astype(np.uint16)
    uniq = np.unique(keys16)
    n = len(uniq)
    out = [struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)]
    conts = []
    for k in uniq:
        low = (vals[keys16 == k] & np.uint32(0xFFFF)).astype(np.uint16)
        out.append(struct.pack("<HH", int(k), len(low) - 1))
        if len(low) <= 4096:
            conts.append(low.astype("<u2").tobytes())
        else:
            words = np.zeros(1024, dtype=np.uint64)
            np.bitwise_or.at(
                words, low >> np.uint16(6),
                np.uint64(1) << (low & np.uint16(63)).astype(np.uint64),
            )
            conts.append(words.astype("<u8").tobytes())
    # offset section (always present for the no-run cookie)
    pos = 4 + 4 + 4 * n + 4 * n
    for c in conts:
        out.append(struct.pack("<I", pos))
        pos += len(c)
    out.extend(conts)
    return b"".join(out)


def write_dv_file(path: str, datas: list[bytes]) -> list[int]:
    """Write a spec-shaped DV FILE holding each data blob; returns their
    offsets (for descriptors)."""
    offsets = []
    with open(path, "wb") as f:
        f.write(b"\x01")
        for data in datas:
            offsets.append(f.tell())
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return offsets
