"""From-scratch 32-bit Roaring bitmap codec (portable serialization).

Deletion vectors in the Delta protocol store the deleted row indexes of
one data file as a Roaring bitmap — the same compressed-set format the
RoaringBitmap/CRoaring projects publish as the "portable" interchange
spec (the public RoaringFormatSpec document). This module implements
that wire format from scratch, writer and reader, with numpy-vectorized
container packing:

- values are split on the high 16 bits into containers;
- a container with ≤ 4096 values is an ARRAY container (sorted uint16
  little-endian);
- a denser container is a BITMAP container (1024 × uint64 bitset,
  8 KiB);
- the stream is ``cookie | container count | (key, cardinality-1) pairs
  | container byte offsets | containers``, everything little-endian.

We always emit cookie 12346 (``SERIAL_COOKIE_NO_RUNCONTAINER``) — run
containers are an optional encoding the spec lets writers skip — and
accept the same on read (a cookie advertising run containers is
rejected loudly rather than misdecoded). Row indexes within one parquet
file fit comfortably in 32 bits, so the 64-bit RoaringBitmapArray
wrapper the Delta spec names collapses to this single bitmap here
(``sources/delta_log.py`` documents that subset).
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_SERIAL_COOKIE_RUNCONTAINER = 12347
_ARRAY_MAX = 4096


def serialize(values) -> bytes:
    """Serialize an iterable/array of uint32 values (any order,
    duplicates collapsed) into the portable Roaring format."""
    arr = np.unique(np.asarray(list(values) if not isinstance(
        values, np.ndarray) else values, dtype=np.uint32))
    keys = (arr >> 16).astype(np.uint16)
    lows = (arr & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(arr)]
    n = len(uniq_keys)
    head = struct.pack("<ii", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    desc = b"".join(
        struct.pack("<HH", int(k), (bounds[i + 1] - bounds[i]) - 1)
        for i, k in enumerate(uniq_keys)
    )
    # offsets are from the START of the stream (cookie byte 0)
    offset_base = len(head) + len(desc) + 4 * n
    containers = []
    offsets = []
    pos = offset_base
    for i in range(n):
        chunk = lows[bounds[i]: bounds[i + 1]]
        if len(chunk) <= _ARRAY_MAX:
            payload = chunk.astype("<u2").tobytes()
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[chunk] = True
            payload = np.packbits(bits, bitorder="little").tobytes()
        offsets.append(pos)
        containers.append(payload)
        pos += len(payload)
    offs = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + offs + b"".join(containers)


def deserialize(data: bytes, base: int = 0) -> np.ndarray:
    """Decode a portable Roaring stream (starting at byte ``base``) into a
    sorted uint32 array. Container byte offsets inside the stream are
    relative to the stream's own start, per the portable spec."""
    cookie, = struct.unpack_from("<i", data, base)
    if cookie == _SERIAL_COOKIE_RUNCONTAINER or (cookie & 0xFFFF) == _SERIAL_COOKIE_RUNCONTAINER:
        raise ValueError(
            "roaring stream uses run containers; this codec writes and "
            "reads the no-run-container portable layout only"
        )
    if cookie != SERIAL_COOKIE_NO_RUNCONTAINER:
        raise ValueError(f"not a portable roaring stream (cookie {cookie})")
    n, = struct.unpack_from("<i", data, base + 4)
    desc = np.frombuffer(data, dtype="<u2", count=2 * n, offset=base + 8)
    keys = desc[0::2].astype(np.uint32)
    cards = desc[1::2].astype(np.int64) + 1
    offs = np.frombuffer(data, dtype="<u4", count=n, offset=base + 8 + 4 * n)
    out = []
    for i in range(n):
        off = base + int(offs[i])
        card = int(cards[i])
        if card <= _ARRAY_MAX:
            lows = np.frombuffer(
                data, dtype="<u2", count=card, offset=off
            ).astype(np.uint32)
        else:
            words = np.frombuffer(data, dtype=np.uint8, count=8192, offset=off)
            bits = np.unpackbits(words, bitorder="little")
            lows = np.nonzero(bits)[0].astype(np.uint32)
            if len(lows) != card:
                raise ValueError(
                    f"bitmap container cardinality mismatch: header {card}, "
                    f"decoded {len(lows)}"
                )
        out.append((keys[i] << 16) | lows)
    if not out:
        return np.empty(0, dtype=np.uint32)
    return np.concatenate(out)


def _stream_length(data: bytes, base: int) -> int:
    """Byte length of the portable Roaring stream starting at ``base``
    (streams are self-describing: last container offset + its size)."""
    n, = struct.unpack_from("<i", data, base + 4)
    if n == 0:
        return 8
    desc = np.frombuffer(data, dtype="<u2", count=2 * n, offset=base + 8)
    cards = desc[1::2].astype(np.int64) + 1
    offs = np.frombuffer(data, dtype="<u4", count=n, offset=base + 8 + 4 * n)
    last_card = int(cards[-1])
    last_size = 2 * last_card if last_card <= _ARRAY_MAX else 8192
    return int(offs[-1]) + last_size


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray framing — the exact serialization the public
# Delta protocol names for deletion vectors ("portable" format): a magic
# number, the count of 32-bit sub-bitmaps, then per sub-bitmap its high-32
# key followed by the standard 32-bit portable stream above. Everything
# little-endian.
# ---------------------------------------------------------------------------

RBM_ARRAY_MAGIC = 1681511377


def serialize_array(values) -> bytes:
    """Serialize 64-bit values into the RoaringBitmapArray portable
    framing: ``magic i32 | number of bitmaps i64 | (key u32 | 32-bit
    portable stream)*``, keys ascending."""
    arr = np.unique(np.asarray(
        values if isinstance(values, np.ndarray) else list(values),
        dtype=np.uint64,
    ))
    keys = (arr >> np.uint64(32)).astype(np.uint32)
    lows = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(arr)]
    parts = [struct.pack("<iq", RBM_ARRAY_MAGIC, len(uniq_keys))]
    for i, k in enumerate(uniq_keys):
        parts.append(struct.pack("<I", int(k)))
        parts.append(serialize(lows[bounds[i]: bounds[i + 1]]))
    return b"".join(parts)


def deserialize_array(data: bytes, base: int = 0) -> np.ndarray:
    """Decode a RoaringBitmapArray portable framing into a sorted uint64
    array."""
    magic, n = struct.unpack_from("<iq", data, base)
    if magic != RBM_ARRAY_MAGIC:
        raise ValueError(
            f"not a RoaringBitmapArray stream (magic {magic}, "
            f"expected {RBM_ARRAY_MAGIC})"
        )
    pos = base + 12
    out = []
    for _ in range(n):
        key, = struct.unpack_from("<I", data, pos)
        pos += 4
        lows = deserialize(data, pos).astype(np.uint64)
        pos += _stream_length(data, pos)
        out.append((np.uint64(key) << np.uint64(32)) | lows)
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(out)
