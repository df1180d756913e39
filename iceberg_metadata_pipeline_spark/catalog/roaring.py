"""Roaring bitmap portable serialization, from the public
RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec) — the
interchange format Iceberg v3 deletion vectors and Delta deletion
vectors both build on.

32-bit layout (little-endian throughout):
- cookie ``12346`` (no run containers) followed by a 4-byte container
  count, or cookie ``12347 | ((count-1) << 16)`` (run containers
  present) followed by a ``(count+7)//8``-byte run-flag bitset;
- descriptive header: per container, key ``uint16`` + (cardinality-1)
  ``uint16``;
- offset header (present always for cookie 12346, and for 12347 only
  when count >= 4): per container a ``uint32`` byte offset from the
  start of the stream;
- containers in key order: array (``uint16`` values, cardinality <=
  4096), bitmap (8 KiB fixed), or run (``uint16`` run count, then
  (start, length-1) ``uint16`` pairs).

64-bit extension (the spec's "portable" 64-bit format, what Java's
``Roaring64NavigableMap.serializePortable`` writes): ``uint64`` count
of 32-bit buckets, then per bucket a ``uint32`` high-key + a full
32-bit portable bitmap.

Writing uses array/bitmap/run containers (run-length encoding chosen
per container when it is smaller — the same heuristic real writers
apply via ``runOptimize``); reading accepts all three. Round-trips are
property-tested; byte-level goldens are hand-derived from the spec in
tests/test_roaring.py.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_BITMAP_THRESHOLD = 4096  # cardinality above which an array container ends


def _split_containers(values: list[int]) -> list[tuple[int, list[int]]]:
    """Sorted distinct uint32 values → [(key, sorted low-16 values)]."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 32):
            raise ValueError(f"value {v} out of uint32 range")
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    out = []
    for k in sorted(buckets):
        lows = sorted(set(buckets[k]))
        out.append((k, lows))
    return out


def _runs_of(lows: list[int]) -> list[tuple[int, int]]:
    """Sorted values → [(start, length)] runs."""
    runs = []
    start = prev = lows[0]
    for v in lows[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start + 1))
        start = prev = v
    runs.append((start, prev - start + 1))
    return runs


def serialize32(values: list[int]) -> bytes:
    """Distinct uint32 values (any order) → portable roaring bytes."""
    containers = _split_containers(values)
    n = len(containers)
    if n == 0:
        # canonical empty bitmap: no-run cookie + zero containers
        return struct.pack("<II", SERIAL_COOKIE_NO_RUN, 0)

    # choose encoding per container: run if smaller than array/bitmap
    encoded: list[tuple[int, int, bytes, bool]] = []  # key, card, bytes, is_run
    for key, lows in containers:
        card = len(lows)
        runs = _runs_of(lows)
        run_size = 2 + 4 * len(runs)
        arr_size = 2 * card
        bmp_size = 8192
        plain_size = arr_size if card <= _BITMAP_THRESHOLD else bmp_size
        if run_size < plain_size:
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln - 1) for s, ln in runs
            )
            encoded.append((key, card, body, True))
        elif card <= _BITMAP_THRESHOLD:
            body = b"".join(struct.pack("<H", v) for v in lows)
            encoded.append((key, card, body, False))
        else:
            bits = bytearray(8192)
            for v in lows:
                bits[v >> 3] |= 1 << (v & 7)
            encoded.append((key, card, bytes(bits), False))

    has_runs = any(e[3] for e in encoded)
    out = bytearray()
    if has_runs:
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, e in enumerate(encoded):
            if e[3]:
                flags[i >> 3] |= 1 << (i & 7)
        out += flags
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, n)
    for key, card, _, _ in encoded:
        out += struct.pack("<HH", key, card - 1)
    write_offsets = (not has_runs) or n >= NO_OFFSET_THRESHOLD
    if write_offsets:
        pos = len(out) + 4 * n
        for _, _, body, _ in encoded:
            out += struct.pack("<I", pos)
            pos += len(body)
    for _, _, body, _ in encoded:
        out += body
    return bytes(out)


def deserialize32(data: bytes, offset: int = 0) -> tuple[list[int], int]:
    """→ (sorted values, bytes consumed from ``offset``)."""
    start = offset
    (cookie,) = struct.unpack_from("<I", data, offset)
    offset += 4
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nflag = (n + 7) // 8
        run_flags = data[offset : offset + nflag]
        offset += nflag
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, offset)
        offset += 4
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", data, offset)
        keys_cards.append((k, c + 1))
        offset += 4
    if has_offsets and n > 0:
        offset += 4 * n  # offsets are redundant for sequential reads
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if run_flags[i >> 3] & (1 << (i & 7)):
            (n_runs,) = struct.unpack_from("<H", data, offset)
            offset += 2
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", data, offset)
                offset += 4
                values.extend(range(base + s, base + s + lm1 + 1))
        elif card <= _BITMAP_THRESHOLD:
            for _ in range(card):
                (v,) = struct.unpack_from("<H", data, offset)
                offset += 2
                values.append(base + v)
        else:
            chunk = data[offset : offset + 8192]
            offset += 8192
            for byte_i, byte in enumerate(chunk):
                while byte:
                    low = byte & (-byte)
                    values.append(base + (byte_i << 3) + low.bit_length() - 1)
                    byte ^= low
    return values, offset - start


def serialize64(values: list[int]) -> bytes:
    """Distinct uint64 values → portable 64-bit roaring bytes."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 64):
            raise ValueError(f"value {v} out of uint64 range")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += serialize32(buckets[high])
    return bytes(out)


def deserialize64(data: bytes) -> list[int]:
    (n,) = struct.unpack_from("<Q", data, 0)
    offset = 8
    values: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<I", data, offset)
        offset += 4
        lows, consumed = deserialize32(data, offset)
        offset += consumed
        values.extend((high << 32) | v for v in lows)
    if offset != len(data):
        raise ValueError(
            f"trailing {len(data) - offset} bytes after roaring64 payload"
        )
    return values
