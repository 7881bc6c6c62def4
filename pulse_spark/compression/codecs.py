"""Posting-list codecs: delta+varint (docIDs) and unary (term
frequencies), bitstream-compatible with the reference
(pkg/compression/deltavarint/{writer,reader}.go,
pkg/compression/unary/{writer,reader}.go) and pinned by its test vectors
(deltavarint_test.go:17-35, unary_test.go:17-26).

numpy-vectorized where it pays (delta, cumsum, bit unpacking); the varint
byte loop runs per posting block (≤ block_size values), amortized inside
Arrow batches — never per-row Python at the DataFrame layer.

Formats:
  delta+varint: varint(v0), varint(v1-v0), ...   LEB128 — little-endian
                base-128, high bit = continuation (writer.go:25-43)
  unary:        value v (≥ min) → (v-min) 1-bits then a 0, MSB-first;
                final byte padded with 1-bits so a reader sees EOF
                (writer.go:28-102; freqs use min=1, lexicon.go:106-126)
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# delta + varint
# ---------------------------------------------------------------------------


def delta_varint_encode(values: np.ndarray | list[int]) -> bytes:
    """Encode a non-decreasing uint sequence as first value + deltas,
    each LEB128-uvarint-coded."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    out = bytearray()
    for v in deltas.tolist():  # per-block loop, bounded by block_size
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def delta_varint_decode(buf: bytes) -> np.ndarray:
    """Decode to the original uint64 sequence (running sum of uvarints)."""
    deltas = []
    shift = 0
    cur = 0
    for byte in buf:
        cur |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            deltas.append(cur)
            cur = 0
            shift = 0
    return np.cumsum(np.array(deltas, dtype=np.uint64), dtype=np.uint64)


# ---------------------------------------------------------------------------
# unary
# ---------------------------------------------------------------------------


def unary_encode(values: np.ndarray | list[int], minimum: int = 0) -> bytes:
    """(v - minimum) 1-bits then a terminating 0-bit, MSB-first; pad the
    final byte with 1-bits (reader EOFs inside a 1-run, writer.go:85-101)."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    lens = (arr - minimum + 1).astype(np.int64)  # n ones + one zero
    total = int(lens.sum())
    bits = np.ones(total, dtype=np.uint8)
    # positions of the terminating zeros
    ends = np.cumsum(lens) - 1
    bits[ends] = 0
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    return np.packbits(bits).tobytes()


def unary_decode(buf: bytes, minimum: int = 0) -> np.ndarray:
    """Count 1-runs up to each 0 bit; trailing 1-run (padding) ignored."""
    if not buf:
        return np.array([], dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    zeros = np.flatnonzero(bits == 0)
    if zeros.size == 0:
        return np.array([], dtype=np.uint64)
    starts = np.concatenate([[-1], zeros[:-1]])
    runs = zeros - starts - 1  # number of 1s before each 0
    return (runs + minimum).astype(np.uint64)
