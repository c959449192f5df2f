"""Pure-Python LZ4 *block* format codec — no ``lz4`` dependency.

Why this exists: real Pangeo/NASA Zarr v2 stores default to
``numcodecs.Blosc(cname="lz4", shuffle=SHUFFLE)``; this container has no
``lz4``/``blosc`` module, and the scan family (SURVEY §2.1) should read
default-compressed stores rather than raise (VERDICT r9 item 6).  The
LZ4 block format is a tiny, frozen public spec
(lz4/lz4 ``doc/lz4_Block_format.md``); this module implements it from
the spec text, with byte-level test vectors in tests/test_zarr.py that
were hand-assembled from the spec — NOT produced by this encoder — so
the decoder is not graded against its own assumptions.

Block format recap (spec): a block is a sequence of *sequences*; each
sequence = token byte (hi nibble = literal length, lo nibble = match
length - 4), optional LSIC length continuation bytes (255 = keep
reading), the literals, a 2-byte little-endian match offset (1..65535;
0 is invalid), then optional match-length continuation bytes.  The last
sequence is literals-only (no offset).  End-of-block restrictions: the
last 5 bytes are always literals; the last match must start at least
12 bytes before the end (blocks < 13 bytes are literal-only).  Match
copies may overlap (offset < matchlen) — they replicate — so the copy
loop must be front-to-back.

The decoder is the load-bearing half (scan path).  The encoder is a
simple greedy hash-chain matcher used by fixture writers and the blosc
encoder; it emits spec-valid blocks (honouring both end restrictions)
but makes no ratio claims.

Scale note: decode runs inside one Spark input partition per Zarr
chunk (sources/zarr_source.py) — per-task, bounded by chunk size, never
on the driver.  A Python loop over sequences is acceptable there
because sequences are rare relative to bytes (literal/match runs are
copied with slice assignment, not per byte); measured throughput is
recorded in SCALE.md.

Also here: the 4-byte-header framing ``numcodecs.LZ4`` uses (uint32
little-endian original size + one block), as ``numcodecs_lz4_decode``
/ ``..._encode`` — that is the exact on-disk form of a Zarr v2
``{"id": "lz4"}`` compressor.
"""

from __future__ import annotations

import struct

_MIN_MATCH = 4
# spec: last match must start >= 12 bytes before end; last 5 bytes are
# always literals
_MF_LIMIT = 12
_LAST_LITERALS = 5


class LZ4BlockError(ValueError):
    """Malformed LZ4 block (truncated stream, zero offset, overrun)."""


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 block into exactly ``dst_size`` bytes.

    Raises :class:`LZ4BlockError` on any spec violation — a zarr chunk
    that mis-decodes must fail loudly, never return garbage values.

    Hot-loop discipline (this runs per sequence, and match-dense
    streams — e.g. shuffled byte planes of quantized floats — have a
    sequence every few bytes): per-sequence bounds checks are replaced
    by trust-then-validate.  Overrunning reads of ``src`` raise
    IndexError (token/length bytes) or produce short slices; short
    slices shrink/grow the output bytearray away from ``dst_size``
    because bytearray slice-assignment is length-changing.  Both are
    caught by the final ``opos``/``len(out)`` equality checks, so every
    corruption still fails loudly — it just pays its check once per
    block instead of four times per sequence (measured ~2x on the
    match-dense case)."""
    src = bytes(src)
    n = len(src)
    out = bytearray(dst_size)
    pos = 0  # read cursor in src
    opos = 0  # write cursor in out
    if dst_size == 0 and n == 0:
        return b""
    # dst_size == 0 with a non-empty block is legal: the reference
    # encoder emits a single 0x00 token (empty last-literals sequence)
    # for empty input — the loop below accepts exactly that shape.
    try:
        while True:
            token = src[pos]
            pos += 1
            # --- literals -----------------------------------------------
            lit = token >> 4
            if lit:
                if lit == 15:
                    b = 255
                    while b == 255:
                        b = src[pos]
                        pos += 1
                        lit += b
                npos = pos + lit
                if npos > n:
                    raise LZ4BlockError("literal run past end of block")
                out[opos:opos + lit] = src[pos:npos]
                pos = npos
                opos += lit
            if pos >= n:
                if pos > n:
                    raise LZ4BlockError("truncated block")
                break  # last sequence: literals only, by spec
            # --- match --------------------------------------------------
            offset = src[pos] | (src[pos + 1] << 8)
            pos += 2
            mlen = token & 0x0F
            if mlen == 15:
                b = 255
                while b == 255:
                    b = src[pos]
                    pos += 1
                    mlen += b
            mlen += _MIN_MATCH
            start = opos - offset
            if start < 0 or offset == 0:
                if offset == 0:
                    raise LZ4BlockError("zero match offset is invalid")
                raise LZ4BlockError(
                    f"match offset {offset} reaches before output start"
                )
            if offset >= mlen:
                # disjoint copy
                end = opos + mlen
                out[opos:end] = out[start:start + mlen]
                opos = end
            else:
                # overlapping copy replicates the window front-to-back;
                # double the copied span each pass (O(log) passes, slice
                # copies, no per-byte loop)
                end = opos + mlen
                if end > dst_size:
                    raise LZ4BlockError("match run past end of output")
                avail = offset
                while opos < end:
                    take = avail if avail < end - opos else end - opos
                    out[opos:opos + take] = out[start:start + take]
                    opos += take
                    avail += take
    except IndexError:
        raise LZ4BlockError("truncated block") from None
    if opos != dst_size or len(out) != dst_size:
        raise LZ4BlockError(
            f"block decoded to {opos} bytes (buffer {len(out)}), "
            f"expected {dst_size}"
        )
    return bytes(out)


def _write_length(base_into_token: int, extra: int, buf: bytearray) -> None:
    """LSIC continuation bytes for a length whose token nibble is 15."""
    while extra >= 255:
        buf.append(255)
        extra -= 255
    buf.append(extra)


def lz4_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block encoder (hash table on 4-byte
    prefixes).  Spec-valid output: honours the 12-byte end-of-block
    match limit and the 5-byte final-literals rule.  Fixture/encoder
    use only — the decoder never trusts it (tests decode hand-built
    vectors too)."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    table: dict[int, int] = {}
    anchor = 0  # start of pending literals
    i = 0
    # blocks too small to ever contain a match are literal-only by spec
    limit = n - _MF_LIMIT
    while i < limit:
        key = src[i:i + 4]
        h = hash(key)
        cand = table.get(h)
        table[h] = i
        if (
            cand is None
            or i - cand > 65535
            or src[cand:cand + 4] != key
        ):
            i += 1
            continue
        # extend the match; it may not consume the last 5 bytes
        end_cap = n - _LAST_LITERALS
        mlen = 4
        while i + mlen < end_cap and src[cand + mlen] == src[i + mlen]:
            mlen += 1
        # emit sequence: literals [anchor, i) + match (offset, mlen)
        lit = i - anchor
        token_lit = 15 if lit >= 15 else lit
        token_m = mlen - _MIN_MATCH
        token_mn = 15 if token_m >= 15 else token_m
        out.append((token_lit << 4) | token_mn)
        if lit >= 15:
            _write_length(15, lit - 15, out)
        out += src[anchor:i]
        out += struct.pack("<H", i - cand)
        if token_m >= 15:
            _write_length(15, token_m - 15, out)
        i += mlen
        anchor = i
    # trailing literals (always at least the last 5 bytes when n >= 13,
    # the whole input otherwise)
    lit = n - anchor
    token_lit = 15 if lit >= 15 else lit
    out.append(token_lit << 4)
    if lit >= 15:
        _write_length(15, lit - 15, out)
    out += src[anchor:]
    return bytes(out)


def numcodecs_lz4_decode(buf: bytes) -> bytes:
    """Decode the ``numcodecs.LZ4`` framing: uint32-LE original size,
    then one LZ4 block — the on-disk bytes of a Zarr v2
    ``{"id": "lz4"}`` chunk."""
    if len(buf) < 4:
        raise LZ4BlockError("lz4 frame shorter than its 4-byte header")
    (size,) = struct.unpack("<I", buf[:4])
    return lz4_decompress(buf[4:], size)


def numcodecs_lz4_encode(buf: bytes) -> bytes:
    return struct.pack("<I", len(buf)) + lz4_compress(buf)
