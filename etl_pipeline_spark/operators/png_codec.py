"""Pure-Python/numpy PNG codec for the X5 multimodal path (r6).

PNG is zlib (stdlib) + per-row byte filters, so unlike JPEG it decodes
fully from the spec with no native image library:

- **Decoder**: chunk walk with CRC verification, IHDR parse, multi-IDAT
  concatenation, inflate, per-row unfiltering (None/Sub/Up/Average/
  Paeth, RFC 2083 §6), then color-type assembly: 0 grayscale (channel
  replicated), 2 RGB, 3 palette via PLTE (tRNS-transparent entries kept
  as their palette color), 4 gray+alpha and 6 RGBA (alpha dropped —
  feature extraction wants pixel statistics, not compositing; the guard
  comment marks where a compositor would plug in), and — r9 — Adam7
  interlace (seven per-pass filtered sub-images reassembled onto the
  pass grid, empty passes contributing no bytes) plus 16-bit depth
  (filters unfilter at the 2-byte lane width per RFC 2083 §6.2, then
  samples reduce to 8-bit by MSB — the standard depth reduction).
  Sub-byte depths (1/2/4-bit) keep a NotImplementedError guard.
- **Encoder**: (h, w, 3) RGB uint8 -> filter-0 rows, one zlib IDAT,
  sequential or Adam7-interlaced. Exists for fixtures and round-trip
  tests (PNG is lossless, so interlaced decode must be byte-exact).

Interop is tested against real libpng output (CPython's test-suite
PNGs, palette + tRNS) in tests/test_multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\x0a"


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass — RFC
# 2083 §2.6. A pass whose sub-image is empty for the given dimensions
# contributes NOTHING to the stream (not even filter bytes).
ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filter_rows(sub: np.ndarray, cycle: bool) -> list[bytes]:
    """Serialize a (ph, pw, ch) sub-image as filtered rows. cycle=False
    emits filter 0 everywhere; cycle=True cycles None/Sub/Up/Average/
    Paeth by row index so decode fixtures exercise every filter —
    including Up/Average/Paeth against the PREVIOUS ROW OF THE PASS,
    the neighbor semantics Adam7 makes subtle."""
    ph, pw, ch = sub.shape
    out = []
    prev = np.zeros((pw * ch,), dtype=np.int64)
    for r in range(ph):
        cur = sub[r].reshape(-1).astype(np.int64)
        f = (r % 5) if cycle else 0
        a = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            enc = cur - a
        elif f == 2:  # Up
            enc = cur - prev
        elif f == 3:  # Average
            enc = cur - (a + prev) // 2
        else:  # Paeth
            c = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = cur - pred
        out.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return out


def encode_png(
    pixels: np.ndarray,
    interlace: bool = False,
    filter_cycle: bool = False,
    depth16: bool = False,
) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as an 8-bit truecolor PNG,
    sequential (default) or Adam7-interlaced (``interlace=True`` — the
    seven-pass pixel shuffle; exists so the decoder's interlace
    reassembly has self-made fixtures; PNG is lossless, so interlaced
    decode must reproduce the input byte-exactly)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {pixels.shape}")
    h, w, _ = pixels.shape
    ihdr = struct.pack(
        ">IIBBBBB", w, h, 16 if depth16 else 8, 2, 0, 0, 1 if interlace else 0
    )
    if depth16:
        # widen by replication (v * 257 = (v << 8) | v): the standard
        # 8-to-16 expansion whose MSB round-trips exactly
        wide = pixels.astype(">u2") * 257
        rows = np.ascontiguousarray(
            wide.view(np.uint8).reshape(h, w, 6)
        )
    else:
        rows = np.ascontiguousarray(pixels, dtype=np.uint8)
    if interlace:
        parts = []
        for x0, y0, xs, ys in ADAM7:
            sub = rows[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass: no bytes at all
            parts.extend(_filter_rows(np.ascontiguousarray(sub), filter_cycle))
        raw = b"".join(parts)
    else:
        raw = b"".join(_filter_rows(rows, filter_cycle))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-row filters; raw is (h, 1 + w*bpp) uint8.
    None/Up/Sub are vectorized (Sub is a per-byte-lane wrapping cumsum);
    Average and Paeth are genuinely sequential in the left neighbor and
    run on plain Python ints (several times faster than per-element
    numpy scalar indexing — r6 review)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = int(raw[r, 0])
        if ftype == 0:  # None
            out[r] = raw[r, 1:]
        elif ftype == 2:  # Up
            out[r] = raw[r, 1:] + out[r - 1] if r > 0 else raw[r, 1:]
        elif ftype == 1:  # Sub: wrapping cumsum per byte lane (uint8 wraps)
            out[r] = np.cumsum(
                raw[r, 1:].reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype in (3, 4):
            line = raw[r, 1:].tolist()
            prev = out[r - 1].tolist() if r > 0 else [0] * stride
            cur = [0] * stride
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 3:  # Average
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
            out[r] = cur
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {r}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG into an (h, w, 3) RGB uint8
    array (gray replicated; palette expanded; alpha dropped)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated PNG chunk {typ!r}")
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad IHDR compression/filter method {comp}/{filt}")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(f"{depth}-bit PNG not supported (8/16-bit only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette PNG is not a legal combination")
    # PNG filters operate on BYTES with bpp = channels * bytes-per-sample
    # (RFC 2083 §6.2), so 16-bit planes unfilter at twice the lane width
    # and samples reduce to 8-bit by taking the MSB afterwards
    sample_bytes = depth // 8
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        # Adam7 (r9): seven independently-filtered sub-images, each
        # unfiltered with its OWN row geometry then scattered onto the
        # pass grid; empty passes contribute no bytes
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            stride = 1 + pw * channels * sample_bytes
            seg = raw[off : off + ph * stride]
            if len(seg) != ph * stride:
                raise ValueError("truncated Adam7 pass data")
            off += ph * stride
            rows = np.frombuffer(seg, dtype=np.uint8).reshape(ph, stride)
            sub = _unfilter(rows, ph, pw, channels * sample_bytes).reshape(
                ph, pw, channels, sample_bytes
            )[..., 0]  # MSB for 16-bit; identity for 8-bit
            px[y0::ys, x0::xs] = sub
        if off != len(raw):
            raise ValueError(
                f"PNG Adam7 data: consumed {off} of {len(raw)} bytes"
            )
    else:
        stride = 1 + w * channels * sample_bytes
        if len(raw) != h * stride:
            raise ValueError(
                f"PNG pixel data: want {h * stride} bytes, got {len(raw)}"
            )
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        px = _unfilter(rows, h, w, channels * sample_bytes).reshape(
            h, w, channels, sample_bytes
        )[..., 0]  # MSB for 16-bit; identity for 8-bit
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 6:
        return np.ascontiguousarray(px[..., :3])  # alpha dropped (see module doc)
    if ctype == 0 or ctype == 4:
        g = px[..., 0]
        return np.ascontiguousarray(np.stack([g, g, g], axis=-1))
    # ctype == 3: palette lookup
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = px[..., 0]
    if int(idx.max()) >= plte.shape[0]:
        raise ValueError("PNG palette index out of range")
    return np.ascontiguousarray(plte[idx])
