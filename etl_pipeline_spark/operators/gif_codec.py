"""Pure-Python GIF decoder for the X5 multimodal path (r6).

GIF87a/89a from the public spec (GIF89a specification, CompuServe
1990): logical screen descriptor, global/local color tables, sub-block
walk, variable-width LZW decompression (the classic 12-bit dictionary
with clear/EOI codes), Adam-style 4-pass row de-interlacing, and
GCE transparency (transparent pixels keep the previous frame's value).
Multi-frame GIFs composite each image block onto the running canvas at
its (left, top) offset — disposal methods beyond "draw over" are not
modeled (documented; fine for features/frame-stats, not for exact
animation replay). Returns uint8 RGB frames.

No encoder: GIF writing needs LZW encode for no test benefit — the
round-trip story lives in PPM/BMP/PNG; GIF decode is interop-tested
against real fixtures (CPython test suite) in tests/test_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    tbl = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    return tbl, pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; return (bytes,
    position after the 0-length terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(out) and pos + n > len(data):
            raise ValueError("truncated GIF sub-block body")
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, expect: int) -> list[int]:
    """Variable-width LZW per the GIF89a spec, appendix F."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        table.clear()
        table.extend([i] for i in range(clear))
        table.append([])  # clear
        table.append([])  # eoi
        return min_code_size + 1

    width = reset()
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("GIF LZW: code out of range")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return out
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode a GIF87a/89a into a list of (h, w, 3) uint8 RGB frames
    (the running canvas after each image block). ``max_frames`` stops
    decoding early — the feature-extraction dispatch passes 1 so a
    200-frame animation doesn't pay 200 LZW passes for first-frame
    stats."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg_idx, _par = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(payload, pos, 2 << (flags & 0x07))
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg_idx < gct.shape[0]:
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension block")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _sub_blocks(payload, pos)
                # 89a spec fixes the GCE body at 4 bytes (flags, delay lo/hi,
                # transparent index); a shorter body is corrupt input and must
                # keep the ValueError contract, not IndexError on body[3]
                if body and len(body) < 4:
                    raise ValueError(
                        f"malformed GIF graphic-control extension: {len(body)}-byte body"
                    )
                transparent = body[3] if body and (body[0] & 0x01) else None
            else:  # comment / plain text / application
                _, pos = _sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block {block:#x} at {pos - 1}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"GIF image block ({left},{top})+{w}x{h} exceeds the {sw}x{sh} screen"
            )
        table = gct
        if iflags & 0x80:
            table, pos = _color_table(payload, pos, 2 << (iflags & 0x07))
        if table is None:
            raise ValueError("GIF image block without any color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = _lzw_decode(min_code, data, w * h)
        if len(idx) < w * h:
            raise ValueError(f"GIF pixel data: want {w * h} indices, got {len(idx)}")
        grid = np.array(idx[: w * h], dtype=np.int64).reshape(h, w)
        if iflags & 0x40:  # de-interlace the 4 passes
            order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
            deinter = np.zeros_like(grid)
            deinter[order] = grid
            grid = deinter
        region = canvas[top : top + h, left : left + w]
        # bounds-check only RENDERED pixels: a transparent index past the
        # palette is legal and lenient decoders accept it (r6 review)
        mask = grid != transparent if transparent is not None else np.ones_like(grid, bool)
        if mask.any() and int(grid[mask].max()) >= table.shape[0]:
            raise ValueError("GIF color index out of range")
        region[mask] = table[np.where(mask, grid, 0)][mask]
        frames.append(canvas.copy())
        transparent = None
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames
