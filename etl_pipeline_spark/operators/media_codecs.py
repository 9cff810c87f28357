"""Dependency-light media codecs for the X5 multimodal path.

Real encoders/decoders for three public formats that need only
numpy + struct — no Pillow/av/torchaudio in the container:

- **PPM (P6)** — Netpbm binary RGB. Header ``P6\\n<w> <h>\\n<maxval>\\n``
  then ``w*h*3`` raw bytes. Spec: netpbm's ppm(5) man page.
- **BMP (24-bit BI_RGB)** — 14-byte BITMAPFILEHEADER + 40-byte
  BITMAPINFOHEADER, rows stored bottom-up in BGR order, each row padded
  to a 4-byte boundary. Spec: Windows BITMAPINFOHEADER docs.
- **WAV (PCM 16-bit LE)** — RIFF container, ``fmt `` + ``data`` chunks;
  the decoder walks chunks so extra chunks (LIST, fact) are skipped.
- **PPM stream** — concatenated P6 images, the frame format ffmpeg's
  ``image2pipe`` / ``ppm_pipe`` demuxer reads; stands in for "video".

All decoders parse headers for real (dimensions, sample rate, chunk
walking) and return numpy arrays; any header corruption or size mismatch
raises ``ValueError``. The reference has no media handling at all
(BASELINE.json mandates the capability); these formats were chosen so
decode is genuinely end-to-end without native libraries.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6, maxval 255)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {pixels.shape}")
    h, w, _ = pixels.shape
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def _ppm_tokens(buf: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from ``buf`` starting
    at ``start``, skipping ``#`` comments (the Netpbm header grammar).
    Returns (values, offset_after_single_whitespace_following_last)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[i:j]))
        i = j
    # exactly one whitespace byte separates the header from raster data
    return vals, i + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (h, w, 3) uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_tokens(payload, 2, 3)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster truncated: want {need}, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def ppm_size(payload: bytes) -> int:
    """Total byte length of the P6 image starting at payload[0] — used to
    walk concatenated-PPM streams without decoding every frame twice."""
    (w, h, _), off = _ppm_tokens(payload, 2, 3)
    return off + w * h * 3


# ------------------------------------------------------- BMP (24-bit BI_RGB)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR byte order, 4-byte row pad)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = np.ascontiguousarray(pixels[::-1, :, ::-1], dtype=np.uint8)  # flip rows, RGB->BGR
    rows = bytearray()
    zeros = b"\x00" * pad
    for r in range(h):
        rows += bgr[r].tobytes() + zeros
    data_size = len(rows)
    file_size = 14 + 40 + data_size
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return file_header + info_header + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) RGB uint8 array.
    Handles bottom-up and top-down (negative height) row order and row
    padding; rejects compressed or non-24-bpp files."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    bpp, compression = struct.unpack_from("<H", payload, 28)[0], struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = stride * h
    raster = payload[data_offset : data_offset + need]
    if len(raster) != need:
        raise ValueError(f"BMP raster truncated: want {need}, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:  # bottom-up storage: flip back to top-down
        img = img[::-1]
    return np.ascontiguousarray(img)


# ------------------------------------------------------------ WAV (PCM s16le)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono PCM WAV."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(pcm), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM 16-bit mono/stereo WAV -> (sample_rate, samples[int16]).
    Walks RIFF chunks so files with extra chunks (LIST, fact) decode too;
    stereo is returned interleaved (duration = len / channels / rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sample_rate, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, _n_ch, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks are 2-byte aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sample_rate, np.frombuffer(data, dtype="<i2")


# ----------------------------------------------- PPM stream ("video") helpers


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Concatenate P6 frames — the ffmpeg image2pipe/ppm_pipe format."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Split a concatenated-PPM stream into decoded (h, w, 3) frames."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"bad frame magic at offset {pos}")
        size = ppm_size(payload[pos:])
        frames.append(decode_ppm(payload[pos : pos + size]))
        pos += size
    return frames


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (out_h, out_w, 3)
    — source index = floor(dst * src / out), the standard NN mapping."""
    h, w, _ = pixels.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return np.ascontiguousarray(pixels[rows][:, cols])
