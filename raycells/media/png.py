"""Real, stdlib-only image/audio codecs for the media pipeline.

The sandbox has no PIL/ffmpeg, but PNG needs only ``zlib`` (stdlib) and
WAV needs only byte arithmetic — so the round-2 "codecs stubbed"
boundary shrinks to video containers only. These are REAL codecs:

- :func:`encode_png_gray` / :func:`decode_png` — 8-bit greyscale (color
  type 0) and truecolor (type 2) PNG, no interlace. The decoder
  implements the full filter set (None/Sub/Up/Average/Paeth) and chunk
  CRC validation; the encoder writes filter-0 scanlines. Spec:
  the public PNG standard (RFC 2083 / ISO 15948).
- :func:`encode_wav_pcm8` / :func:`decode_wav` — canonical RIFF/WAVE
  PCM, 8-bit unsigned or 16-bit signed, mono or interleaved.

Content remains oracle-checkable: the pipeline encodes the
SQL-reproducible LCG plane (media/stages._synth_payload) into a real
PNG/WAV container, the decode stage recovers the identical samples
through the real codec, and the decoded-moment SQL is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "encode_png_gray",
    "decode_png",
    "encode_wav_pcm8",
    "decode_wav",
    "PNG_SIGNATURE",
    "WAV_MAGIC",
]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(arr: np.ndarray) -> bytes:
    """(h, w) uint8 → 8-bit greyscale PNG (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError(f"expected (h, w) greyscale plane, got {arr.shape}")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # scanlines: filter byte 0 + row bytes
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr
    idat = zlib.compress(raw.tobytes(), level=6)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 (grey) or (h, w, 3) uint8 (truecolor).
    Full filter support, CRC-checked chunks, no interlace/palette."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}); this decoder does 8-bit grey/truecolor"
        )
    bpp = 1 if color == 0 else 3
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_prev = np.zeros(stride, dtype=np.uint8)
    # reconstruction is DEFINED as mod-256 byte addition (PNG spec
    # §9.2); silence numpy's scalar-overflow RuntimeWarning so the
    # intentional uint8 wraparound survives -W error and doesn't spam
    # worker logs on Sub/Average/Paeth scanlines (ADVICE r3)
    with np.errstate(over="ignore"):
        for y in range(h):
            cur = raw[y, 1:].copy()
            up = out[y - 1] if y else zero_prev
            f = int(filters[y])
            if f == 0:
                out[y] = cur
            elif f == 2:  # Up — vectorized
                out[y] = cur + up
            elif f in (1, 3, 4):  # Sub/Average/Paeth — prior-pixel recurrence
                row = out[y]
                row[:bpp] = (
                    cur[:bpp]
                    if f == 1
                    else cur[:bpp] + (up[:bpp].astype(np.int32) // 2).astype(np.uint8)
                    if f == 3
                    else cur[:bpp] + up[:bpp]  # Paeth(0, b, 0) = b
                )
                for x in range(bpp, stride):
                    a = row[x - bpp]
                    if f == 1:
                        row[x] = cur[x] + a
                    elif f == 3:
                        row[x] = cur[x] + np.uint8(
                            (int(a) + int(up[x])) // 2
                        )
                    else:
                        row[x] = cur[x] + _paeth(
                            np.uint8(a), up[x], up[x - bpp]
                        )
            else:
                raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w) if color == 0 else out.reshape(h, w, 3)


def encode_wav_pcm8(samples: np.ndarray, sample_rate: int) -> bytes:
    """uint8 samples → canonical mono 8-bit PCM RIFF/WAVE."""
    samples = np.ascontiguousarray(samples, dtype=np.uint8)
    body = samples.tobytes()
    # RIFF word alignment: an odd-length data chunk carries one pad byte
    # EXCLUDED from the declared length (ADVICE r3 — decode_wav already
    # skips it via ``length & 1``)
    pad = b"\x00" if len(body) % 2 else b""
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body + pad
    )
    return WAV_MAGIC + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes):
    """RIFF/WAVE PCM bytes → (samples ndarray, sample_rate). 8-bit
    unsigned → uint8; 16-bit signed → int16. Multi-channel stays
    interleaved in one flat array."""
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, body = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt_code, _ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", chunk)
            if fmt_code != 1:
                raise ValueError(f"non-PCM WAV (format {fmt_code})")
        elif tag == b"data":
            body = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 8:
        return np.frombuffer(body, dtype=np.uint8), rate
    if bits == 16:
        return np.frombuffer(body, dtype="<i2"), rate
    raise ValueError(f"unsupported WAV bit depth {bits}")
