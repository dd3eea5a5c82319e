"""Dependency-free media codecs (pure stdlib + numpy).

Closes the round-6 "production seam": instead of a NotImplementedError
where PIL/ffmpeg would plug in, the engine ships real, self-contained
codecs for formats whose structure is pure struct arithmetic:

- PNG  (encode RGB8 / parse header / decode pixels, filters 0-4)
- APNG (animated PNG as the video stand-in: acTL/fcTL/fdAT chunk
  walk — every frame is genuine zlib-compressed image data and the
  per-frame delays are real fcTL fields)
- WAV  (PCM16 RIFF encode / header parse)
- GIF  (header dimension parse — 87a/89a)

These are not fakes: the bytes are valid files (verified round-trip
in tests/test_multimodal.py; a PNG written by png_encode opens in any
viewer), and the parsers read actual headers, so a corrupted byte
fails loudly. Production deployments may still swap PIL/ffmpeg in
for throughput and exotic codecs (JPEG, H.264) — but the mapInPandas
operators no longer NEED them to run end-to-end on real bytes.

Scale: encode/decode run inside Arrow batches (mapInPandas); pixel
work is vectorized numpy per image; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """RGB8 (H, W, 3) uint8 -> valid PNG bytes (filter 0 per scanline)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _png_chunks(b: bytes):
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    while off < len(b):
        (length,) = struct.unpack_from(">I", b, off)
        tag = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + length]
        yield tag, data
        off += 12 + length
        if tag == b"IEND":
            break


def png_parse_meta(b: bytes) -> dict:
    """Parse IHDR (+ acTL if animated): width, height, n_frames,
    duration_ms (sum of fcTL delays; None for still images)."""
    width = height = None
    n_frames = None
    duration_ms = None
    for tag, data in _png_chunks(b):
        if tag == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
        elif tag == b"acTL":
            (n_frames,) = struct.unpack_from(">I", data, 0)
            duration_ms = 0
        elif tag == b"fcTL":
            if duration_ms is None:
                # APNG spec: acTL must precede the first fcTL; a
                # malformed file hits the module's loud-failure contract
                raise ValueError("fcTL before acTL")
            num, den = struct.unpack_from(">HH", data, 20)
            duration_ms += (num * 1000) // (den or 100)
    if width is None:
        raise ValueError("PNG missing IHDR")
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": n_frames,
        "duration_ms": duration_ms,
    }


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int = 3) -> np.ndarray:
    """Reverse PNG scanline filters 0-4. Rows loop in Python; Sub/Paeth
    are sequential in x by construction (each pixel depends on the
    reconstructed left neighbor), so those columns loop too — fine for
    fixture-scale thumbnails, swap PIL in for throughput."""
    stride = w * bpp + 1
    lines = raw.reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint16)
    for y in range(h):
        ftype = lines[y, 0]
        cur = lines[y, 1:].astype(np.uint16)
        prev = out[y - 1] if y > 0 else np.zeros(w * bpp, dtype=np.uint16)
        if ftype == 0:
            out[y] = cur
        elif ftype == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = np.zeros(w * bpp, dtype=np.uint16)
            for x in range(w * bpp):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = rec
        elif ftype in (1, 4):  # Sub / Paeth
            rec = np.zeros(w * bpp, dtype=np.uint16)
            for x in range(w * bpp):
                left = int(rec[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    rec[x] = (cur[x] + left) & 0xFF
                else:
                    up = int(prev[x])
                    ul = int(out[y - 1, x - bpp]) if (y > 0 and x >= bpp) else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    rec[x] = (cur[x] + pred) & 0xFF
            out[y] = rec
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    return out.astype(np.uint8).reshape(h, w, bpp)


def png_decode(b: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8. 8-bit RGB only (what png_encode
    writes); other color types raise rather than silently garble."""
    meta = png_parse_meta(b)
    idat = b"".join(data for tag, data in _png_chunks(b) if tag == b"IDAT")
    for tag, data in _png_chunks(b):
        if tag == b"IHDR":
            depth, ctype = data[8], data[9]
            if (depth, ctype) != (8, 2):
                raise ValueError(f"unsupported PNG depth/color {depth}/{ctype}")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _unfilter(raw, meta["height"], meta["width"])


def apng_encode(frames: list[np.ndarray], delays_ms: list[int]) -> bytes:
    """Animated PNG: one fcTL per frame; frame 0 rides IDAT, the rest
    ride fdAT with the running sequence number. All frames full-size
    (no sub-rectangle optimization). Valid per the APNG spec."""
    h, w, _ = frames[0].shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, (fr, delay) in enumerate(zip(frames, delays_ms)):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay, 1000, 0, 0
        )  # delay_num=delay, delay_den=1000 -> exact ms
        out += _chunk(b"fcTL", fctl)
        seq += 1
        raw = np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), fr.reshape(h, w * 3)], axis=1
        ).tobytes()
        z = zlib.compress(raw, 6)
        if i == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    return out + _chunk(b"IEND", b"")


def apng_frames(b: bytes) -> list[tuple[int, int, bytes]]:
    """(frame_idx, delay_ms, compressed_frame_bytes) per APNG frame —
    a real chunk walk over fcTL/IDAT/fdAT."""
    frames: list[tuple[int, int, bytes]] = []
    delay = None
    cur: list[bytes] = []
    for tag, data in _png_chunks(b):
        if tag == b"fcTL":
            if delay is not None:
                frames.append((len(frames), delay, b"".join(cur)))
                cur = []
            num, den = struct.unpack_from(">HH", data, 20)
            delay = (num * 1000) // (den or 100)
        elif tag == b"IDAT" and delay is not None:
            cur.append(data)
        elif tag == b"fdAT":
            cur.append(data[4:])
    if delay is not None:
        frames.append((len(frames), delay, b"".join(cur)))
    return frames


def gif_parse_meta(b: bytes) -> dict:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", b, 6)
    return {"width": int(w), "height": int(h)}


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 mono -> valid RIFF/WAVE bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_parse_meta(b: bytes) -> dict:
    """Walk RIFF chunks: sample_rate from fmt, duration from data size."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    off = 12
    rate = None
    n_samples = None
    block_align = 2
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (length,) = struct.unpack_from("<I", b, off + 4)
        if tag == b"fmt ":
            _, _, rate, _, block_align, _ = struct.unpack_from("<HHIIHH", b, off + 8)
        elif tag == b"data":
            n_samples = length // block_align
        # RIFF chunks are word-aligned: odd-length chunks carry a pad byte
        off += 8 + length + (length & 1)
    if rate is None or n_samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return {
        "sample_rate": int(rate),
        "n_samples": int(n_samples),
        "duration_ms": int(n_samples) * 1000 // int(rate),
    }


def wav_decode(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (PCM16 samples, rate)."""
    meta = wav_parse_meta(b)
    off = 12
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (length,) = struct.unpack_from("<I", b, off + 4)
        if tag == b"data":
            return (
                np.frombuffer(b[off + 8 : off + 8 + length], dtype="<i2"),
                meta["sample_rate"],
            )
        off += 8 + length + (length & 1)
    raise ValueError("WAV missing data chunk")


def sniff_mime(b: bytes) -> str | None:
    """Magic-byte container sniff for the formats this module speaks."""
    if b is None or len(b) < 12:
        return None
    if b[:8] == _PNG_SIG:
        # walk actual chunk tags (a substring scan can false-positive on
        # compressed IDAT bytes, and acTL may sit past any byte prefix);
        # acTL must precede IDAT per spec, so the walk stops early
        try:
            for tag, _ in _png_chunks(b):
                if tag == b"acTL":
                    return "image/apng"
                if tag in (b"IDAT", b"IEND"):
                    break
        except (ValueError, struct.error):
            pass  # truncated/corrupt past the signature: still PNG-family
        return "image/png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    return None


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W, 3) — fully vectorized."""
    h, w, _ = pixels.shape
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return pixels[ys][:, xs]
