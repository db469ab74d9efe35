"""Deterministic media codecs: header-level encoders + independent parsers.

This is the real implementation behind the multimodal column component
(brief: "decode / feature-extract ... as Pandas UDFs"): pure-stdlib,
deterministic, no media libraries. Encoders build structurally valid
container files (PNG per the W3C PNG spec, JPEG/JFIF per ITU T.81, WAV per
the RIFF/WAVE format, MP4 per ISO/IEC 14496-12 box structure); decoders are
*independent header parsers* — they walk chunks/markers/boxes and extract
the dimensional metadata a PIL/ffmpeg probe would return, validating
signatures and (for PNG) the IHDR CRC32.

Encoders are sized so every byte length is a closed-form function of the
input parameters (PNG IDAT uses zlib level-0 stored blocks: len+11 framing
for payloads < 64 KiB), which makes the whole decode pipeline
SQL-replayable by the DuckDB oracle (__spark_entry__.multimodal_decoded).

All functions are pure; like the other kernels they are the "model
weights" of this engine and run executor-side inside Arrow batches.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------- encoders


def make_png(width: int, height: int) -> bytes:
    """Valid 8-bit RGB PNG. Pixel bytes are deterministic in (x, y).

    Total size = 68 + height*(1 + 3*width) as long as the raw scanline
    stream stays under one zlib stored block (< 64 KiB).
    """
    if not (1 <= width and 1 <= height and height * (1 + 3 * width) <= 60000):
        raise ValueError("png dims out of the single-stored-block envelope")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            raw += bytes(((x * 3 + y * 7 + c * 11) % 256 for c in range(3)))
    idat = zlib.compress(bytes(raw), 0)  # level 0 => stored blocks, len+11
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def make_jpeg(width: int, height: int, scan_len: int) -> bytes:
    """Minimal baseline JFIF: SOI + APP0 + SOF0(3 components) + SOS + scan + EOI.

    Scan bytes avoid 0xFF so no escaping is needed. Total size = 55 + scan_len.
    """
    if not (1 <= width <= 0xFFFF and 1 <= height <= 0xFFFF and scan_len >= 0):
        raise ValueError("jpeg params out of range")
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3 * 3, 8, height, width, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3) + bytes([1, 0, 2, 0x11, 3, 0x11, 0, 63, 0])
    scan = bytes(((i * 7 + 13) % 255 for i in range(scan_len)))  # never 0xFF
    return b"\xff\xd8" + app0 + sof0 + sos + scan + b"\xff\xd9"


def make_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """Canonical 44-byte-header PCM16 WAV with deterministic samples.

    Total size = 44 + n_samples * channels * 2.
    """
    data = bytearray()
    for i in range(n_samples * channels):
        data += struct.pack("<h", ((i * 257 + 19) % 2003) - 1001)
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + bytes(data)
    )


def make_mp4(timescale: int, duration: int, mdat_len: int) -> bytes:
    """ISO-BMFF skeleton: ftyp + moov(mvhd v0) + mdat. Total = 144 + mdat_len."""

    def box(tag: bytes, data: bytes) -> bytes:
        return struct.pack(">I", 8 + len(data)) + tag + data

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")  # 20 bytes
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time (fixed: deterministic)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">IH2x", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 8  # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)  # identity matrix
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )  # 108 bytes
    moov = box(b"moov", mvhd)  # 116 bytes
    mdat = box(b"mdat", bytes(((i * 31 + 7) % 256 for i in range(mdat_len))))
    return ftyp + moov + mdat


# ----------------------------------------------------------------- parsers


class MediaDecodeError(ValueError):
    """Raised on malformed/truncated payloads or checksum failures."""


def _decode_guard(fn):
    """Re-raise low-level parse failures as MediaDecodeError.

    The parsers index into attacker-shaped bytes: a CRC-valid-but-short
    IHDR hits struct.error, an unknown PNG color type hits the channel-map
    KeyError, corrupt IDAT hits zlib.error. Callers (decode_media
    strict=False, decode_assets on_error='quarantine') are contracted to
    survive any malformed payload, so only MediaDecodeError may escape.
    """
    import functools

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except MediaDecodeError:
            raise
        except (struct.error, KeyError, IndexError, zlib.error, OverflowError) as exc:
            raise MediaDecodeError(f"{fn.__name__}: malformed payload ({exc!r})") from exc

    return inner


def sniff_format(payload: bytes) -> str | None:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return None


@_decode_guard
def decode_png(payload: bytes) -> dict:
    """Walk PNG chunks; return IHDR fields. Verifies signature and IHDR CRC."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise MediaDecodeError("bad PNG signature")
    pos, ihdr, saw_iend = 8, None, False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise MediaDecodeError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if tag == b"IHDR":
            if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
                raise MediaDecodeError("IHDR CRC mismatch")
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            ihdr = {
                "format": "png",
                "width": w,
                "height": h,
                "bit_depth": depth,
                "channels": {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color],
            }
        if tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if ihdr is None:
        raise MediaDecodeError("no IHDR chunk")
    if not saw_iend:
        raise MediaDecodeError("truncated PNG: no IEND chunk")
    return ihdr


@_decode_guard
def decode_jpeg(payload: bytes) -> dict:
    """Walk JPEG markers to the first SOF0/1/2; return frame dimensions."""
    if payload[:2] != b"\xff\xd8":
        raise MediaDecodeError("bad JPEG SOI")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise MediaDecodeError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):  # baseline / ext sequential / progressive
            depth, h, w, ncomp = struct.unpack(">BHHB", payload[pos + 4 : pos + 10])
            return {"format": "jpeg", "width": w, "height": h, "bit_depth": depth, "channels": ncomp}
        if marker == 0xDA:  # SOS: entropy-coded data follows, SOF must precede
            raise MediaDecodeError("no SOF before SOS")
        pos += 2 + seglen
    raise MediaDecodeError("no SOF marker")


@_decode_guard
def decode_wav(payload: bytes) -> dict:
    """Walk RIFF chunks; return fmt fields + sample count from the data size."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("bad RIFF/WAVE header")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + length > len(payload):
            raise MediaDecodeError("truncated RIFF chunk")
        if tag == b"fmt ":
            codec, channels, rate, _, block, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            fmt = (codec, channels, rate, block, bits)
        elif tag == b"data":
            data_len = length
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or data_len is None:
        raise MediaDecodeError("missing fmt/data chunk")
    codec, channels, rate, block, bits = fmt
    return {
        "format": "wav",
        "channels": channels,
        "sample_rate": rate,
        "bit_depth": bits,
        "n_samples": data_len // block if block else 0,
    }


@_decode_guard
def decode_mp4(payload: bytes) -> dict:
    """Walk top-level ISO-BMFF boxes into moov/mvhd; return timescale+duration."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise MediaDecodeError("not an ISO-BMFF file")

    def walk(buf: bytes, want: bytes) -> bytes | None:
        pos = 0
        while pos + 8 <= len(buf):
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            if size < 8 or pos + size > len(buf):
                raise MediaDecodeError("bad box size")
            if buf[pos + 4 : pos + 8] == want:
                return buf[pos + 8 : pos + size]
            pos += size
        return None

    moov = walk(payload, b"moov")
    mvhd = walk(moov, b"mvhd") if moov is not None else None
    if mvhd is None:
        raise MediaDecodeError("no moov/mvhd box")
    version = mvhd[0]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", mvhd[20:32])
    else:
        timescale, duration = struct.unpack(">II", mvhd[12:20])
    return {"format": "mp4", "timescale": timescale, "duration": duration}


_DECODERS = {"png": decode_png, "jpeg": decode_jpeg, "wav": decode_wav, "mp4": decode_mp4}


def decode_header(payload: bytes) -> dict:
    """Sniff + parse. Raises MediaDecodeError on unknown/malformed payloads."""
    fmt = sniff_format(payload or b"")
    if fmt is None:
        raise MediaDecodeError("unrecognized container format")
    return _DECODERS[fmt](payload)


# ------------------------------------------------- pixel/sample transforms


@_decode_guard
def decode_png_pixels(payload: bytes):
    """Full PNG decode for 8-bit RGB/gray images: chunk walk, zlib
    inflate, scanline DEFILTER (all five PNG filter types per the spec).
    Returns (width, height, channels, bytes pixels row-major)."""
    hdr = decode_png(payload)
    if hdr["bit_depth"] != 8 or hdr["channels"] not in (1, 3):
        raise MediaDecodeError("pixel decode supports 8-bit gray/RGB only")
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        if tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise MediaDecodeError("PNG pixel data length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise MediaDecodeError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def make_png_from_pixels(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """8-bit gray/RGB pixels -> PNG (filter 0, zlib level 0 — same framing
    as make_png, so byte lengths stay closed-form)."""
    if channels not in (1, 3) or len(pixels) != width * height * channels:
        raise ValueError("bad pixel buffer")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    color = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    idat = zlib.compress(bytes(raw), 0)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


@_decode_guard
def resize_png_nearest(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize of an 8-bit gray/RGB PNG (floor index
    mapping: src = floor(dst * src_dim / dst_dim)), re-encoded with the
    closed-form framing."""
    import numpy as np

    w, h, ch, pix = decode_png_pixels(payload)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, ch)
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    out = arr[ys][:, xs]
    return make_png_from_pixels(new_w, new_h, ch, out.tobytes())


@_decode_guard
def decode_wav_samples(payload: bytes):
    """(sample_rate, channels, int16 numpy array of frames*channels)."""
    import numpy as np

    hdr = decode_wav(payload)
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"data":
            data = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
    if data is None:
        raise MediaDecodeError("no data chunk")
    return hdr["sample_rate"], hdr["channels"], np.frombuffer(data, dtype="<i2")


@_decode_guard
def decimate_wav(payload: bytes, k: int) -> bytes:
    """Keep every k-th PCM frame; declared sample rate divides by k
    (rate % k must be 0 — a real resampler would filter first; frame
    decimation is the deterministic stdlib-only stand-in)."""
    import numpy as np

    rate, ch, samples = decode_wav_samples(payload)
    if rate % k:
        raise ValueError(f"rate {rate} not divisible by {k}")
    frames = samples.reshape(-1, ch)[::k]
    data = frames.astype("<i2").tobytes()
    n = len(data)
    fmt = struct.pack("<HHIIHH", 1, ch, rate // k, (rate // k) * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", n) + data
    )
