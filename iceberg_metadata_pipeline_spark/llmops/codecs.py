"""Pure-Python media codecs for the multimodal pipeline.

The container has no external codec libraries (no PIL / pyav / torchaudio),
but several REAL, publicly-specified media formats are decodable with just
the standard library and numpy:

- WAV (RIFF PCM audio)  — stdlib ``wave`` module + numpy frombuffer
- BMP (Windows bitmap, uncompressed 24-bit BI_RGB) — struct header + numpy
- PPM (Netpbm P6, maxval 255) — ASCII header + raw RGB bytes
- Y4M (YUV4MPEG2 uncompressed video, the ffmpeg/x264 interchange format)
  — plain-text header + raw YUV planes per FRAME
- PNG (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced) — stdlib zlib
  inflate + per-scanline unfilter (Sub/Up/Average/Paeth) + numpy reshape
- GIF (87a/89a first frame, global/local palettes, 4-pass interlace) —
  from-scratch GIF-flavor LZW (LSB-first variable 3..12-bit codes)

These kernels are the real thing: they parse actual bytes of actual formats
and return pixel/sample arrays. Only formats that genuinely require an
external codec (JPEG/MP4/Opus...; palette/16-bit/interlaced PNG;
GIF animation compositing) stay behind the documented
NotImplementedError seam in ``multimodal.decode_image_stub``.

Encoders are included so tests and the synthetic-media pipeline can
round-trip: encode → decode must be bit-faithful for the supported subset.

Scale notes: every function here is a per-row kernel invoked from
mapInPandas over Arrow batches — map-side only, no shuffle, and numpy
vectorizes the per-payload work (frombuffer / reshape / strided resize),
so the Python overhead is per-payload, not per-pixel.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# sniffing


def sniff_media(payload: bytes) -> str:
    """Magic-byte content sniff → media type string. Formats we can decode
    in-container are marked; everything else returns its honest type so the
    caller can route it to the external-codec seam."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:2] == b"P6":
        return "image/x-portable-pixmap"
    if payload[:9] == b"YUV4MPEG2":
        return "video/x-yuv4mpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if payload[:2] == b"\xff\xd8":
        return "image/jpeg"
    if payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


DECODABLE = {
    "audio/wav",
    "image/bmp",
    "image/x-portable-pixmap",
    "video/x-yuv4mpeg",
    "image/png",
    "image/gif",
}


# ---------------------------------------------------------------------------
# WAV — RIFF PCM via the stdlib wave module

_SAMPWIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM payload: format metadata plus sample-level
    features (peak, RMS) computed over the actual PCM samples."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    dtype = _SAMPWIDTH_DTYPE.get(sampwidth)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width: {sampwidth}")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sampwidth == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = samples - 128.0
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    rms = float(np.sqrt(np.mean(samples * samples))) if samples.size else 0.0
    return {
        "media_kind": "audio",
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_samples": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / rate)) if rate else 0,
        "peak": peak,
        "rms": rms,
        "width": None,
        "height": None,
        "n_frames": None,
    }


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000, n_channels: int = 1) -> bytes:
    """int16 PCM samples → RIFF/WAVE bytes (interleaved if multi-channel)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit BI_RGB, BITMAPINFOHEADER


def decode_bmp(payload: bytes, with_pixels: bool = False) -> dict:
    """Parse an uncompressed 24-bit BMP. Handles bottom-up (positive
    height, the common case) and top-down (negative height) row order and
    the 4-byte row padding the format requires. Returns H×W×3 RGB pixels
    when with_pixels=True."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size: {header_size}")
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    top_down = height_raw < 0
    height = abs(height_raw)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    out = {
        "media_kind": "image",
        "width": width,
        "height": height,
        "n_channels": 3,
        "n_frames": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    if with_pixels:
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=height * row_stride, offset=data_offset
        ).reshape(height, row_stride)[:, : width * 3]
        img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR → RGB
        if not top_down:
            img = img[::-1]
        out["pixels"] = np.ascontiguousarray(img)
    return out


def encode_bmp(pixels: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp wants H×W×3 RGB")
    row_stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_stride), dtype=np.uint8)
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    pixel_bytes = padded.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


# ---------------------------------------------------------------------------
# PPM — Netpbm P6 binary RGB


def decode_ppm(payload: bytes, with_pixels: bool = False) -> dict:
    """Parse a binary PPM (P6). Header is whitespace-separated ASCII with
    #-comments; pixel data is raw RGB triplets."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval: {maxval}")
    out = {
        "media_kind": "image",
        "width": width,
        "height": height,
        "n_channels": 3,
        "n_frames": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    if with_pixels:
        out["pixels"] = np.frombuffer(
            payload, dtype=np.uint8, count=width * height * 3, offset=pos
        ).reshape(height, width, 3)
    return out


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_ppm wants H×W×3 RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2 uncompressed video (the ffmpeg/x264 interchange format)

_Y4M_CHROMA_FACTORS = {"420": 4, "420jpeg": 4, "420mpeg2": 4, "420paldv": 4, "444": 1, "mono": None}


def decode_y4m(payload: bytes, with_frames: bool = False, max_frames: int | None = None) -> dict:
    """Parse a YUV4MPEG2 stream: 'YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<fmt>'
    header, then per-frame 'FRAME<params>\\n' + raw planes. Returns frame
    count + geometry; with_frames=True also returns the luma (Y) planes as
    H×W uint8 arrays — the real pixels a sampling stage would featurize."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = None
    fps_num, fps_den, chroma = 25, 1, "420"
    for tok in header.split()[1:]:
        tag, val = tok[0], tok[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            fps_num, fps_den = (int(x) for x in val.split(":"))
        elif tag == "C":
            chroma = val
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _Y4M_CHROMA_FACTORS:
        raise ValueError(f"unsupported Y4M chroma mode: {chroma}")
    y_size = width * height
    factor = _Y4M_CHROMA_FACTORS[chroma]
    frame_size = y_size if factor is None else y_size + 2 * (y_size // factor)

    pos, n_frames, frames = nl + 1, 0, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"corrupt Y4M stream at offset {pos}")
        pos = payload.index(b"\n", pos) + 1
        if with_frames and (max_frames is None or len(frames) < max_frames):
            frames.append(
                np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=pos).reshape(
                    height, width
                )
            )
        pos += frame_size
        n_frames += 1
    out = {
        "media_kind": "video",
        "width": width,
        "height": height,
        "n_channels": 1 if factor is None else 3,
        "n_frames": n_frames,
        "sample_rate": None,
        "duration_ms": int(round(1000.0 * n_frames * fps_den / fps_num)),
    }
    if with_frames:
        out["frames"] = frames
    return out


def encode_y4m(frames_y: list[np.ndarray], fps: int = 25, chroma: str = "420") -> bytes:
    """Luma-plane frames (H×W uint8) → YUV4MPEG2 bytes with neutral chroma
    (128) planes — a valid grey-chroma stream any y4m consumer accepts."""
    h, w = frames_y[0].shape
    factor = _Y4M_CHROMA_FACTORS[chroma]
    parts = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C%s\n" % (w, h, fps, chroma.encode())]
    chroma_plane = b"" if factor is None else bytes([128]) * (2 * (w * h // factor))
    for fy in frames_y:
        if fy.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(fy, dtype=np.uint8).tobytes())
        parts.append(chroma_plane)
    return b"".join(parts)




# ---------------------------------------------------------------------------
# PNG — the one COMPRESSED web format decodable with just the stdlib:
# zlib inflate (RFC 1950) + per-scanline unfiltering (PNG spec §9,
# filters None/Sub/Up/Average/Paeth) + numpy reshape. Supports the
# non-interlaced 8-bit color types (gray, gray+alpha, RGB, RGBA);
# palette, 16-bit, and Adam7 interlace stay behind the honest
# NotImplementedError seam (reference parity: the reference ships no
# image codecs at all — Dockerfile.superset:32-41 installs Prophet, not
# PIL — so PNG decode is strictly additive surface).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def _png_chunks(payload: bytes):
    """Yield (chunk_type, data) pairs; stops at IEND."""
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length  # length + type + data + CRC


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters → (height, width*bpp) uint8.

    Filters 0/1/2 are fully vectorized (Sub is a strided modular prefix
    sum); Average/Paeth reference the in-progress row and fall back to a
    per-byte loop — the encoder below always writes filter 0, so
    round-trips never pay the slow path."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub: modular prefix sum per byte lane
            for k in range(bpp):
                lane = row[k::bpp].astype(np.uint64)
                row[k::bpp] = (np.cumsum(lane) & 0xFF).astype(np.uint8)
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + _png_paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
        out[y] = row
        prev = row
    return out


def decode_png(payload: bytes, with_pixels: bool = False) -> dict:
    """Parse a PNG: IHDR geometry always; inflate+unfilter to an
    H×W×C uint8 array when with_pixels=True."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
            bit_depth, color_type = data[8], data[9]
            interlace = data[12]
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    n_ch = _PNG_CHANNELS.get(color_type)
    out = {
        "media_kind": "image",
        "width": int(width),
        "height": int(height),
        "n_channels": n_ch,
        "n_frames": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    if not with_pixels:
        return out
    if n_ch is None or bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not decodable in-container: color_type={color_type} "
            f"bit_depth={bit_depth} interlace={interlace} (8-bit "
            "gray/gray+alpha/RGB/RGBA non-interlaced only)"
        )
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * n_ch)
    if len(raw) != expected:
        raise ValueError(f"PNG scanline data is {len(raw)} bytes, want {expected}")
    flat = _png_unfilter(raw, width, height, n_ch)
    img = flat.reshape(height, width, n_ch)
    out["pixels"] = img[:, :, 0] if n_ch == 1 else img
    return out


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """H×W (gray) or H×W×{2,3,4} uint8 → PNG bytes (filter 0, one IDAT)."""
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"encode_png wants 1/2/3/4 channels, got {c}")
    scanlines = bytearray()
    body = np.ascontiguousarray(pixels.astype(np.uint8)).reshape(h, w * c)
    for y in range(h):
        scanlines.append(0)  # filter type None
        scanlines += body[y].tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(scanlines), compress_level)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# pixel kernels


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index arrays — O(out pixels),
    no Python per-pixel loop. Works for H×W and H×W×C arrays."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    cols = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    return pixels[rows][:, cols]


def decode_any(payload: bytes, with_pixels: bool = False) -> dict:
    """Dispatch on sniffed magic to the right real decoder. Raises
    NotImplementedError for formats that need an external codec — the same
    seam contract as multimodal.decode_image_stub(real=True)."""
    kind = sniff_media(payload)
    if kind == "audio/wav":
        return {**decode_wav(payload), "media_type": kind}
    if kind == "image/bmp":
        return {**decode_bmp(payload, with_pixels=with_pixels), "media_type": kind}
    if kind == "image/x-portable-pixmap":
        return {**decode_ppm(payload, with_pixels=with_pixels), "media_type": kind}
    if kind == "video/x-yuv4mpeg":
        return {**decode_y4m(payload, with_frames=with_pixels), "media_type": kind}
    if kind == "image/png":
        return {**decode_png(payload, with_pixels=with_pixels), "media_type": kind}
    if kind == "image/gif":
        return {**decode_gif(payload, with_pixels=with_pixels), "media_type": kind}
    raise NotImplementedError(
        f"{kind}: requires an external codec (PIL/pyav); only WAV/BMP/PPM/Y4M/"
        "PNG(8-bit non-interlaced)/GIF(first frame) are decodable with the "
        "in-container stdlib+numpy kernels"
    )


# ---------------------------------------------------------------------------
# header-only probing — dimensions/duration WITHOUT decoding payloads
# ---------------------------------------------------------------------------

def probe_dimensions(payload: bytes) -> dict:
    """Parse just the container header: (media_type, width, height,
    n_frames_or_samples) from the first bytes of the blob. Covers the
    compressed web formats we deliberately do NOT decode in-container
    (PNG IHDR chunk, JPEG SOF marker walk, GIF logical-screen
    descriptor) plus the decodable ones (BMP DIB, PPM ASCII header, Y4M
    stream header, WAV fmt/data chunks). At 100 TB this is the metadata
    pass that runs BEFORE any expensive decode fan-out: filtering a
    petabyte of images by resolution reads kilobytes per file."""
    mt = sniff_media(payload)
    w = h = n = None
    try:
        if mt == "image/png" and payload[12:16] == b"IHDR" and len(payload) >= 24:
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
        elif mt == "image/jpeg":
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
                # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) carry dims
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    break
                i += 2 + seglen
        elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            mt = "image/gif"
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
        elif mt == "image/bmp":
            meta = decode_bmp(payload, with_pixels=False)
            w, h = meta["width"], meta["height"]
        elif mt == "image/x-portable-pixmap":
            meta = decode_ppm(payload, with_pixels=False)
            w, h = meta["width"], meta["height"]
        elif mt == "video/x-yuv4mpeg":
            meta = decode_y4m(payload, with_frames=False)
            w, h, n = meta["width"], meta["height"], meta["n_frames"]
        elif mt == "audio/wav":
            meta = decode_wav(payload)
            n = meta["n_samples"]
    except Exception:  # noqa: BLE001 — a truncated header probes as unknown
        pass
    return {"media_type": mt, "width": w, "height": h, "n_units": n}


# ---------------------------------------------------------------------------
# GIF — the second compressed format decodable with no external codec:
# LZW (GIF flavor: LSB-first bit packing, variable 3..12-bit codes,
# clear/end codes, 255-byte sub-block framing) is pure integer work.
# Covers GIF87a/GIF89a, global+local color tables, the 4-pass interlace,
# first frame (GIF animations carry independent frames; frame k>0 needs
# disposal-method compositing, which stays behind the seam).
# ---------------------------------------------------------------------------

def _gif_subblocks(payload: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at off; returns (data, next_off)."""
    out = bytearray()
    while True:
        if off >= len(payload):
            raise ValueError("GIF truncated inside sub-blocks")
        n = payload[off]
        off += 1
        if n == 0:
            return bytes(out), off
        out += payload[off : off + n]
        off += n


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-flavor LZW: codes are packed LSB-first; width starts at
    min_code_size+1 and grows after the table reaches 2^width, capped
    at 12 bits until the next CLEAR."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    pos = 0
    while len(out) < n_pixels:
        while bits < width:
            if pos >= len(data):
                return out  # tolerate missing END on truncated writers
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def decode_gif(payload: bytes, with_pixels: bool = False) -> dict:
    """Parse a GIF: logical-screen geometry always; LZW-decode the first
    frame through its palette to an H×W×3 uint8 array on request."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = int.from_bytes(payload[6:8], "little"), int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
        off += 3 * n
    n_frames = 0
    first: dict | None = None
    while off < len(payload):
        b = payload[off]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            _, off = _gif_subblocks(payload, off + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at {off}")
        left = int.from_bytes(payload[off + 1 : off + 3], "little")
        top = int.from_bytes(payload[off + 3 : off + 5], "little")
        w = int.from_bytes(payload[off + 5 : off + 7], "little")
        h = int.from_bytes(payload[off + 7 : off + 9], "little")
        ipacked = payload[off + 9]
        off += 10
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(payload[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
            off += 3 * n
        min_code = payload[off]
        data, off = _gif_subblocks(payload, off + 1)
        n_frames += 1
        if first is None:
            first = {
                "w": w, "h": h, "left": left, "top": top,
                "interlaced": bool(ipacked & 0x40),
                "palette": lct if lct is not None else gct,
                "min_code": min_code, "data": data,
            }
    if first is None:
        raise ValueError("GIF has no image frame")
    meta = {
        "format": "gif",
        "media_kind": "image",
        "width": sw,
        "height": sh,
        "n_channels": 3,
        "n_frames": n_frames,
        "interlaced": first["interlaced"],
    }
    if not with_pixels:
        return meta
    if first["palette"] is None:
        raise ValueError("GIF frame has no color table")
    idx = _gif_lzw_decode(first["data"], first["min_code"], first["w"] * first["h"])
    if len(idx) < first["w"] * first["h"]:
        raise ValueError(
            f"GIF LZW stream yielded {len(idx)} pixels, want {first['w'] * first['h']}"
        )
    arr = np.frombuffer(bytes(idx[: first["w"] * first["h"]]), dtype=np.uint8).reshape(
        first["h"], first["w"]
    )
    if first["interlaced"]:
        out = np.empty_like(arr)
        src = 0
        for start, step in _GIF_INTERLACE_PASSES:
            rows = range(start, first["h"], step)
            for r in rows:
                out[r] = arr[src]
                src += 1
        arr = out
    pal = first["palette"]
    if int(arr.max()) >= len(pal):
        raise ValueError("GIF pixel index beyond palette")
    meta["pixels"] = pal[arr]  # H×W×3 uint8
    return meta


def encode_gif(pixels: np.ndarray, interlaced: bool = False) -> bytes:
    """H×W×3 uint8 (≤256 distinct colors) → single-frame GIF89a.

    Writes literal LZW codes with a CLEAR before each table-growth point
    (the classic 'uncompressed GIF' technique): decodes on any compliant
    reader, no compression dictionary needed."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_gif wants H×W×3 uint8")
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; GIF palette holds 256")
    cbits = max(1, int(len(colors) - 1).bit_length())
    pal_n = 1 << cbits
    palette = np.zeros((pal_n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlaced:
        order = [r for start, step in _GIF_INTERLACE_PASSES for r in range(start, h, step)]
        idx = idx[order]
    min_code = max(2, cbits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # literal codes only; CLEAR whenever the table would have grown past
    # the current width, END at stream end
    acc = bits = 0
    body = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    budget = (1 << width) - end - 1  # table slots before width would grow
    for v in idx.reshape(-1).tolist():
        if budget == 0:
            emit(clear)
            budget = (1 << width) - end - 1
        emit(v)
        budget -= 1
    emit(end)
    if bits:
        body.append(acc & 0xFF)
    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (cbits - 1), 0, 0])
    out += palette.tobytes()
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    out += bytes([min_code])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
