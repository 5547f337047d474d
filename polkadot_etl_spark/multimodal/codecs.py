"""Pure-Python/numpy image codecs for the multimodal pipeline: PNG
(zlib-backed, RFC 2083), BMP (BITMAPINFOHEADER, uncompressed), and
PPM/PGM (netpbm P5/P6).  No external media libraries — everything here
runs on the stock numpy + stdlib available on any Spark executor, so the
multimodal operators decode REAL encoded bytes instead of a fake raster.

JPEG remains an honest boundary (a DCT codec is out of scope without
PIL); `decode_auto` sniffs magic bytes and raises NotImplementedError for
JPEG when PIL is absent.

Decoded representation: uint8 ndarray, shape (h, w) for grayscale or
(h, w, 3) for RGB.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit greyscale (color type 0) or RGB (color type 2) PNG.
    Supports all five scanline filters (None/Sub/Up/Average/Paeth)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth} color={color} interlace={interlace})"
        )
    ch = 1 if color == 0 else 3
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = lines[y].copy()
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, dtype=np.int16)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            rec = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0  # left
                b = prev[x]  # up
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (int(a) + int(b)) // 2
                else:
                    c = prev[x - ch] if x >= ch else 0  # up-left
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Encode uint8 (h, w) or (h, w, 3) as a filter-0 PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, color, ch = *img.shape, 0, 1
        flat = img.reshape(h, w)
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        color, ch = 2, 3
        flat = img.reshape(h, w * 3)
    else:
        raise ValueError("expect (h,w) gray or (h,w,3) rgb")
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = flat
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed BITMAPINFOHEADER; 24-bit BGR or 8-bit palette/gray)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (method {comp}) not supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
        rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        img = rows[:, :, ::-1]  # BGR → RGB
    elif bpp == 8:
        # palette sits between the DIB header and the pixel array
        pal_off = 14 + hdr_size
        n_pal = (pix_off - pal_off) // 4
        pal = np.frombuffer(data, dtype=np.uint8, count=n_pal * 4, offset=pal_off)
        pal = pal.reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRA → RGB
        stride = (w + 3) & ~3
        idx = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
        idx = idx.reshape(h, stride)[:, :w]
        rgb = pal[idx]
        if np.all(rgb[:, :, 0] == rgb[:, :, 1]) and np.all(rgb[:, :, 1] == rgb[:, :, 2]):
            img = rgb[:, :, 0]  # grayscale palette → (h, w)
        else:
            img = rgb
    else:
        raise NotImplementedError(f"{bpp}-bpp BMP not supported")
    return img if top_down else img[::-1].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode uint8 (h, w) gray (as 8-bit palette BMP) or (h, w, 3) RGB
    (as 24-bit BMP), bottom-up rows, 4-byte padded."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 3:
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        pal = b""
        bpp, pix_off = 24, 54
    else:
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img[::-1]
        pal = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
        bpp, pix_off = 8, 54 + 1024
    pix = rows.tobytes()
    file_size = pix_off + len(pix)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pix), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    return header + dib + pal + pix


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary: P5 gray, P6 rgb)
# ---------------------------------------------------------------------------


def _pnm_header(data: bytes):
    """Parse 'P5'/'P6' + whitespace/comment-separated w, h, maxval."""
    magic = data[:2]
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return magic, vals[0], vals[1], vals[2], pos + 1  # single whitespace after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    magic, w, h, maxval, off = _pnm_header(data)
    if maxval != 255:
        raise NotImplementedError("only 8-bit netpbm supported")
    if magic == b"P5":
        return np.frombuffer(data, dtype=np.uint8, count=w * h, offset=off).reshape(h, w).copy()
    if magic == b"P6":
        return (
            np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
            .reshape(h, w, 3)
            .copy()
        )
    raise ValueError(f"unsupported netpbm magic {magic!r}")


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    magic = b"P6" if img.ndim == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, uncompressed PCM: 8-bit unsigned or 16-bit signed LE)
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed PCM WAV (RIFF/WAVE container; audio format 1;
    8-bit unsigned or 16-bit signed little-endian samples).

    Returns (samples, sample_rate) where samples is int16 ndarray of shape
    (n_frames, n_channels) — 8-bit input is re-centered to signed
    (v - 128) so both widths share the zero-centered convention the
    feature extractors (RMS / zero-crossing) assume.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > len(data):
            # A declared chunk length that overruns the buffer means the
            # blob is truncated — surface it as invalid, never a silent
            # short decode.
            raise ValueError("WAV chunk truncated (declared length exceeds buffer)")
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        # struct.unpack would raise struct.error, which the mapInPandas
        # decode wrappers don't treat as "invalid blob" — keep the contract
        # that undecodable bytes raise ValueError/NotImplementedError.
        raise ValueError("WAV fmt chunk too short")
    audio_format, n_ch, rate, _byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format}) not supported")
    if bits not in (8, 16) or n_ch < 1:
        raise NotImplementedError(f"{bits}-bit / {n_ch}-channel WAV not supported")
    if block_align != n_ch * bits // 8:
        raise ValueError("WAV block alignment inconsistent with fmt")
    if bits == 8:
        x = np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128
    else:
        if len(pcm) % 2:
            raise ValueError("WAV 16-bit data chunk has odd byte length")
        x = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    if x.size % n_ch:
        raise ValueError("WAV data length not a whole number of frames")
    return x.reshape(-1, n_ch), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode int samples — shape (n_frames,) or (n_frames, n_channels),
    zero-centered — as uncompressed PCM WAV (16-bit signed LE, or 8-bit
    unsigned with the +128 re-bias)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    if bits == 16:
        pcm = x.astype("<i2").tobytes()
    elif bits == 8:
        pcm = (x.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def decode_auto(data: bytes) -> np.ndarray:
    """Magic-byte sniffing decode.  JPEG is the remaining honest boundary:
    it needs a real DCT codec (PIL), absent in this environment."""
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_ppm(data)
    if data[:2] == b"\xff\xd8":
        try:
            import PIL.Image  # noqa: F401
            import io

            return np.asarray(PIL.Image.open(io.BytesIO(data)))
        except ImportError as e:
            raise NotImplementedError("JPEG decode requires pillow") from e
    raise ValueError("unrecognized image format")


def to_gray(img: np.ndarray) -> np.ndarray:
    """uint8 (h,w[,3]) → (h,w) grayscale (integer mean of channels)."""
    if img.ndim == 2:
        return img
    return (img.astype(np.uint32).sum(axis=2) // img.shape[2]).astype(np.uint8)
