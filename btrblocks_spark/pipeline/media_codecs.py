"""Real, dependency-free media codecs for the multimodal pipeline.

No image/audio libraries exist in this environment, but three widely-used
container formats are decodable with the standard library alone:

  PNG   zlib inflate + scanline unfilter (the format spec is public;
        supports 8-bit gray/RGB/RGBA, non-interlaced)
  BMP   uncompressed BITMAPINFOHEADER 24/32-bit
  PPM   P5/P6 binary netpbm
  WAV   PCM via the stdlib ``wave`` module
  JPEG  baseline sequential DCT via the pure-NumPy codec in
        ``pipeline/jpeg.py`` (Huffman + dequant + IDCT, 4:4:4/4:2:0)
  GIF   LZW decode (multi-frame + interlace); uncompressed-LZW encoder
  AVI   MJPEG video container (RIFF walk, frames via the JPEG codec)

This makes ``decode_batch(real_decode=True)`` (pipeline/multimodal.py) a
real decoder for these formats: width/height/pixel statistics come from
the actual bytes. Video stays honestly unsupported (raise).

Encoders for PNG/BMP/WAV are included so tests and queries can generate
real fixtures deterministically.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> dict:
    """Parse + inflate + unfilter a PNG; returns {width, height, channels,
    pixels (h, w, c) uint8}. 8-bit depth, non-interlaced, color types
    0/2/4/6 (no palette)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace}"
                )
            meta = (w, h, _CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).astype(
            np.int64
        )
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # sub — sequential in x, vectorize per channel lane
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 3:  # average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return {
        "width": w,
        "height": h,
        "channels": ch,
        "pixels": out.reshape(h, w, ch),
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer: filter 0 scanlines + one zlib IDAT. pixels is
    (h, w) gray or (h, w, 3|4) uint8."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> dict:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core header")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    h = abs(h_signed)
    ch = bpp // 8
    row_stride = (w * ch + 3) & ~3
    rows = []
    for y in range(h):
        off = pix_off + y * row_stride
        rows.append(np.frombuffer(data[off : off + w * ch], dtype=np.uint8))
    pix = np.stack(rows).reshape(h, w, ch)
    if h_signed > 0:  # bottom-up storage
        pix = pix[::-1]
    return {"width": w, "height": h, "channels": ch, "pixels": pix}


def encode_bmp(pixels: np.ndarray) -> bytes:
    if pixels.ndim == 2:
        pixels = np.repeat(pixels[:, :, None], 3, axis=2)
    h, w, ch = pixels.shape
    assert ch == 3
    row_stride = (w * 3 + 3) & ~3
    body = b"".join(
        pixels[y].astype(np.uint8).tobytes() + b"\x00" * (row_stride - w * 3)
        for y in range(h - 1, -1, -1)
    )
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


# ---------------------------------------------------------------------------
# PPM / PGM (binary netpbm)
# ---------------------------------------------------------------------------

def decode_ppm(data: bytes) -> dict:
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    ch = 1 if magic == b"P5" else 3
    # header: magic, whitespace-separated width height maxval (comments with #)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm")
    pix = np.frombuffer(data[pos : pos + w * h * ch], dtype=np.uint8).reshape(h, w, ch)
    return {"width": w, "height": h, "channels": ch, "pixels": pix}


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> dict:
    with wave.open(io.BytesIO(data), "rb") as wf:
        n_ch = wf.getnchannels()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        n_frames = wf.getnframes()
        frames = wf.readframes(n_frames)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {width}")
    samples = np.frombuffer(frames, dtype=dtype)
    return {
        "channels": n_ch,
        "framerate": rate,
        "n_frames": n_frames,
        "samples": samples,
    }


def encode_wav(samples: np.ndarray, framerate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Sniffing dispatcher
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# AVI (MJPEG) — RIFF container with baseline-JPEG frames; the video path.
# Container layout is the public RIFF/AVI spec; frames decode through the
# pure-NumPy JPEG codec (pipeline/jpeg.py), so video decode + frame
# sampling are REAL end-to-end (no codec libraries).
# ---------------------------------------------------------------------------

def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """Encode grayscale/RGB uint8 frames as a minimal MJPEG AVI."""
    from btrblocks_spark.pipeline.jpeg import encode_jpeg

    if not frames:
        raise ValueError("at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f) for f in frames]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(fcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fcc + body)

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", 1000000 // fps, max_bytes * fps, 0, 0x10, len(jpegs), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(jpegs), max_bytes, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> dict:
    """Decode an MJPEG AVI -> {width, height, n_frames, frames} with each
    frame a decoded uint8 pixel array. Walks RIFF chunks (even-padded),
    collects the movi list's 00dc/00db payloads, decodes each as JPEG."""
    from btrblocks_spark.pipeline.jpeg import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    jpegs = []

    def walk(buf: bytes) -> None:
        i = 0
        while i + 8 <= len(buf):
            fcc = buf[i : i + 4]
            (size,) = struct.unpack("<I", buf[i + 4 : i + 8])
            body = buf[i + 8 : i + 8 + size]
            if fcc == b"LIST":
                walk(body[4:])
            elif fcc[2:4] in (b"dc", b"db"):
                jpegs.append(body)
            i += 8 + size + (size % 2)

    walk(data[12:])
    if not jpegs:
        raise NotImplementedError("AVI without video frame chunks")
    frames = [decode_jpeg(j)["pixels"] for j in jpegs]
    return {
        "width": frames[0].shape[1],
        "height": frames[0].shape[0],
        "n_frames": len(frames),
        "frames": frames,
    }


def sniff(data: bytes) -> str | None:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def decode_any(data: bytes) -> dict:
    """Decode a payload by magic bytes → {fmt, width, height, frames,
    pixel/sample mean}. Raises NotImplementedError for formats that need
    codec libraries (JPEG, video)."""
    fmt = sniff(data)
    if fmt == "png":
        d = decode_png(data)
    elif fmt == "jpeg":
        from btrblocks_spark.pipeline.jpeg import decode_jpeg

        d = decode_jpeg(data)
    elif fmt == "bmp":
        d = decode_bmp(data)
    elif fmt == "ppm":
        d = decode_ppm(data)
    elif fmt == "gif":
        v = decode_gif(data)
        means = [float(f.mean()) for f in v["frames"]]
        return {
            "fmt": "gif",
            "width": v["width"],
            "height": v["height"],
            "frames": v["n_frames"],
            "mean": float(sum(means) / len(means)),
        }
    elif fmt == "avi":
        v = decode_avi(data)
        means = [float(f.mean()) for f in v["frames"]]
        return {
            "fmt": "avi",
            "width": v["width"],
            "height": v["height"],
            "frames": v["n_frames"],
            "mean": float(sum(means) / len(means)),
        }
    elif fmt == "wav":
        d = decode_wav(data)
        return {
            "fmt": "wav",
            "width": d["channels"],
            "height": d["framerate"],
            "frames": d["n_frames"],
            "mean": float(d["samples"].mean()) if len(d["samples"]) else 0.0,
        }
    else:
        raise NotImplementedError(
            "unsupported media container (video needs codec libraries "
            "not present in this environment)"
        )
    return {
        "fmt": fmt,
        "width": d["width"],
        "height": d["height"],
        "frames": 1,
        "mean": float(d["pixels"].mean()),
    }


def decode_pixels(data: bytes) -> dict:
    """Decode an IMAGE payload to its pixel array → {fmt, pixels} (uint8,
    (h,w) gray / (h,w,c)). The raw-pixel sibling of decode_any for
    operators that transform content (resize, crop, re-encode)."""
    fmt = sniff(data)
    if fmt == "png":
        return {"fmt": fmt, "pixels": decode_png(data)["pixels"]}
    if fmt == "bmp":
        return {"fmt": fmt, "pixels": decode_bmp(data)["pixels"]}
    if fmt == "ppm":
        return {"fmt": fmt, "pixels": decode_ppm(data)["pixels"]}
    if fmt == "jpeg":
        from btrblocks_spark.pipeline.jpeg import decode_jpeg

        return {"fmt": fmt, "pixels": decode_jpeg(data)["pixels"]}
    if fmt == "gif":
        return {"fmt": fmt, "pixels": decode_gif(data)["frames"][0]}
    raise NotImplementedError(f"not a decodable still image: {fmt!r}")


def bilinear_resize(px: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Bilinear resample (align-corners=False pixel-center mapping, edge
    clamp). Built on lerp a + t*(b-a), which is exact on constant regions —
    the property the multimodal oracles rely on."""
    squeeze = px.ndim == 2
    if squeeze:
        px = px[:, :, None]
    h, w, c = px.shape
    ys = np.clip((np.arange(target_h) + 0.5) * h / target_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(target_w) + 0.5) * w / target_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    ty = (ys - y0)[:, None, None]
    tx = (xs - x0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] + tx * (p[y0][:, x1] - p[y0][:, x0])
    bot = p[y1][:, x0] + tx * (p[y1][:, x1] - p[y1][:, x0])
    out = top + ty * (bot - top)
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


# ---------------------------------------------------------------------------
# GIF — LZW-compressed palette images (GIF87a/89a spec is public). Decoder
# handles global/local palettes, multiple frames (animated), interlace;
# encoder emits valid single-frame GIFs using the classic "uncompressed
# LZW" trick (literal codes with frequent CLEARs so the code width never
# grows) — byte-exact round-trips for fixtures.
# ---------------------------------------------------------------------------

def decode_gif(data: bytes) -> dict:
    """Decode a GIF → {width, height, n_frames, frames} (uint8 RGB per
    frame; frames composited independently against their own palette)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, fw, fh, fflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        pal = gpal
        if fflags & 0x80:
            n = 2 << (fflags & 7)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        min_code = data[pos]
        pos += 1
        comp = bytearray()
        while data[pos]:
            ln = data[pos]
            comp += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(comp), min_code, fw * fh)
        px = pal[np.array(idx, dtype=np.int32)].reshape(fh, fw, 3)
        if fflags & 0x40:  # interlaced: de-interleave rows
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            out = np.empty_like(px)
            out[order] = px
            px = out
        frames.append(px)
    if not frames:
        raise ValueError("GIF without image data")
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}


def _lzw_decode(comp: bytes, min_code: int, expect: int) -> list[int]:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    acc = nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in comp:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [(i,) for i in range(clear)] + [(), ()]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return out[:expect]
            if code < len(table):
                entry = table[code]
            elif prev is not None:
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            if prev is not None:
                table.append(prev + (entry[0],))
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= expect:
                return out[:expect]
    return out[:expect]


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 3) RGB (≤256 distinct colors) or (h, w) gray as
    a single-frame GIF87a. LZW payload uses literal codes with a CLEAR
    before each one — valid, never grows the code width (the classic
    uncompressed-GIF device), so the decode is bit-exact."""
    if pixels.ndim == 2:
        pixels = np.stack([pixels] * 3, axis=-1)
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif supports ≤256 distinct colors")
    bits = max(int(len(pal) - 1).bit_length(), 1)
    min_code = max(bits, 2)
    psize = 1 << min_code  # palette block must match the size field below
    pal_full = np.zeros((psize, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    clear = 1 << min_code
    width = min_code + 1
    # bitstream: CLEAR, px, CLEAR, px, ..., EOI
    acc = nbits = 0
    payload = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for p in idx:
        emit(clear)
        emit(int(p))
    emit(clear + 1)  # EOI
    if nbits:
        payload.append(acc & 0xFF)

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x70) | (min_code - 1), 0, 0)
    out += pal_full.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(min_code)
    for i in range(0, len(payload), 255):
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
