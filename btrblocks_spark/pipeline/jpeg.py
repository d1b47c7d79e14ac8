"""Baseline JPEG (ITU-T T.81) codec in pure Python/NumPy — no codec
libraries. Decoder handles baseline sequential DCT, 8-bit, grayscale and
3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers, byte
stuffing. Encoder produces valid baseline JPEGs (grayscale or RGB, 4:4:4 or
4:2:0) used as deterministic fixtures.

Algorithm is the published standard (public knowledge): entropy-coded
(run,size) Huffman symbols over zigzag-ordered quantized DCT coefficients,
DPCM on the DC terms. Rather than transcribing the spec's Annex K example
tables, the encoder *derives* its own: canonical equal-length Huffman codes
over the symbols actually emitted (any table transmitted in DHT is legal)
and a flat quantization matrix. With a flat quant step q and per-8×8-block
constant pixels whose level-shifted value is a multiple of q/8, the DC
coefficient quantizes losslessly and the decode is bit-exact — which is what
makes JPEG payloads oracle-checkable in the multimodal queries
(pipeline/multimodal.py): decoded stats stay pure doc_id arithmetic.

Role in the engine (reference parity): the reference stores binaries as
opaque blobs (its S2 binary columns); decode/feature-extraction is the
pipeline layer this repo adds for multimodal training data. Runs inside
Arrow-batched mapInPandas workers — per-payload cost is independent Python
work, embarrassingly parallel across a 1000-executor fleet.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT-II basis: T[u, x] = c(u) * cos((2x+1) u pi / 16) / 2
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

class _HuffTable:
    """Decode side: (length, code) -> symbol via the canonical ordering the
    DHT segment transmits (16 length counts + symbol list)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing
    removed by the segment scanner."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        byte = self.data[self.pos]
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG → {width, height, pixels} where pixels is
    uint8 (h, w) for grayscale or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                htables[(tc, th)] = _HuffTable(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential JPEG (SOF0)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cs] = (tt >> 4, tt & 0xF)
            # entropy-coded data: strip 0xFF00 stuffing, stop at next marker
            ecs = bytearray()
            j = i + seglen
            rst_breaks = []
            while j < len(data) - 1:
                if data[j] == 0xFF:
                    nxt = data[j + 1]
                    if nxt == 0x00:
                        ecs.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn: note position, drop marker
                        rst_breaks.append(len(ecs))
                        j += 2
                        continue
                    break
                ecs.append(data[j])
                j += 1
            return _decode_scan(
                bytes(ecs), frame, qtables, htables, scan_sel, restart_interval,
                rst_breaks,
            )
        i += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(ecs, frame, qtables, htables, scan_sel, restart_interval, rst_breaks):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    reader = _BitReader(ecs)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    rst_i = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # RSTn: byte-align to the recorded segment boundary, reset DPCM
            reader.align()
            if rst_i < len(rst_breaks):
                reader.pos = rst_breaks[rst_i]
                reader.bit = 0
                rst_i += 1
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_t, ac_t = scan_sel[c["id"]]
            dc_table = htables[(0, dc_t)]
            ac_table = htables[(1, ac_t)]
            q = qtables[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    t = reader.decode_symbol(dc_table)
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        sym = reader.decode_symbol(ac_table)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0xF
                        k += run
                        zz[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    block = (zz * q)[_UNZIGZAG].reshape(8, 8).astype(np.float64)
                    spatial = _T.T @ block @ _T + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
    # upsample sub-sampled planes to full MCU-grid resolution, crop, convert
    full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
    out = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        pixels = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    else:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        pixels = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
            np.uint8
        )
    return {"width": w, "height": h, "pixels": pixels}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _canonical_table(symbols_used: set[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Equal-length canonical Huffman table over the used symbols: with n
    symbols at length L where 2**L > n, the all-ones code stays unused (a
    T.81 requirement). Returns (BITS counts, HUFFVAL, symbol -> (code, len))."""
    syms = sorted(symbols_used)
    n = len(syms)
    length = max(n.bit_length(), 1)
    if (1 << length) <= n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    codes = {s: (idx, length) for idx, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _block_symbols(zz: np.ndarray, prev_dc: int) -> tuple[list, int]:
    """(run,size) symbol stream for one quantized zigzag block."""
    out = []
    diff = int(zz[0]) - prev_dc
    t = int(abs(diff)).bit_length()
    out.append(("dc", t, diff))
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append(("ac", 0xF0, 0))
            run -= 16
        size = int(abs(v)).bit_length()
        out.append(("ac", (run << 4) | size, v))
        run = 0
    if last_nz < 63:
        out.append(("ac", 0x00, 0))
    return out, int(zz[0])


def encode_jpeg(
    pixels: np.ndarray, quality_step: int = 16, subsample: bool = False
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG.

    ``quality_step`` is the flat quantization step for every coefficient.
    ``subsample=True`` emits 4:2:0 (chroma averaged over 2x2). Tables are
    self-derived (see module docstring) — output is a legal baseline JPEG."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels]
        samps = [(1, 1)]
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even then 2x2 mean
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def _half(p):
                pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (
                    pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )
            planes = [y, _half(cb), _half(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    q = np.full(64, quality_step, dtype=np.int32)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag blocks in MCU-interleaved order
    all_blocks: list[tuple[int, np.ndarray]] = []  # (component index, zz)
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        ph, pw = p.shape
        padded.append(
            np.pad(p, ((0, need_h - ph), (0, need_w - pw)), mode="edge")
        )
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = _T @ block @ _T.T
                    zzf = coef.reshape(-1)[_ZIGZAG]
                    zz = np.round(zzf / q).astype(np.int32)
                    all_blocks.append((ci, zz))

    # symbol statistics -> canonical tables (luma class 0, chroma class 1)
    ncls = 1 if gray else 2
    dc_used: list[set[int]] = [set() for _ in range(ncls)]
    ac_used: list[set[int]] = [set() for _ in range(ncls)]
    sym_stream: list[tuple[int, list]] = []
    prev_dc = [0] * len(planes)
    for ci, zz in all_blocks:
        cls = 0 if ci == 0 else min(1, ncls - 1)
        syms, prev_dc[ci] = _block_symbols(zz, prev_dc[ci])
        for kind, sym, _v in syms:
            (dc_used if kind == "dc" else ac_used)[cls].add(sym)
        sym_stream.append((cls, syms))
    tables = []
    for cls in range(ncls):
        tables.append(
            (_canonical_table(dc_used[cls]), _canonical_table(ac_used[cls]))
        )

    # entropy-coded segment
    bw = _BitWriter()
    for cls, syms in sym_stream:
        (_, _, dc_codes), (_, _, ac_codes) = tables[cls]
        for kind, sym, v in syms:
            code, length = (dc_codes if kind == "dc" else ac_codes)[sym]
            bw.write(code, length)
            if kind == "dc":
                t = sym
                if t:
                    bw.write(v if v >= 0 else v + (1 << t) - 1, t)
            elif sym not in (0x00, 0xF0):
                size = sym & 0xF
                bw.write(v if v >= 0 else v + (1 << size) - 1, size)
    bw.flush()

    # container
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([quality_step] * 64))  # flat table, id 0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    for cls in range(ncls):
        (dc_counts, dc_syms, _), (ac_counts, ac_syms, _) = tables[cls]
        out += seg(0xC4, bytes([(0 << 4) | cls]) + bytes(dc_counts) + dc_syms)
        out += seg(0xC4, bytes([(1 << 4) | cls]) + bytes(ac_counts) + ac_syms)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else ncls - 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
