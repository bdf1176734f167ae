"""Pure-stdlib/numpy baseline JPEG codec (public spec: ITU-T T.81 / JFIF).

VERDICT r5 next #7: the dominant real image format previously required a
user-registered adapter (``register_image_decoder``); this module makes
baseline-sequential JFIF decode work in the default environment. Scope:

- Decode: baseline DCT (SOF0; SOF1 extended-sequential accepted — the
  entropy coding is identical), 8-bit, grayscale or YCbCr, any sampling
  factors up to 4x4 (4:4:4 / 4:2:2 / 4:2:0 all covered), restart markers
  (DRI/RSTn), byte stuffing. Progressive (SOF2) / arithmetic / hierarchical
  / 12-bit raise ValueError — those stay behind the adapter seam
  (``media_codecs.enable_pil``).
- Encode: baseline, quality-scaled Annex-K quantization tables, the
  standard Annex-K Huffman tables, 4:4:4 or 4:2:0, optional restart
  interval — enough to generate deterministic lossy fixtures for tests
  without any third-party library.

Everything here is from the public T.81 spec (Annex F decode procedure,
Annex K reference tables) and the JFIF 1.02 colorspace note; no external
code. NumPy is used for the 8x8 DCT (matrix form) and plane assembly; the
Huffman bit loops are plain Python — fine for the pipeline's Arrow-batched
decode of thumbnail-class payloads, and the adapter seam remains the fast
path for bulk full-resolution work.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> raster position (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 reference quantization tables (luminance, chrominance)
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: block = A^T @ coef @ A reconstructs
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex-K table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """{symbol: (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a SIZE-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed). Reads past the end yield 1-bits (the spec's padding), so a
    final partially-padded byte decodes cleanly."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
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

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _split_scan(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``: unstuff 0xFF00, split on RSTn.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline-sequential JFIF bytes → uint8 (H, W, C) with C=3 (YCbCr →
    RGB) or C=1 (grayscale). Raises ValueError for non-baseline streams
    (progressive etc.) — route those through the adapter seam."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    i = 2
    n = len(buf)
    while i + 2 <= n:
        if buf[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i + 1 < n and buf[i + 1] == 0xFF:
            i += 1
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, RSTn) carry no length field
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG marker segment")
        (seglen,) = struct.unpack_from(">H", buf, i + 2)
        body = buf[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.frombuffer(body, dtype=np.uint8, count=64,
                                    offset=j).astype(np.int64)
                j += 64
                dq = np.zeros(64, dtype=np.int64)
                dq[ZIGZAG] = tbl  # stored in zigzag order
                qtables[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                j += 17 + nv
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec = body[0]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + c * 3]
                hv = body[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + c * 3]))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (progressive/arithmetic/lossless) — "
                "register an adapter (media_codecs.enable_pil) for these")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []  # (comp_index, dc_table, ac_table)
            cid_to_idx = {c[0]: k for k, c in enumerate(frame[2])}
            for s in range(ns):
                cid = body[1 + s * 2]
                tt = body[2 + s * 2]
                scan.append((cid_to_idx[cid], tt >> 4, tt & 0x0F))
            segs, _end = _split_scan(buf, i + 2 + seglen)
            return _decode_scan(frame, scan, segs, qtables, huff_dc,
                                huff_ac, restart_interval)
        i += 2 + seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(frame, scan, segs, qtables, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64)
              for c in comps]
    preds = [0] * len(comps)
    seg_idx = 0
    reader = _BitReader(segs[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_in_seg == restart_interval
                    and seg_idx + 1 < len(segs)):
                seg_idx += 1
                reader = _BitReader(segs[seg_idx])
                preds = [0] * len(comps)
                mcu_in_seg = 0
            for ci, dc_t, ac_t in scan:
                _cid, ch, cv, tq = comps[ci]
                q = qtables[tq]
                dct = huff_dc[dc_t]
                act = huff_ac[ac_t]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = reader.decode_huff(dct)
                        diff = _extend(reader.read_bits(ssss), ssss)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_in_seg += 1
    # upsample to full resolution (nearest — JFIF doesn't mandate a filter)
    out = []
    for (ci, (_cid, ch, cv, _tq)) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch,
                          axis=1)
        out.append(p[:H, :W])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder --


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tbl: dict, ac_tbl: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _size_cat(diff)
    code, ln = dc_tbl[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tbl[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = ac_tbl[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]  # EOB
        w.write(code, ln)
    return dc


def _pad_to(img: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = img.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def _quant_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """float plane (multiple of 8) → int zigzag coefficients per block,
    shape (by, bx, 64), raster block order."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,abxy,vy->abuv", _A, blocks, _A)
    qz = np.round(coef / q).astype(np.int64)
    return qz.reshape(by, bx, 64)[:, :, ZIGZAG]


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 (H, W, 3) RGB or (H, W)/(H, W, 1) gray → baseline JFIF bytes.

    ``subsampling``: '444' (no chroma subsampling) or '420'.
    ``restart_interval``: MCUs between RSTn markers (0 = none).
    """
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    H, W = img.shape[:2]
    # tables are stored in raster order here; DQT carries them in zigzag
    # order (the decoder inverts with the same ZIGZAG map)
    ql_m = _quality_scale(QTBL_LUMA, quality).reshape(8, 8).astype(np.float64)
    qc_m = _quality_scale(QTBL_CHROMA, quality).reshape(8, 8).astype(np.float64)
    qlz = ql_m.reshape(64)[ZIGZAG].astype(np.int64)
    qcz = qc_m.reshape(64)[ZIGZAG].astype(np.int64)

    rgb = img.astype(np.float64)
    if gray:
        planes = [rgb]
        samp = [(1, 1)]
        qmats = [ql_m]
    else:
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            yp = _pad_to(y, 16, 16)
            cbp = _pad_to(cb, 16, 16)
            crp = _pad_to(cr, 16, 16)
            cb2 = cbp.reshape(cbp.shape[0] // 2, 2,
                              cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(crp.shape[0] // 2, 2,
                              crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [yp, cb2, cr2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        qmats = [ql_m, qc_m, qc_m]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    # pad each plane so its own block grid exactly covers the MCU grid
    padded = [
        _pad_to(p, samp[k][1] * 8 * mcuy, samp[k][0] * 8 * mcux)
        for k, p in enumerate(planes)
    ]
    zzs = [_quant_blocks(padded[k], qmats[k]) for k in range(len(planes))]

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    enc_tbls = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    w = _BitWriter()
    preds = [0] * len(planes)
    ecs = bytearray()
    mcu_in_seg = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                w.flush()
                ecs += w.out
                ecs += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                w = _BitWriter()
                preds = [0] * len(planes)
                mcu_in_seg = 0
            for ci in range(len(planes)):
                ch, cv = samp[ci]
                dct, act = enc_tbls[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = zzs[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(w, zz, preds[ci], dct, act)
            mcu_in_seg += 1
    w.flush()
    ecs += w.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qlz))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qcz))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, H, W, nc)
    for c in range(nc):
        ch, cv = samp[c]
        sof += bytes([c + 1, (ch << 4) | cv, 0 if c == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += ecs
    out += b"\xff\xd9"
    return bytes(out)
