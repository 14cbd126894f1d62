"""Pure-stdlib baseline JPEG codec (numpy for the DCT math).

Closes the round-3 seam where ``stages/media.py`` decoded JPEG
*headers* (dims via SOF scan) but not pixels, so a mostly-JPEG web
corpus silently got stub thumbnails. The reference pipeline carries no
media at all (this tier comes from the builder's brief, not the Java);
the format itself is public — ITU-T T.81 baseline sequential DCT.

Coverage:
- decode: baseline sequential (SOF0/SOF1), 8-bit, grayscale or YCbCr,
  any integer sampling-factor grid (4:4:4, 4:2:2, 4:2:0, ...), restart
  markers, 0xFF00 byte stuffing, fill bytes. Progressive (SOF2) and
  arithmetic coding raise ``NotImplementedError`` — that stays the
  documented exotic-codec seam.
- encode: baseline, standard Annex-K quantization (IJG quality
  scaling) + Annex-K Huffman tables, 4:4:4 or 4:2:0, optional restart
  interval. Exists so the engine can emit JPEG thumbnails and so tests
  can exercise the decoder's subsampling/restart paths on
  self-contained bytes.

Per-block entropy coding is a Python loop by necessity (bit-serial
Huffman); the DCT/IDCT, quantization, color transforms and chroma
resampling are vectorized numpy over whole planes. At pipeline scale
this runs inside the media actor pool (one codec instance per actor),
never on the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ---------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# (bits[1..16], values) — standard tables
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: F = M f M^T, f = M^T F M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _c, _x


# --- Huffman machinery ------------------------------------------------

def _canonical_codes(bits, values):
    """(symbol -> (code, length)) for the canonical code of Annex C."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical Huffman decode tables (F.2.2.3: mincode / maxcode /
    valptr per code length)."""

    def __init__(self, bits, values):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            self.maxcode[length] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0            # T.81 F.2.2.5: pad past end with 0s
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

    def decode_symbol(self, tbl: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= tbl.maxcode[length]:
                return tbl.values[tbl.valptr[length]
                                  + code - tbl.mincode[length]]
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1: magnitude bits → signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# --- decoder ----------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 pixel array [h, w, 1|3]."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None            # (h, w, [(cid, hs, vs, tq), ...])
    scan = None             # ([(comp_idx, dc_id, ac_id)], data_pos)

    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:                      # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        seglen = int.from_bytes(payload[i + 2:i + 4], "big")
        seg = payload[i + 4:i + 2 + seglen]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128],
                                         ">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64],
                                         np.uint8).astype(np.int64)
                    p += 64
                q = np.empty(64, np.int64)
                q[ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                htables[(tc, th)] = _HuffDecoder(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):            # SOF0/1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F,
                              seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1)")
        elif marker == 0xDD:                    # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                    # SOS
            ns = seg[0]
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            cids = [c[0] for c in frame[2]]
            sel = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                sel.append((cids.index(cid), tt >> 4, tt & 0x0F))
            scan = (sel, i + 2 + seglen)
            break
        i += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("no JPEG frame/scan found")

    h, w, comps = frame
    sel, data_pos = scan
    if len(sel) != len(comps):
        raise NotImplementedError("multi-scan JPEG not supported")

    # de-stuff the entropy-coded data, splitting on restart markers
    segments: list[bytearray] = [bytearray()]
    j = data_pos
    while j < n:
        b = payload[j]
        if b == 0xFF:
            nxt = payload[j + 1] if j + 1 < n else 0xD9
            if nxt == 0x00:
                segments[-1].append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:             # RSTn
                segments.append(bytearray())
                j += 2
                continue
            break                               # EOI / next marker
        segments[-1].append(b)
        j += 1

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcus = mcux * mcuy

    # per component: coefficient store (n_blocks, 8, 8) in MCU order
    planes_blocks = []
    for (_cid, hs, vs, _tq) in comps:
        planes_blocks.append(
            np.zeros((n_mcus * hs * vs, 8, 8), np.int64))

    seg_idx = 0
    reader = _BitReader(bytes(segments[0]))
    preds = [0] * len(comps)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(bytes(segments[seg_idx]))
            preds = [0] * len(comps)
        for (ci, dc_id, ac_id) in sel:
            _cid, hs, vs, _tq = comps[ci]
            dct = htables[(0, dc_id)]
            act = htables[(1, ac_id)]
            for blk in range(hs * vs):
                coef = np.zeros(64, np.int64)
                t = reader.decode_symbol(dct)
                diff = _extend(reader.read_bits(t), t)
                preds[ci] += diff
                coef[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:             # ZRL
                            k += 16
                            continue
                        break                   # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC index overflow")
                    coef[k] = _extend(reader.read_bits(s), s)
                    k += 1
                planes_blocks[ci][m * hs * vs + blk] = \
                    coef[UNZIGZAG].reshape(8, 8)

    # dequantize + IDCT per component (vectorized over all blocks),
    # then paste blocks into the component plane
    out_planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        blocks = planes_blocks[ci].astype(np.float64) \
            * qtables[tq][None, :, :]
        pix = np.einsum("ij,bjk,kl->bil", _M.T, blocks, _M) + 128.0
        pw, ph = mcux * hs * 8, mcuy * vs * 8
        plane = np.empty((ph, pw), np.float64)
        b = 0
        for m in range(n_mcus):
            my, mx = divmod(m, mcux)
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    plane[y0:y0 + 8, x0:x0 + 8] = pix[b]
                    b += 1
        # upsample to full-frame resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255)
        return (y + 0.5).astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return (np.clip(rgb, 0, 255) + 0.5).astype(np.uint8)


# --- encoder ----------------------------------------------------------

def _quality_tables(quality: int):
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUM, QUANT_CHROM):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).reshape(8, 8))
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)           # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # pad with 1-bits


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """float plane (already level-shifted) with dims multiple of 8 →
    quantized zigzag coefficients (nby, nbx, 64), vectorized."""
    ph, pw = plane.shape
    blocks = (plane.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3))
    coef = np.einsum("ij,yxjk,kl->yxil", _M, blocks, _M.T)
    quant = np.round(coef / q[None, None]).astype(np.int64)
    return quant.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(zz[0]) - pred
    cat = int(abs(diff)).bit_length()
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]   # ZRL
                bw.write(code, length)
                run = 0
            continue
        cat = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]           # EOB
        bw.write(code, length)
    return int(zz[0])


def _pad_to(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    ph = -(-plane.shape[0] // my) * my
    pw = -(-plane.shape[1] // mx) * mx
    return np.pad(plane,
                  ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                  mode="edge")


def encode_jpeg(px: np.ndarray, *, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 [h, w, 1|3] (or [h, w]) → baseline JPEG bytes.

    ``subsample=True`` emits 4:2:0 (Y at (2,2), chroma 2×2-mean
    downsampled); otherwise 4:4:4."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    qlum, qchrom = _quality_tables(quality)

    f = px.astype(np.float64)
    if ch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [yp, cb, cr]
        qids = [0, 1, 1]
        qts = [qlum, qchrom, qchrom]
        hids = [(0, 0), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)]
        planes = [f[:, :, 0]]
        qids = [0]
        qts = [qlum]
        hids = [(0, 0)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per component: quantized zigzag blocks indexed [by, bx, 64]
    comp_zz = []
    for plane, (hs, vs), qt in zip(planes, samp, qts):
        p = _pad_to(plane, mcuy * vs * 8, mcux * hs * 8) - 128.0
        comp_zz.append(_plane_blocks(p, qt))

    dc_lum_codes = _canonical_codes(*DC_LUM)
    ac_lum_codes = _canonical_codes(*AC_LUM)
    dc_chrom_codes = _canonical_codes(*DC_CHROM)
    ac_chrom_codes = _canonical_codes(*AC_CHROM)
    code_sets = [(dc_lum_codes, ac_lum_codes),
                 (dc_chrom_codes, ac_chrom_codes)]

    bw = _BitWriter()
    preds = [0] * len(planes)
    scan_parts: list[bytes] = []
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            scan_parts.append(bytes(bw.buf))
            scan_parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, ((hs, vs), (dc_id, _ac_id)) in \
                enumerate(zip(samp, hids)):
            dc_codes, ac_codes = code_sets[dc_id]
            for by in range(vs):
                for bx in range(hs):
                    zz = comp_zz[ci][my * vs + by, mx * hs + bx]
                    preds[ci] = _encode_block(
                        bw, zz, preds[ci], dc_codes, ac_codes)
    bw.flush()
    scan_parts.append(bytes(bw.buf))
    scan_data = b"".join(scan_parts)

    # --- markers ---
    out = bytearray(b"\xff\xd8")                            # SOI
    for tq, qt in enumerate([qlum] + ([qchrom] if ch == 3 else [])):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) \
            + bytes([tq]) + zz                              # DQT
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0, 0, DC_LUM), (1, 0, AC_LUM)]
    if ch == 3:
        tables += [(0, 1, DC_CHROM), (1, 1, AC_CHROM)]
    for tc, th, (bits, values) in tables:                   # DHT
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:                                    # DRI
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ch])
    for ci, (dc_id, ac_id) in enumerate(hids):
        sos += bytes([ci + 1, (dc_id << 4) | ac_id])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan_data
    out += b"\xff\xd9"                                      # EOI
    return bytes(out)
