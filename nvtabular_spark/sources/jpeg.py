"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

Completes the multimodal strict-mode matrix (BMP/PNG/WAV were already
native; reference NVTabular delegates image decode to torchvision/PIL
— neither exists in this environment, and the format itself is public
specification).

Encoder: baseline DCT, 4:4:4 (no chroma subsampling), Annex-K
quantization tables scaled by libjpeg's quality curve, and GENERATED
canonical Huffman tables (fixed-length block codes: 4-bit DC, 8-bit AC
— valid prefix codes, emitted in DHT, so the decoder is driven entirely
by the stream and no hand-transcribed spec tables can silently drift).

Decoder: general baseline decoder — arbitrary DQT/DHT tables from the
stream, generic h×v sampling factors (4:4:4, 4:2:0, 4:2:2), restart
markers, byte unstuffing. Python-loop Huffman decode: fine for the
Arrow-batched ``mapInPandas`` plumbing this feeds (per-image work is
bounded); a production deployment would swap in a vectorized kernel
behind the same interface.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# -- shared tables ------------------------------------------------------------


def _zigzag_pairs() -> List[Tuple[int, int]]:
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(s, 7) + 1))
        rows = rng if s % 2 == 1 else list(reversed(rng))
        out += [(r, s - r) for r in rows]
    return out


ZIGZAG = _zigzag_pairs()                       # index -> (row, col)
ZIGZAG_FLAT = np.array([r * 8 + c for r, c in ZIGZAG])

#: ITU-T T.81 Annex K.1/K.2 example quantization tables (public spec)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_DCT = _dct_matrix()


def _scaled_quant(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(tbl):
        return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(QUANT_LUMA), s(QUANT_CHROMA)


#: generated canonical Huffman tables: every DC category at 4 bits,
#: every AC (run, size) symbol at 8 bits — prefix-free by construction
DC_SYMBOLS = list(range(12))
AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                             for s in range(1, 11)]


def _canonical_codes(symbols: List[int], length: int) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, nbits), all codes at the same length."""
    return {sym: (i, length) for i, sym in enumerate(symbols)}


DC_CODES = _canonical_codes(DC_SYMBOLS, 4)
AC_CODES = _canonical_codes(AC_SYMBOLS, 8)


def _dht_payload(tc_th: int, symbols: List[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bytes([tc_th] + bits + symbols)


# -- bit IO -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:                      # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2                  # unstuff
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_rst(self) -> None:
        """Consume a restart marker at a byte boundary."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] == 0xFF and \
                0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


# -- encoder ------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255) \
        .astype(np.uint8)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int) -> int:
    coef = _DCT @ (block - 128.0) @ _DCT.T
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG_FLAT]
    dc = int(zz[0])
    diff = dc - pred
    size = _size_cat(diff)
    code, nb = DC_CODES[size]
    bw.write(code, nb)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(amp, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, n = AC_CODES[0xF0]              # ZRL
            bw.write(c, n)
            run -= 16
        size = _size_cat(v)
        c, n = AC_CODES[(run << 4) | size]
        bw.write(c, n)
        amp = v if v > 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    if last_nz < 63:
        c, n = AC_CODES[0x00]                  # EOB
        bw.write(c, n)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Baseline JFIF bytes for an (H, W, 3) uint8 RGB array.
    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 luma
    blocks per MCU, chroma 2:1 both axes — the common photo layout)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (H, W, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    ql, qc = _scaled_quant(quality)
    ycc = _rgb_to_ycbcr(img)
    lh, lv = (2, 2) if subsampling == "420" else (1, 1)
    mcu_h, mcu_w = 8 * lv, 8 * lh
    ycc = np.pad(ycc, ((0, -h % mcu_h), (0, -w % mcu_w), (0, 0)),
                 mode="edge")
    luma = ycc[..., 0]
    if subsampling == "420":
        cb = ycc[..., 1].reshape(ycc.shape[0] // 2, 2,
                                 ycc.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(ycc.shape[0] // 2, 2,
                                 ycc.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]
    planes = [luma, cb, cr]
    factors = [(lh, lv), (1, 1), (1, 1)]
    qs = [ql, qc, qc]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")                                    # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) +
               bytes(ql.reshape(-1)[ZIGZAG_FLAT].astype(np.uint8)))
    out += seg(0xFFDB, bytes([1]) +
               bytes(qc.reshape(-1)[ZIGZAG_FLAT].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, qid), (fh, fv) in zip(((1, 0), (2, 1), (3, 1)), factors):
        sof += bytes([cid, (fh << 4) | fv, qid])
    out += seg(0xFFC0, sof)                                         # SOF0
    out += seg(0xFFC4, _dht_payload(0x00, DC_SYMBOLS, 4))           # DC 0
    out += seg(0xFFC4, _dht_payload(0x10, AC_SYMBOLS, 8))           # AC 0
    sos = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3)) \
        + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcuy = ycc.shape[0] // mcu_h
    mcux = ycc.shape[1] // mcu_w
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((fh, fv), plane) in enumerate(zip(factors, planes)):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(bw, block, qs[ci],
                                                  preds[ci])
    out += bw.flush()
    out += b"\xff\xd9"                                              # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


def _build_huff(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(nbits, code) -> symbol from a DHT BITS/HUFFVAL spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from baseline JFIF bytes. Supports generic
    sampling factors (4:4:4 / 4:2:0 / 4:2:2), stream-defined DQT/DHT,
    and restart markers. Progressive/arithmetic JPEG is out of scope
    (baseline covers the overwhelming share of stored corpora)."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    comps: List[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:                                   # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG_FLAT] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC0:                                 # SOF0 baseline
            h, w = struct.unpack(">HH", body[1:5])
            n = body[5]
            for ci in range(n):
                cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}); only "
                f"baseline sequential DCT is supported")
        elif marker == 0xC4:                                 # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits,
                                                                    vals)
                i += 17 + nv
        elif marker == 0xDD:                                 # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:                                 # SOS
            ns = body[0]
            for si in range(ns):
                cid, tables = body[1 + si * 2], body[2 + si * 2]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tables >> 4
                        c["ac"] = tables & 0xF
            scan_pos = pos
            break
    if scan_pos is None or not comps:
        raise ValueError("no scan data")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    br = _BitReader(data, scan_pos)
    preds = [0] * len(comps)
    idct = _DCT.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_and_skip_rst()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(br, huff_dc[c["dc"]])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, huff_ac[c["ac"]])
                            if rs == 0x00:                   # EOB
                                break
                            if rs == 0xF0:                   # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG_FLAT] = zz
                        blk = blk.reshape(8, 8) * qt[c["tq"]]
                        pix = idct @ blk @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        ycc = np.stack([full[0]] * 3, axis=-1)
        return np.clip(ycc.round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
