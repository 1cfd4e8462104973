"""JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib — baseline
sequential AND progressive (spectral selection + successive
approximation, Annex G).

Completes the multimodal strict-mode matrix (BMP/PNG/WAV were already
native; reference NVTabular delegates image decode to torchvision/PIL
— neither exists in this environment, and the format itself is public
specification).

Encoder: baseline DCT, 4:4:4 (no chroma subsampling), Annex-K
quantization tables scaled by libjpeg's quality curve, and GENERATED
canonical Huffman tables (fixed-length block codes: 4-bit DC, 8-bit AC
— valid prefix codes, emitted in DHT, so the decoder is driven entirely
by the stream and no hand-transcribed spec tables can silently drift).

Decoder: arbitrary DQT/DHT tables from the stream (tables may change
between scans), generic h×v sampling factors (4:4:4, 4:2:0, 4:2:2),
restart markers, byte unstuffing, and progressive multi-scan streams
(DC/AC first + refinement passes, EOB runs). Arithmetic coding,
hierarchical and lossless modes raise NotImplementedError. Python-loop Huffman decode: fine for the
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

#: progressive AC table adds the EOBn run-length symbols (r<<4 | 0 for
#: r = 0..14) needed by spectral-selection scans; 177 symbols still fit
#: one 8-bit canonical length (all-ones code unused, as T.81 requires)
AC_PROG_SYMBOLS = sorted({0xF0} | {(r << 4) for r in range(15)}
                         | {(r << 4) | s for r in range(16)
                            for s in range(1, 11)})
AC_PROG_CODES = _canonical_codes(AC_PROG_SYMBOLS, 8)


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


def _plane_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzag-ordered quantized coefficients of an
    8-aligned plane — the shared front half of both encoder modes."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _DCT, blocks - 128.0, _DCT.T)
    quant = np.round(coef / q).astype(np.int64)
    return quant.reshape(nby, nbx, 64)[..., ZIGZAG_FLAT]


def _trunc_shift(v: np.ndarray, al: int) -> np.ndarray:
    """AC successive-approximation point transform: truncation toward
    zero (T.81 G.1.2.2 — NOT an arithmetic shift for negatives)."""
    return np.sign(v) * (np.abs(v) >> al)


def _enc_prog_dc_first(bw: _BitWriter, comps, coefs, scomp_idx,
                       h, w, hmax, vmax, mcuy, mcux, al: int) -> None:
    preds = {ci: 0 for ci in scomp_idx}
    for group in _scan_units(comps, scomp_idx, h, w, hmax, vmax,
                             mcuy, mcux):
        for ci, by, bx in group:
            t = int(coefs[ci][by, bx, 0]) >> al     # DC: arithmetic shift
            diff = t - preds[ci]
            preds[ci] = t
            size = _size_cat(diff)
            code, nb = DC_CODES[size]
            bw.write(code, nb)
            if size:
                amp = diff if diff > 0 else diff + (1 << size) - 1
                bw.write(amp, size)


def _enc_prog_dc_refine(bw: _BitWriter, comps, coefs, scomp_idx,
                        h, w, hmax, vmax, mcuy, mcux, al: int) -> None:
    for group in _scan_units(comps, scomp_idx, h, w, hmax, vmax,
                             mcuy, mcux):
        for ci, by, bx in group:
            bw.write((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)


def _enc_prog_ac_first(bw: _BitWriter, comps, coefs, ci: int,
                       h, w, hmax, vmax, ss: int, se: int,
                       al: int) -> None:
    nby, nbx = _comp_block_grid(comps[ci], h, w, hmax, vmax)
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, nb = AC_PROG_CODES[r << 4]
            bw.write(code, nb)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for by in range(nby):
        for bx in range(nbx):
            t = _trunc_shift(coefs[ci][by, bx, ss:se + 1], al)
            nz = np.nonzero(t)[0]
            if len(nz) == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(int(nz[-1]) + 1):
                v = int(t[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, nb = AC_PROG_CODES[0xF0]
                    bw.write(code, nb)
                    run -= 16
                size = _size_cat(v)
                code, nb = AC_PROG_CODES[(run << 4) | size]
                bw.write(code, nb)
                amp = v if v > 0 else v + (1 << size) - 1
                bw.write(amp, size)
                run = 0
            if int(nz[-1]) < se - ss:
                eobrun += 1
    flush_eob()


def _enc_prog_ac_refine(bw: _BitWriter, comps, coefs, ci: int,
                        h, w, hmax, vmax, ss: int, se: int,
                        ah: int, al: int) -> None:
    """AC refinement scan (T.81 G.1.2.3): newly-significant coeffs are
    coded (r, 1) + sign; already-nonzero history coeffs contribute one
    positional correction bit after the symbol whose span covers them;
    EOB runs buffer the skipped blocks' correction bits until flush."""
    nby, nbx = _comp_block_grid(comps[ci], h, w, hmax, vmax)
    eobrun = 0
    bebuf: list = []

    def flush():
        nonlocal eobrun, bebuf
        if eobrun:
            r = eobrun.bit_length() - 1
            code, nb = AC_PROG_CODES[r << 4]
            bw.write(code, nb)
            if r:
                bw.write(eobrun - (1 << r), r)
            for b in bebuf:
                bw.write(b, 1)
            eobrun = 0
            bebuf = []

    for by in range(nby):
        for bx in range(nbx):
            band = coefs[ci][by, bx, ss:se + 1]
            t_hi = _trunc_shift(band, ah)
            t_lo = _trunc_shift(band, al)
            newly = np.nonzero((t_hi == 0) & (t_lo != 0))[0]
            if len(newly) == 0:
                eobrun += 1
                bebuf += [int(abs(int(t_lo[k])) & 1)
                          for k in range(se - ss + 1) if t_hi[k] != 0]
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            kend = int(newly[-1])
            run = 0
            pend: list = []
            for k in range(kend + 1):
                if t_hi[k] != 0:
                    pend.append(int(abs(int(t_lo[k])) & 1))
                    continue
                if t_lo[k] == 0:
                    run += 1
                    if run == 16:
                        code, nb = AC_PROG_CODES[0xF0]
                        bw.write(code, nb)
                        for b in pend:
                            bw.write(b, 1)
                        pend = []
                        run = 0
                    continue
                code, nb = AC_PROG_CODES[(run << 4) | 1]
                bw.write(code, nb)
                bw.write(1 if t_lo[k] > 0 else 0, 1)
                for b in pend:
                    bw.write(b, 1)
                pend = []
                run = 0
            if kend < se - ss:
                eobrun += 1
                bebuf += [int(abs(int(t_lo[k])) & 1)
                          for k in range(kend + 1, se - ss + 1)
                          if t_hi[k] != 0]
    flush()


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                progressive: bool = False) -> bytes:
    """JFIF bytes for an (H, W, 3) uint8 RGB array.
    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 luma
    blocks per MCU, chroma 2:1 both axes — the common photo layout).
    ``progressive=True`` emits SOF2 with a spectral-selection +
    successive-approximation scan script (DC at Al=1 then refined;
    AC bands 1-5 and 6-63 at Al=1 then refined) — same quantized
    coefficients as baseline, so both decode to identical pixels."""
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
    mcuy = ycc.shape[0] // mcu_h
    mcux = ycc.shape[1] // mcu_w

    if progressive:
        out += seg(0xFFC2, sof)                                     # SOF2
        out += seg(0xFFC4, _dht_payload(0x00, DC_SYMBOLS, 4))       # DC 0
        out += seg(0xFFC4, _dht_payload(0x10, AC_PROG_SYMBOLS, 8))  # AC 0
        # pad chroma planes to their 8-aligned grid before coefs
        planes = [np.pad(pl, ((0, -pl.shape[0] % 8), (0, -pl.shape[1] % 8)),
                         mode="edge") for pl in planes]
        coefs = [_plane_coefs(pl, q) for pl, q in zip(planes, qs)]
        comps = [{"id": cid, "h": fh, "v": fv, "tq": qi}
                 for (cid, qi), (fh, fv) in zip(((1, 0), (2, 1), (3, 1)),
                                                factors)]

        def sos_seg(cidx: List[int], ss: int, se: int, ah: int,
                    al: int) -> bytes:
            body = bytes([len(cidx)])
            for ci in cidx:
                body += bytes([comps[ci]["id"], 0x00])
            return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

        def run_scan(payload: bytes, fn, *args) -> None:
            nonlocal out
            out += payload
            bw = _BitWriter()
            fn(bw, *args)
            out += bw.flush()

        allc = list(range(3))
        run_scan(sos_seg(allc, 0, 0, 0, 1), _enc_prog_dc_first,
                 comps, coefs, allc, h, w, lh, lv, mcuy, mcux, 1)
        for ss, se in ((1, 5), (6, 63)):
            for ci in allc:
                run_scan(sos_seg([ci], ss, se, 0, 1), _enc_prog_ac_first,
                         comps, coefs, ci, h, w, lh, lv, ss, se, 1)
        run_scan(sos_seg(allc, 0, 0, 1, 0), _enc_prog_dc_refine,
                 comps, coefs, allc, h, w, lh, lv, mcuy, mcux, 0)
        for ss, se in ((1, 5), (6, 63)):
            for ci in allc:
                run_scan(sos_seg([ci], ss, se, 1, 0), _enc_prog_ac_refine,
                         comps, coefs, ci, h, w, lh, lv, ss, se, 1, 0)
        out += b"\xff\xd9"                                          # EOI
        return bytes(out)

    out += seg(0xFFC0, sof)                                         # SOF0
    out += seg(0xFFC4, _dht_payload(0x00, DC_SYMBOLS, 4))           # DC 0
    out += seg(0xFFC4, _dht_payload(0x10, AC_SYMBOLS, 8))           # AC 0
    sos = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3)) \
        + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)

    bw = _BitWriter()
    preds = [0, 0, 0]
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


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next real marker at/after p (skips entropy
    bytes, stuffed 0xFF00 and restart markers)."""
    n = len(data)
    while p < n - 1:
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return n


def _comp_block_grid(c: dict, h: int, w: int, hmax: int,
                     vmax: int) -> Tuple[int, int]:
    """Non-interleaved block grid (T.81 A.2.2): blocks over the
    component's own sample dimensions, NOT the MCU-padded grid."""
    ch = -(-(h * c["v"]) // vmax)
    cw = -(-(w * c["h"]) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_seq_scan(data: bytes, pos: int, comps: List[dict],
                     scomp_idx: List[int], huff_dc, huff_ac, coefs,
                     mcuy: int, mcux: int, restart_interval: int) -> int:
    """Baseline sequential scan: full 64-coefficient band per block,
    interleaved MCU order. Fills ``coefs`` (zigzag order) and returns
    the end-of-entropy position."""
    br = _BitReader(data, pos)
    preds = {ci: 0 for ci in scomp_idx}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_and_skip_rst()
                preds = {ci: 0 for ci in scomp_idx}
            for ci in scomp_idx:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
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
            mcu_count += 1
    return br.pos


def _scan_units(comps: List[dict], scomp_idx: List[int], h: int, w: int,
                hmax: int, vmax: int, mcuy: int, mcux: int):
    """Yield the (ci, by, bx) block sequence of one progressive scan:
    interleaved MCU order for multi-component scans, the component's
    own raster for single-component scans (T.81 A.2.2/A.2.3)."""
    if len(scomp_idx) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                group = []
                for ci in scomp_idx:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            group.append((ci, my * c["v"] + by,
                                          mx * c["h"] + bx))
                yield group
    else:
        ci = scomp_idx[0]
        nby, nbx = _comp_block_grid(comps[ci], h, w, hmax, vmax)
        for by in range(nby):
            for bx in range(nbx):
                yield [(ci, by, bx)]


def _decode_prog_scan(data: bytes, pos: int, comps: List[dict],
                      scomp_idx: List[int], huff_dc, huff_ac, coefs,
                      h: int, w: int, hmax: int, vmax: int,
                      mcuy: int, mcux: int, ss: int, se: int,
                      ah: int, al: int, restart_interval: int) -> int:
    """One progressive scan (T.81 G.2): DC/AC first or refinement pass
    over the spectral band [ss, se] at successive-approximation bit
    position ``al``. Same public algorithm every open decoder
    implements (libjpeg jdphuff semantics), written against the spec.
    """
    br = _BitReader(data, pos)
    preds = {ci: 0 for ci in scomp_idx}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    unit_count = 0
    for group in _scan_units(comps, scomp_idx, h, w, hmax, vmax,
                             mcuy, mcux):
        if restart_interval and unit_count and \
                unit_count % restart_interval == 0:
            br.align_and_skip_rst()
            preds = {ci: 0 for ci in scomp_idx}
            eobrun = 0
        unit_count += 1
        for ci, by, bx in group:
            c = comps[ci]
            zz = coefs[ci][by, bx]
            if ss == 0:                                      # DC pass
                if ah == 0:                                  # first
                    s = _huff_decode(br, huff_dc[c["dc"]])
                    diff = _extend(br.read_bits(s), s) if s else 0
                    preds[ci] += diff
                    zz[0] = preds[ci] << al
                else:                                        # refine
                    if br.read_bit():
                        zz[0] = int(zz[0]) | p1
                continue
            if ah == 0:                                      # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, huff_ac[c["ac"]])
                    r, sz = rs >> 4, rs & 0xF
                    if sz == 0:
                        if r == 15:                          # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1                # EOBn
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(br.read_bits(sz), sz) << al
                    k += 1
                continue
            # AC refinement (jdphuff decode_mcu_AC_refine shape)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(br, huff_ac[c["ac"]])
                    r, sz = rs >> 4, rs & 0xF
                    newval = 0
                    if sz == 0:
                        if r != 15:                          # EOBn
                            eobrun = (1 << r)
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        # r == 15: span of 16 zero-history coeffs
                    else:
                        if sz != 1:
                            raise ValueError(
                                "refinement scan size must be 1")
                        newval = p1 if br.read_bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            if br.read_bit() and \
                                    not (int(zz[k]) & p1):
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if newval:
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                # correction bits through the rest of the band
                while k <= se:
                    if zz[k] != 0:
                        if br.read_bit() and not (int(zz[k]) & p1):
                            zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                eobrun -= 1
    return br.pos


def _render(comps: List[dict], coefs, qt, h: int, w: int,
            hmax: int, vmax: int) -> np.ndarray:
    """Dequantize + IDCT every block (vectorized einsum over the block
    grid), upsample subsampled planes and color-convert."""
    full = []
    for ci, c in enumerate(comps):
        zz = coefs[ci].astype(np.float64)                    # (by,bx,64)
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG_FLAT] = zz
        blocks = nat.reshape(*zz.shape[:2], 8, 8) * qt[c["tq"]]
        pix = np.einsum("ij,abjk,kl->abil", _DCT.T, blocks, _DCT) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(
            zz.shape[0] * 8, zz.shape[1] * 8)
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        ycc = np.stack([full[0]] * 3, axis=-1)
        return np.clip(ycc.round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from JFIF bytes — baseline (SOF0) AND
    progressive (SOF2: spectral selection + successive approximation,
    T.81 Annex G). Generic sampling factors (4:4:4 / 4:2:0 / 4:2:2),
    stream-defined DQT/DHT (tables may change between scans), restart
    markers, byte unstuffing. Arithmetic coding and hierarchical modes
    remain out of scope (vanishingly rare in stored corpora)."""
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
    progressive = False
    coefs = None
    hmax = vmax = mcuy = mcux = 0
    saw_scan = False
    while pos < len(data) - 1:
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
        elif marker in (0xC0, 0xC2):                         # SOF0 / SOF2
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            n = body[5]
            for ci in range(n):
                cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int32) for c in comps]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0xFF{marker:02X}); "
                f"baseline sequential and progressive DCT are supported")
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
            if coefs is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomp_idx = []
            for si in range(ns):
                cid, tables = body[1 + si * 2], body[2 + si * 2]
                for ci, c in enumerate(comps):
                    if c["id"] == cid:
                        c["dc"] = tables >> 4
                        c["ac"] = tables & 0xF
                        scomp_idx.append(ci)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            saw_scan = True
            if progressive:
                end = _decode_prog_scan(
                    data, pos, comps, scomp_idx, huff_dc, huff_ac,
                    coefs, h, w, hmax, vmax, mcuy, mcux,
                    ss, se, ah, al, restart_interval)
            else:
                end = _decode_seq_scan(
                    data, pos, comps, scomp_idx, huff_dc, huff_ac,
                    coefs, mcuy, mcux, restart_interval)
            pos = _next_marker(data, end)
    if not saw_scan or coefs is None:
        raise ValueError("no scan data")
    return _render(comps, coefs, qt, h, w, hmax, vmax)
