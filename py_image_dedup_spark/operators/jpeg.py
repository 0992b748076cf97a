"""Pure-NumPy baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the largest real codec gap in the multimodal kernels (the
reference's analyze phase decodes arbitrary images via PIL,
py_image_dedup/util/image.py:29-36; this container has no PIL, so the
decode runs on stdlib + NumPy). Supported:

  decode_jpeg  — baseline (SOF0/SOF1) sequential Huffman JPEG: 8-bit
                 samples, 1-4 components, any H/V subsampling (4:4:4,
                 4:2:0, 4:2:2, ...), restart intervals (DRI/RSTn); AND
                 progressive (SOF2, T.81 Annex G): spectral selection +
                 successive approximation, DC/AC first and refinement
                 scans, EOB runs. Returns the LUMA plane as float64
                 (h, w) — exactly what the phash / resize kernels consume.
                 Arithmetic coding, hierarchical modes and 12-bit
                 precision raise NotImplementedError.
  encode_jpeg  — baseline grayscale encoder (single component, Annex K
                 standard quantization + Huffman tables, quality 1-100),
                 used by resize_images' JPEG path and as the decoder's
                 self-contained roundtrip oracle: no external library is
                 needed to produce a real JPEG to decode.
  encode_jpeg_progressive — grayscale SOF2 encoder over a configurable
                 (Ss, Se, Ah, Al) scan script; same quantized
                 coefficients as encode_jpeg, so progressive decode must
                 match baseline decode bit-for-bit (the progressive
                 path's oracle).

All constants below (zigzag order, quantization table, Huffman BITS /
HUFFVAL lists) are the public interchange defaults from T.81 Annex K.

Scale shape: this module is payload-local compute inside the same
Arrow-batched mapInPandas kernels as the BMP/PNG/WAV codecs
(operators/multimodal.py) — no Spark plan change, embarrassingly
parallel per file.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance quantization table (natural order)
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

# Annex K.3 Huffman: DC luminance (BITS counts for code lengths 1..16,
# then HUFFVAL symbol list)
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))

# Annex K.3 Huffman: AC luminance
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
)

# orthonormal 8-point DCT-II basis: C[u, x] = a(u) cos((2x+1) u pi / 16)
_X = np.arange(8)
_DCT_C = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) * np.sqrt(
    2.0 / 8
)
_DCT_C[0, :] = np.sqrt(1.0 / 8)


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


# ------------------------------------------------------------------ decoding

def _build_huff(bits: tuple[int, ...], vals) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical order per T.81 C.2."""
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


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs FF00, stops at markers
    (the caller handles RSTn by calling `restart`)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1s past the end (T.81 F.2.2.5 allows it for the
                # final partial byte); a truncated stream surfaces as a
                # struct/index error upstream
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed byte
                    self.pos += 2
                    self.buf = (self.buf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # real marker: stop feeding, pad with 1s
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        return v

    def at_marker(self) -> int | None:
        """If positioned (byte-aligned stream side) at a marker, return it."""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None

    def restart(self) -> None:
        """Skip an RSTn marker and re-align."""
        self.buf = 0
        self.nbits = 0
        self.pos += 2


def _decode_huff_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline (SOF0/SOF1) or progressive (SOF2) Huffman JPEG ->
    (width, height, luma float64 (h, w) in 0..255).

    Only the first (luma) component is inverse-transformed; chroma blocks
    are still entropy-decoded (the bitstream interleaves them) but their
    IDCT is skipped — the multimodal kernels consume a single gray plane.

    Progressive streams accumulate per-component coefficient arrays across
    scans (DC first/refine, AC first/refine with EOB runs, spectral
    selection + successive approximation per T.81 Annex G) and reconstruct
    once at EOI. Arithmetic coding, hierarchical (SOF3+) and 12-bit
    precision still raise NotImplementedError.
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) ; comps: list of (cid, h, v, tq)
    progressive = False
    coefs: list[np.ndarray] | None = None  # per comp (by, bx, 64) zigzag
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: length-less
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4: pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, i + 1).astype(
                    np.float64
                )
                nat = np.empty(64)
                nat[ZIGZAG] = tbl  # stored in zigzag order
                qtables[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = tuple(seg[i + 1: i + 17])
                n = sum(bits)
                vals = tuple(seg[i + 17: i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huff(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_idx, dc_table, ac_table)
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(
                    i for i, c in enumerate(frame[2]) if c[0] == cs
                )
                scan.append((ci, tt >> 4, tt & 15))
            if not progressive:
                return _decode_scan(
                    data, pos + 2 + seg_len, frame, scan,
                    qtables, huff_dc, huff_ac, restart_interval,
                )
            if coefs is None:
                coefs = _alloc_prog_coefs(frame)
            band = (seg[1 + 2 * ns], seg[2 + 2 * ns],
                    seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15)
            pos = _decode_progressive_scan(
                data, pos + 2 + seg_len, frame, scan, band,
                huff_dc, huff_ac, restart_interval, coefs,
            )
            continue  # pos is already at the next marker
        pos += 2 + seg_len
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qtables)
    raise ValueError("JPEG has no scan data")


# --------------------------------------------------- progressive (Annex G)

def _alloc_prog_coefs(frame) -> list[np.ndarray]:
    """Per-component coefficient accumulators, zigzag index order, sized to
    the interleaved MCU grid (a superset of the non-interleaved grid)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
        for _, ch, cv, _ in comps
    ]


def _ni_block_dims(frame, ci) -> tuple[int, int]:
    """Non-interleaved block grid of component ci (T.81 A.2.2: ceil of the
    scaled component dimensions, NOT the padded MCU grid)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    ch, cv = comps[ci][1], comps[ci][2]
    cw = (w * ch + hmax - 1) // hmax
    chh = (h * cv + vmax - 1) // vmax
    return (chh + 7) // 8, (cw + 7) // 8


def _ac_first_block(br, actab, block, ss, se, al, eob) -> None:
    """One block of an AC first scan (Ah=0): runs + EOBn runs, values
    scaled up by 2^Al (T.81 G.1.2.2)."""
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff_symbol(br, actab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.read_bits(r)
                return
            k += 16
            continue
        k += r
        block[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _refine_nonzero(br, block, k, p1) -> None:
    """Correction bit for a history-nonzero coefficient: if the bit is set
    and bit Al is not already set, grow the magnitude by p1."""
    c = int(block[k])
    if br.read_bit() and (abs(c) & p1) == 0:
        block[k] = c + p1 if c > 0 else c - p1


def _ac_refine_block(br, actab, block, ss, se, al, eob) -> None:
    """One block of an AC refinement scan (Ah=Al+1 -> Al): newly-visible
    coefficients arrive as ±2^Al with zero-history run lengths; every
    history-nonzero coefficient passed on the way carries one correction
    bit (T.81 G.1.2.3)."""
    p1 = 1 << al
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = _decode_huff_symbol(br, actab)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.read_bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                newval = p1 if br.read_bit() else -p1
            while k <= se:
                if block[k] != 0:
                    _refine_nonzero(br, block, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[k] = newval
            k += 1
    if eob[0] > 0:
        while k <= se:
            if block[k] != 0:
                _refine_nonzero(br, block, k, p1)
            k += 1
        eob[0] -= 1


def _decode_progressive_scan(data, pos, frame, scan, band,
                             huff_dc, huff_ac, dri, coefs) -> int:
    """Decode one progressive scan into the coefficient accumulators and
    return the stream position of the next marker. DC scans may be
    interleaved (ns > 1, MCU order); AC scans are single-component by spec
    (T.81 G.1.1.1) and walk the component's non-interleaved block grid."""
    w, h, comps = frame
    ss, se, ah, al = band
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    br = _BitReader(data, pos)
    eob = [0]
    preds = {ci: 0 for ci, _, _ in scan}

    def maybe_restart(unit: int) -> None:
        if dri and unit and unit % dri == 0:
            mk = br.at_marker()
            if mk is not None and 0xD0 <= mk <= 0xD7:
                br.restart()
                for c_ in preds:
                    preds[c_] = 0
                eob[0] = 0

    def dc_block(ci: int, tdc: int, by: int, bx: int) -> None:
        cf = coefs[ci]
        if ah == 0:
            t = _decode_huff_symbol(br, huff_dc[tdc])
            preds[ci] += _extend(br.read_bits(t), t)
            cf[by, bx, 0] = preds[ci] << al
        elif br.read_bit():
            # two's-complement |= adds 2^Al for negatives too (G.1.2.1)
            cf[by, bx, 0] |= 1 << al

    if ss == 0:  # DC scan
        if len(scan) > 1:  # interleaved, MCU order
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for m in range(mcux * mcuy):
                maybe_restart(m)
                my, mx = divmod(m, mcux)
                for ci, tdc, _ in scan:
                    ch, cv = comps[ci][1], comps[ci][2]
                    for by in range(cv):
                        for bx in range(ch):
                            dc_block(ci, tdc, my * cv + by, mx * ch + bx)
        else:
            ci, tdc, _ = scan[0]
            bh, bw = _ni_block_dims(frame, ci)
            for m in range(bh * bw):
                maybe_restart(m)
                by, bx = divmod(m, bw)
                dc_block(ci, tdc, by, bx)
    else:  # AC scan: single component
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        ci, _, tac = scan[0]
        actab = huff_ac[tac]
        cf = coefs[ci]
        bh, bw = _ni_block_dims(frame, ci)
        step = _ac_first_block if ah == 0 else _ac_refine_block
        for m in range(bh * bw):
            maybe_restart(m)
            by, bx = divmod(m, bw)
            step(br, actab, cf[by, bx], ss, se, al, eob)

    # resume the marker walk at the next real marker (skip stuffed FF00)
    p = br.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] != 0x00
    ):
        p += 1
    return p


def _reconstruct_progressive(frame, coefs, qtables):
    """Dequantize + IDCT the accumulated luma coefficients (vectorized over
    all blocks), upsample to full resolution, crop."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    ch, cv, tq = comps[0][1], comps[0][2], comps[0][3]
    cf = coefs[0]
    by, bx = cf.shape[0], cf.shape[1]
    zz = cf.reshape(-1, 64).astype(np.float64)
    nat = np.zeros_like(zz)
    nat[:, ZIGZAG] = zz
    nat *= qtables[tq][None, :]
    blocks = nat.reshape(-1, 8, 8)
    # same associativity as the baseline per-block path
    # (_DCT_C.T @ block @ _DCT_C) so both processes decode bit-identically
    pix = np.matmul(np.matmul(_DCT_C.T, blocks), _DCT_C) + 128.0
    luma = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
        by * 8, bx * 8
    )
    ry, rx = vmax // cv, hmax // ch
    if ry > 1 or rx > 1:
        luma = np.repeat(np.repeat(luma, ry, axis=0), rx, axis=1)
    return w, h, np.clip(luma[:h, :w], 0.0, 255.0)


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac, dri):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # luma plane buffer (first scan component), at its own sampling grid
    li = scan[0][0]
    lh, lv = comps[li][1], comps[li][2]
    luma = np.zeros((mcuy * lv * 8, mcux * lh * 8))
    lq = qtables[comps[li][3]]

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    zz = np.empty(64)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            mk = br.at_marker()
            if mk is not None and 0xD0 <= mk <= 0xD7:
                br.restart()
                preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, tdc, tac in scan:
            ch, cv = comps[ci][1], comps[ci][2]
            for by in range(cv):
                for bx in range(ch):
                    zz[:] = 0.0
                    t = _decode_huff_symbol(br, huff_dc[tdc])
                    diff = _extend(br.read_bits(t), t)
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    actab = huff_ac[tac]
                    while k < 64:
                        rs = _decode_huff_symbol(br, actab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                    if ci == li:
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz
                        block = (coef * lq).reshape(8, 8)
                        pix = _DCT_C.T @ block @ _DCT_C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        luma[y0: y0 + 8, x0: x0 + 8] = pix
    # upsample luma to full resolution if it was subsampled (rare) and crop
    ry, rx = vmax // lv, hmax // lh
    if ry > 1 or rx > 1:
        luma = np.repeat(np.repeat(luma, ry, axis=0), rx, axis=1)
    return w, h, np.clip(luma[:h, :w], 0.0, 255.0)


# ------------------------------------------------------------------ encoding

class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.buf = (self.buf << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _huff_encode_map(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order."""
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


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit code) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _quality_qtable(quality: int) -> np.ndarray:
    q = min(100, max(1, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((QTBL_LUMA * scale + 50) / 100), 1, 255)


def encode_jpeg(gray: np.ndarray, quality: int = 85) -> bytes:
    """(h, w) gray array (0..255) -> baseline grayscale JPEG bytes.

    Single component, no subsampling, Annex K default tables — the
    simplest spec-conformant interchange stream, and the roundtrip
    oracle for decode_jpeg."""
    a = np.clip(np.asarray(gray, dtype=np.float64), 0, 255)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # pad to 8x8 blocks by edge replication
    ph, pw = -h % 8, -w % 8
    a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    qt = _quality_qtable(quality)
    qt_zz = qt[ZIGZAG].astype(np.uint8)  # stored in zigzag order

    dc_map = _huff_encode_map(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_map = _huff_encode_map(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    qt2 = qt.reshape(8, 8)
    for y0 in range(0, a.shape[0], 8):
        for x0 in range(0, a.shape[1], 8):
            block = a[y0: y0 + 8, x0: x0 + 8] - 128.0
            coef = _DCT_C @ block @ _DCT_C.T
            q = np.round(coef / qt2).astype(np.int64).reshape(64)
            zz = q[ZIGZAG]
            # DC
            s, code = _magnitude(int(zz[0]) - pred)
            pred = int(zz[0])
            hc, hl = dc_map[s]
            bw.write(hc, hl)
            if s:
                bw.write(code, s)
            # AC with run-lengths
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    hc, hl = ac_map[0x00]  # EOB
                    bw.write(hc, hl)
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    hc, hl = ac_map[0xF0]  # ZRL
                    bw.write(hc, hl)
                    run -= 16
                s, code = _magnitude(v)
                hc, hl = ac_map[(run << 4) | s]
                bw.write(hc, hl)
                bw.write(code, s)
                run = 0
    body = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + qt_zz.tobytes())
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + body + b"\xff\xd9"
    )


# ------------------------------------------------- progressive encoding

# Custom Huffman tables for progressive scans: Annex K tables lack the
# EOBn symbols (0x10..0xE0) progressive AC coding emits, so the encoder
# ships flat canonical tables covering every symbol it may produce. DC:
# 12 symbols at length 4 (code 15 unused => the all-ones code stays
# reserved, T.81 C.2). AC: 254 symbols at length 9 + 2 at length 10
# (Kraft sum < 0.5; the 10-bit all-ones code unused). Wasteful per bit,
# irrelevant for an oracle stream, and decodable by any conformant reader.
PROG_DC_BITS = (0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
PROG_DC_VALS = tuple(range(12))
PROG_AC_BITS = (0, 0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0)
PROG_AC_VALS = tuple(range(256))

# Default scan script: spectral selection AND successive approximation,
# so every decoder path (DC first/refine, AC first with EOB runs, AC
# refinement with correction bits) is exercised by the roundtrip oracle.
PROG_DEFAULT_SCANS = (
    (0, 0, 0, 1),    # DC first, Al=1
    (1, 5, 0, 2),    # AC 1..5 first, Al=2
    (6, 63, 0, 2),   # AC 6..63 first, Al=2
    (0, 0, 1, 0),    # DC refine -> full precision
    (1, 63, 2, 1),   # AC refine Al 2 -> 1
    (1, 63, 1, 0),   # AC refine Al 1 -> 0
)


def _enc_dc_first(bw, dc_map, blocks, al: int) -> None:
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> al  # arithmetic shift per G.1.2.1
        s, code = _magnitude(v - pred)
        pred = v
        hc, hl = dc_map[s]
        bw.write(hc, hl)
        if s:
            bw.write(code, s)


def _enc_dc_refine(bw, blocks, al: int) -> None:
    for zz in blocks:
        bw.write((int(zz[0]) >> al) & 1, 1)


def _band_values(zz, ss: int, se: int, al: int) -> list[int]:
    """Point-transformed band values: magnitude >> Al, sign preserved
    (G.1.2.2 truncates toward zero, NOT an arithmetic shift)."""
    out = []
    for k in range(ss, se + 1):
        c = int(zz[k])
        m = abs(c) >> al
        out.append(m if c >= 0 else -m)
    return out


def _enc_ac_first(bw, ac_map, blocks, ss: int, se: int, al: int) -> None:
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            hc, hl = ac_map[r << 4]
            bw.write(hc, hl)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        vs = _band_values(zz, ss, se, al)
        last_nz = -1
        for i, v in enumerate(vs):
            if v:
                last_nz = i
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(last_nz + 1):
            v = vs[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_map[0xF0]
                bw.write(hc, hl)
                run -= 16
            s, code = _magnitude(v)
            hc, hl = ac_map[(run << 4) | s]
            bw.write(hc, hl)
            bw.write(code, s)
            run = 0
        if last_nz < len(vs) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(bw, ac_map, blocks, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement: newly-visible coefficients
    (magnitude 1 at this precision) emit run/sign symbols; every
    history-nonzero coefficient contributes one correction bit, buffered
    and emitted after the next symbol (or after the EOBn that covers its
    block) so the decoder meets each bit exactly where its position walk
    expects it."""
    eobrun = 0
    pending: list[int] = []  # correction bits deferred behind an EOBn

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            hc, hl = ac_map[r << 4]
            bw.write(hc, hl)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            bw.write(b, 1)
        pending.clear()

    for zz in blocks:
        vs = _band_values(zz, ss, se, al)
        last_new = -1
        for i, v in enumerate(vs):
            if abs(v) == 1:
                last_new = i
        run = 0
        bits_here: list[int] = []
        for i in range(last_new + 1):
            a = abs(vs[i])
            if a == 0:
                run += 1
                continue
            # ZRL check runs at EVERY nonzero (history coefs included):
            # the decoder's position walk consumes the buffered correction
            # bits in this exact interleaving
            while run > 15:
                flush_eob()
                hc, hl = ac_map[0xF0]
                bw.write(hc, hl)
                run -= 16
                for b in bits_here:
                    bw.write(b, 1)
                bits_here.clear()
            if a > 1:
                bits_here.append(a & 1)
                continue
            flush_eob()
            hc, hl = ac_map[(run << 4) | 1]
            bw.write(hc, hl)
            bw.write(1 if vs[i] > 0 else 0, 1)
            for b in bits_here:
                bw.write(b, 1)
            bits_here.clear()
            run = 0
        tail_bits = [abs(v) & 1 for v in vs[last_new + 1:] if abs(v) > 1]
        if last_new < len(vs) - 1:
            eobrun += 1
            pending.extend(tail_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    gray: np.ndarray, quality: int = 85, scans=PROG_DEFAULT_SCANS
) -> bytes:
    """(h, w) gray array -> progressive (SOF2) grayscale JPEG.

    Same quantized coefficients as encode_jpeg at the same quality, coded
    across the `scans` script of (Ss, Se, Ah, Al) bands — so
    decode_jpeg(encode_jpeg_progressive(a)) must equal
    decode_jpeg(encode_jpeg(a)) exactly, which is the decoder's
    progressive-path oracle (no external library needed)."""
    a = np.clip(np.asarray(gray, dtype=np.float64), 0, 255)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = -h % 8, -w % 8
    a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    qt = _quality_qtable(quality)
    qt2 = qt.reshape(8, 8)
    blocks = []
    for y0 in range(0, a.shape[0], 8):
        for x0 in range(0, a.shape[1], 8):
            block = a[y0: y0 + 8, x0: x0 + 8] - 128.0
            coef = _DCT_C @ block @ _DCT_C.T
            q = np.round(coef / qt2).astype(np.int64).reshape(64)
            blocks.append(q[ZIGZAG])

    dc_map = _huff_encode_map(PROG_DC_BITS, PROG_DC_VALS)
    ac_map = _huff_encode_map(PROG_AC_BITS, PROG_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + qt[ZIGZAG].astype(np.uint8).tobytes())
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(PROG_DC_BITS) + bytes(PROG_DC_VALS)
        + bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS),
    )
    for ss, se, ah, al in scans:
        bw = _BitWriter()
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0 (T.81 G.1.1.1.1)")
            if ah == 0:
                _enc_dc_first(bw, dc_map, blocks, al)
            else:
                _enc_dc_refine(bw, blocks, al)
        elif ah == 0:
            _enc_ac_first(bw, ac_map, blocks, ss, se, al)
        else:
            _enc_ac_refine(bw, ac_map, blocks, ss, se, al)
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
