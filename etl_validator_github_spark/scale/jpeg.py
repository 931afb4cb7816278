"""Pure-stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

Decoder: SOI/APPn/COM/DQT (8- and 16-bit precision)/DHT/DRI/SOF0-SOF1/
SOS marker parsing, canonical Huffman decode (mincode/maxcode/valptr,
T.81 F.16), 0xFF00 byte unstuffing, RSTn restart handling, dequant +
zigzag ordering, an exact-integer direct-summation IDCT, nearest-
neighbor chroma upsampling for any Hi/Vi sampling grid (4:4:4, 4:2:2,
4:2:0, 4:4:0), and the JFIF integer YCbCr→RGB transform. T.81 leaves
IDCT precision implementation-defined (IEEE 1180 bounds); pinning it
to one integer formula makes every decoded pixel a pure integer
function of the coefficients, which is what lets the DuckDB oracle in
``multimodal.py`` reproduce decoded statistics digit-for-digit.

Encoder: grayscale and YCbCr 4:4:4 / 4:2:0 baseline JPEG with
per-image optimal Huffman tables (T.81 K.2 code-size algorithm, K.3
BITS adjustment to the 16-bit ceiling, all-ones code point reserved
via the 256 pseudo-symbol), Annex K quantization tables with the
libjpeg quality scaling, restart markers, and byte stuffing. A
coefficient-domain writer (``encode_gray_coefficients``) emits a real
grayscale bitstream from given quantized coefficients — the gate
fixture uses it so the oracle can regenerate the coefficients without
parsing bytes.

Progressive (SOF2), hierarchical, arithmetic-coded and 12-bit frames
raise NotImplementedError — declared gaps, not silent wrong answers.

Reference behavior studied from HassanB613/etl-validator-github (the
reference ships no media codecs either; its pipelines treat binary
payloads as opaque, see extract/GENERIC_FILE_PIPE.py) — this module
exists for the training-data side of the engine, where JPEG is the
dominant image wire format.
"""

from __future__ import annotations

import math
import struct

#: Zigzag scan: position k in the coded stream holds natural-order
#: index ZIGZAG[k] (row-major, row = vertical frequency).
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K Table K.1 / K.2 quantization tables, natural (row-major)
#: order.
QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

#: Integer IDCT: pixel(y,x) = 128 + floor((Σ_{v,u} d[v][u]·W[u][x]·
#: W[v][y] + 2^25) / 2^26), W[u][x] = round(2^13 · C(u)/2 ·
#: cos((2x+1)uπ/16)), C(0)=1/√2 else 1. The weights are shared
#: verbatim with the DuckDB oracle SQL.
IDCT_BITS = 13
IDCT_SHIFT = 2 * IDCT_BITS
IDCT_HALF = 1 << (IDCT_SHIFT - 1)


def _make_idct_weights() -> "tuple[tuple[int, ...], ...]":
    rows = []
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        rows.append(tuple(
            round((1 << IDCT_BITS) * 0.5 * cu
                  * math.cos((2 * x + 1) * u * math.pi / 16))
            for x in range(8)
        ))
    return tuple(rows)


IDCT_W = _make_idct_weights()

#: JFIF YCbCr→RGB in 16-bit fixed point (R = Y + 1.402·Cr', etc.).
_FIX_R_CR = 91881      # round(1.402 * 65536)
_FIX_G_CB = 22554      # round(0.344136 * 65536)
_FIX_G_CR = 46802      # round(0.714136 * 65536)
_FIX_B_CB = 116130     # round(1.772 * 65536)

# Marker bytes.
_SOI, _EOI, _SOS, _DQT, _DHT, _DRI = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD
_SOF_BASELINE = (0xC0, 0xC1)
_SOF_UNSUPPORTED = {
    0xC2: "progressive DCT (SOF2)",
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; markers other than stuffing inside the stream are an
    error (the scan loop consumes RSTn itself, byte-aligned)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _load_byte(self) -> None:
        data = self.data
        if self.pos >= len(data):
            raise ValueError("JPEG entropy stream truncated")
        b = data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            m = data[self.pos]
            if m != 0x00:
                raise ValueError(
                    f"marker 0xFF{m:02X} inside entropy-coded data"
                )
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._load_byte()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.acc = 0
        self.n = 0

    def expect_restart(self, idx: int) -> None:
        self.byte_align()
        data = self.data
        if (self.pos + 2 > len(data) or data[self.pos] != 0xFF
                or data[self.pos + 1] != 0xD0 + (idx & 7)):
            got = data[self.pos:self.pos + 2].hex()
            raise ValueError(
                f"expected RST{idx & 7} marker, found bytes 0x{got}"
            )
        self.pos += 2


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing and 1-padding."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: "list[int]",
                     vals: "list[int]") -> "dict[int, tuple[int, int]]":
    """(BITS[1..16], HUFFVAL) → {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical decode tables per T.81 F.16 (mincode/maxcode/valptr)."""

    def __init__(self, bits: "list[int]", vals: "list[int]"):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        if k != len(vals):
            raise ValueError(
                f"DHT counts {k} codes but carries {len(vals)} values"
            )

    def decode(self, reader: _BitReader) -> int:
        code = reader.read_bit()
        length = 1
        while self.maxcode[length] < 0 or code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code (no match in 16 bits)")
            code = (code << 1) | reader.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _huffman_spec(freq: "dict[int, int]") -> "tuple[list[int], list[int]]":
    """Per-image optimal (BITS, HUFFVAL) — T.81 K.2 code sizes via a
    heap, K.3 adjustment to ≤16 bits, all-ones code point reserved by
    giving pseudo-symbol 256 frequency 1 and dropping one code of the
    longest length afterwards (the pseudo merges first, so the dropped
    slot is its own)."""
    import heapq

    f = dict(freq)
    f[256] = 1
    # (-sym) tie-break: among equal frequencies the pseudo merges
    # first, guaranteeing it ends at the maximum depth.
    heap: list = [(cnt, -sym, (sym,)) for sym, cnt in f.items()]
    heapq.heapify(heap)
    depth = dict.fromkeys(f, 0)
    while len(heap) > 1:
        c1, _, m1 = heapq.heappop(heap)
        c2, s2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, s2, m1 + m2))
    bits = [0] * 33
    for s, d in depth.items():
        bits[max(d, 1)] += 1
    # K.3 Adjust_BITS: fold depths beyond 16 upward, preserving Kraft.
    for i in range(32, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    longest = max(i for i in range(1, 17) if bits[i] > 0)
    bits[longest] -= 1  # drop the reserved (pseudo) slot
    out_bits = bits[1:17]
    # HUFFVAL: real symbols sorted by (pre-adjust depth, value), filled
    # into the adjusted histogram in order — canonical and prefix-free
    # for any Kraft-valid histogram.
    vals = [s for s in sorted(f, key=lambda s: (depth[s], s)) if s != 256]
    assert sum(out_bits) == len(vals)
    return out_bits, vals


# ---------------------------------------------------------------------------
# Shared coefficient coding helpers
# ---------------------------------------------------------------------------


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _extend_bits(v: int, size: int) -> int:
    """Value → the `size` appended bits (negative values stored as
    v + 2^size - 1, T.81 F.1.2.1)."""
    return v if v >= 0 else v + (1 << size) - 1


def _receive_extend(reader: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = reader.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _code_block(zblock: "list[int]", pred: int, dc_sink, ac_sink) -> int:
    """Feed one zigzag-quantized block's (symbol, value-bits) pairs to
    the DC/AC sinks; returns the new DC predictor. Sinks are called as
    sink(symbol, extra_value, extra_size)."""
    diff = zblock[0] - pred
    size = _category(diff)
    dc_sink(size, _extend_bits(diff, size), size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zblock[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zblock[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac_sink(0xF0, 0, 0)  # ZRL
            run -= 16
        s = _category(v)
        ac_sink((run << 4) | s, _extend_bits(v, s), s)
        run = 0
    if last_nz != 63:
        ac_sink(0x00, 0, 0)  # EOB
    return zblock[0]


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> "tuple[int, int, int, bytes]":
    """Decode baseline JPEG to (width, height, channels, raster bytes).

    Grayscale frames return channels=1; 3-component frames are treated
    as JFIF YCbCr and return channels=3 RGB. Raster is top-down,
    interleaved.
    """
    import numpy as np

    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) with comps = [(cid, hi, vi, tq)]
    data = payload

    while True:
        if pos + 2 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == _EOI:
            raise ValueError("EOI before any scan data")
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} is not supported: only "
                "baseline/extended sequential Huffman (SOF0/SOF1)"
            )
        (length,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + length]
        pos += length
        if marker in _SOF_BASELINE:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision not supported (8 only)"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported (1 or 3: "
                    "grayscale / JFIF YCbCr; CMYK needs Adobe handling)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 1 + 5 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (w, h, comps)
        elif marker == _DQT:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq:
                    vals = list(struct.unpack_from(">64H", seg, o))
                    o += 128
                else:
                    vals = list(seg[o:o + 64])
                    o += 64
                qtables[tq] = vals  # zigzag order, as stored
        elif marker == _DHT:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                o += 17 + n
        elif marker == _DRI:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == _SOS:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG not supported "
                    f"(scan has {ns} of {len(frame[2])} components)"
                )
            scan_tables = {}
            for c in range(ns):
                cid, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tda >> 4, tda & 15)
            break
        # APPn / COM / others: skipped via the length field.

    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    A = np.array(IDCT_W, dtype=np.int64)
    AT = A.T.copy()

    planes = []
    for cid, hi, vi, tq in comps:
        planes.append(np.zeros((mcus_y * vi * 8, mcus_x * hi * 8),
                               dtype=np.int64))

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    dezig = np.array(ZIGZAG, dtype=np.int64)
    qvecs = []
    dcs_acs = []
    for cid, hi, vi, tq in comps:
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        qvecs.append(np.array(qtables[tq], dtype=np.int64))
        td, ta = scan_tables[cid]
        try:
            dcs_acs.append((huff[(0, td)], huff[(1, ta)]))
        except KeyError as exc:
            raise ValueError(f"missing Huffman table {exc}") from None

    coef_z = np.zeros(64, dtype=np.int64)
    natural = np.zeros(64, dtype=np.int64)
    mcu_count = mcus_x * mcus_y
    rst_idx = 0
    for m in range(mcu_count):
        if restart_interval and m and m % restart_interval == 0:
            reader.expect_restart(rst_idx)
            rst_idx = (rst_idx + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            dc_tab, ac_tab = dcs_acs[ci]
            qv = qvecs[ci]
            for by in range(vi):
                for bx in range(hi):
                    coef_z[:] = 0
                    size = dc_tab.decode(reader)
                    preds[ci] += _receive_extend(reader, size)
                    coef_z[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = ac_tab.decode(reader)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflows the block")
                        coef_z[k] = _receive_extend(reader, s)
                        k += 1
                    natural[:] = 0
                    natural[dezig] = coef_z * qv
                    d = natural.reshape(8, 8)
                    p = AT @ d @ A
                    samp = 128 + ((p + IDCT_HALF) >> IDCT_SHIFT)
                    np.clip(samp, 0, 255, out=samp)
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = samp

    if len(comps) == 1:
        return w, h, 1, planes[0][:h, :w].astype(np.uint8).tobytes()

    # Upsample chroma by index replication and convert to RGB.
    ys = np.arange(h)
    xs = np.arange(w)
    full = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        full.append(planes[ci][np.ix_(ys * vi // vmax, xs * hi // hmax)])
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    r = y + ((_FIX_R_CR * cr + 32768) >> 16)
    g = y - ((_FIX_G_CB * cb + _FIX_G_CR * cr + 32768) >> 16)
    b = y + ((_FIX_B_CB * cb + 32768) >> 16)
    rgb = np.stack(
        [np.clip(c, 0, 255) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _quality_scale(base: "tuple[int, ...]", quality: int) -> "list[int]":
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((b * scale + 50) // 100, 1), 255) for b in base]


def _fdct_quant(plane, qnat: "list[int]"):
    """Float FDCT over an 8-aligned int plane → per-block zigzag
    quantized coefficient lists (row-major block order)."""
    import numpy as np

    af = np.zeros((8, 8))
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            af[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    q = np.array(qnat, dtype=np.float64).reshape(8, 8)
    hh, ww = plane.shape
    out = []
    shifted = plane.astype(np.float64) - 128.0
    for y0 in range(0, hh, 8):
        for x0 in range(0, ww, 8):
            f = af @ shifted[y0:y0 + 8, x0:x0 + 8] @ af.T
            zq = f / q
            blk = np.where(zq >= 0, np.floor(zq + 0.5),
                           -np.floor(-zq + 0.5)).astype(np.int64)
            flat = blk.reshape(64)
            out.append([int(flat[ZIGZAG[k]]) for k in range(64)])
    return out


def _pad_to_multiple(plane, my: int, mx: int):
    """Edge-replicate an (h, w) plane to multiples of (my, mx)."""
    import numpy as np

    hh, ww = plane.shape
    ph = -(-hh // my) * my
    pw = -(-ww // mx) * mx
    return np.pad(plane, ((0, ph - hh), (0, pw - ww)), mode="edge")


def _scan_passes(mcu_stream, n_classes: int, n_comps: int,
                 restart_interval: int):
    """Two-pass entropy coding over a re-iterable MCU block stream.

    ``mcu_stream()`` yields (class_idx, comp_idx, zigzag_block) in
    scan order with MCU boundaries marked by None sentinels — DC
    prediction is per COMPONENT while Huffman tables are per class
    (Cb and Cr share class 1 but predict separately). Returns
    (tables, entropy_bytes) where tables[class_idx] =
    ((dc_bits, dc_vals), (ac_bits, ac_vals)).
    """
    dc_freq: list[dict[int, int]] = [{} for _ in range(n_classes)]
    ac_freq: list[dict[int, int]] = [{} for _ in range(n_classes)]
    preds = [0] * n_comps

    def count_pass() -> None:
        mcu = 0
        for item in mcu_stream():
            if item is None:
                mcu += 1
                if restart_interval and mcu % restart_interval == 0:
                    for i in range(n_comps):
                        preds[i] = 0
                continue
            cls, comp, zb = item
            dsink = lambda s, v, n: dc_freq[cls].__setitem__(  # noqa: E731
                s, dc_freq[cls].get(s, 0) + 1)
            asink = lambda s, v, n: ac_freq[cls].__setitem__(  # noqa: E731
                s, ac_freq[cls].get(s, 0) + 1)
            preds[comp] = _code_block(zb, preds[comp], dsink, asink)

    count_pass()
    # A class whose AC sink never fired (every block dense to k=63)
    # still needs a valid table; seed EOB.
    tables = []
    codes = []
    for cls in range(n_classes):
        if not dc_freq[cls]:
            dc_freq[cls][0] = 1
        if not ac_freq[cls]:
            ac_freq[cls][0x00] = 1
        dspec = _huffman_spec(dc_freq[cls])
        aspec = _huffman_spec(ac_freq[cls])
        tables.append((dspec, aspec))
        codes.append((_canonical_codes(*dspec), _canonical_codes(*aspec)))

    writer = _BitWriter()
    out = bytearray()
    preds = [0] * n_comps
    mcu = 0
    total_mcus = sum(1 for item in mcu_stream() if item is None)
    rst = 0
    for item in mcu_stream():
        if item is None:
            mcu += 1
            if (restart_interval and mcu % restart_interval == 0
                    and mcu < total_mcus):
                writer.pad_to_byte()
                out += writer.buf
                writer.buf = bytearray()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * n_comps
            continue
        cls, comp, zb = item
        dc_codes, ac_codes = codes[cls]

        def dsink(sym, v, n):
            c, ln = dc_codes[sym]
            writer.put(c, ln)
            if n:
                writer.put(v, n)

        def asink(sym, v, n):
            c, ln = ac_codes[sym]
            writer.put(c, ln)
            if n:
                writer.put(v, n)

        preds[comp] = _code_block(zb, preds[comp], dsink, asink)
    writer.pad_to_byte()
    out += writer.buf
    return tables, bytes(out)


def _emit_jpeg(w: int, h: int, comps, qtabs_zig, tables, entropy: bytes,
               restart_interval: int) -> bytes:
    """Assemble the byte stream. comps = [(cid, hi, vi, tq, cls)]."""
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, zigs in sorted(qtabs_zig.items()):
        out += _seg(_DQT, bytes([tq]) + bytes(zigs))
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hi, vi, tq, cls in comps:
        body += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, body)
    for cls, ((dbits, dvals), (abits, avals)) in enumerate(tables):
        out += _seg(_DHT, bytes([cls]) + bytes(dbits) + bytes(dvals))
        out += _seg(_DHT, bytes([0x10 | cls]) + bytes(abits) + bytes(avals))
    if restart_interval:
        out += _seg(_DRI, struct.pack(">H", restart_interval))
    body = bytes([len(comps)])
    for cid, hi, vi, tq, cls in comps:
        body += bytes([cid, (cls << 4) | cls])
    body += b"\x00\x3F\x00"
    out += _seg(_SOS, body)
    out += entropy
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 3,
                quality: int = 90, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode an interleaved 8-bit raster as baseline JPEG.

    channels=1 → grayscale; channels=3 → JFIF YCbCr with 4:4:4 or
    4:2:0 chroma (``subsampling``). Per-image optimal Huffman tables.
    """
    import numpy as np

    if len(pixels) != width * height * channels:
        raise ValueError(
            f"raster length {len(pixels)} != "
            f"{width}x{height}x{channels}"
        )
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    a = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    qluma = _quality_scale(QUANT_LUMA, quality)
    if channels == 1:
        plane = _pad_to_multiple(a.reshape(height, width), 8, 8)
        blocks = _fdct_quant(plane, qluma)
        bw = plane.shape[1] // 8

        def stream():
            for blk in blocks:
                yield (0, 0, list(blk))
                yield None

        _ = bw
        tables, entropy = _scan_passes(stream, 1, 1, restart_interval)
        qz = {0: [qluma[ZIGZAG[k]] for k in range(64)]}
        return _emit_jpeg(width, height, [(1, 1, 1, 0, 0)], qz,
                          tables, entropy, restart_interval)
    if channels != 3:
        raise ValueError("channels must be 1 or 3")

    rgb = a.reshape(height, width, 3)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    yy = np.round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
    cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    yy, cb, cr = (np.clip(p, 0, 255) for p in (yy, cb, cr))
    qchroma = _quality_scale(QUANT_CHROMA, quality)

    if subsampling == "444":
        hi_y = vi_y = 1
        planes = [_pad_to_multiple(p, 8, 8) for p in (yy, cb, cr)]
    else:
        hi_y = vi_y = 2
        ce = _pad_to_multiple(cb, 2, 2)
        re = _pad_to_multiple(cr, 2, 2)
        cb_s = np.round(
            (ce[0::2, 0::2] + ce[0::2, 1::2]
             + ce[1::2, 0::2] + ce[1::2, 1::2]) / 4.0)
        cr_s = np.round(
            (re[0::2, 0::2] + re[0::2, 1::2]
             + re[1::2, 0::2] + re[1::2, 1::2]) / 4.0)
        planes = [_pad_to_multiple(yy, 16, 16),
                  _pad_to_multiple(cb_s, 8, 8),
                  _pad_to_multiple(cr_s, 8, 8)]

    qnat = [qluma, qchroma, qchroma]
    comp_blocks = [_fdct_quant(planes[i], qnat[i]) for i in range(3)]
    samp = [(hi_y, vi_y), (1, 1), (1, 1)]
    bws = [planes[i].shape[1] // 8 for i in range(3)]
    mcus_x = planes[0].shape[1] // (8 * hi_y)
    mcus_y = planes[0].shape[0] // (8 * vi_y)

    def stream():
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci in range(3):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bidx = (my * vi + by) * bws[ci] + mx * hi + bx
                        yield (0 if ci == 0 else 1, ci,
                               list(comp_blocks[ci][bidx]))
            yield None

    tables, entropy = _scan_passes(stream, 2, 3, restart_interval)
    qz = {0: [qluma[ZIGZAG[k]] for k in range(64)],
          1: [qchroma[ZIGZAG[k]] for k in range(64)]}
    comps = [(1, hi_y, vi_y, 0, 0), (2, 1, 1, 1, 1), (3, 1, 1, 1, 1)]
    return _emit_jpeg(width, height, comps, qz, tables, entropy,
                      restart_interval)


def encode_gray_coefficients(width: int, height: int,
                             blocks: "list[list[int]]",
                             qtab_zig: "list[int]",
                             restart_interval: int = 0) -> bytes:
    """Emit a real grayscale baseline JPEG from given zigzag-quantized
    coefficient blocks (row-major block order, DC values absolute —
    DPCM differencing happens here). The gate fixture writer: the
    coefficients stay a closed-form function of md5(text), so the
    DuckDB oracle reproduces the decode without parsing bytes."""
    bw = -(-width // 8)
    bh = -(-height // 8)
    if len(blocks) != bw * bh:
        raise ValueError(f"need {bw * bh} blocks, got {len(blocks)}")

    def stream():
        for blk in blocks:
            yield (0, 0, list(blk))
            yield None

    tables, entropy = _scan_passes(stream, 1, 1, restart_interval)
    return _emit_jpeg(width, height, [(1, 1, 1, 0, 0)], {0: list(qtab_zig)},
                      tables, entropy, restart_interval)
