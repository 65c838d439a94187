"""Baseline JPEG codec in pure Python + numpy (r06 verdict item 5).

The LAST codec-bound image format leaves `_decode_stub`: a genuine
ITU T.81 baseline sequential DCT encoder/decoder pair — real entropy
coding (Annex K Huffman tables written as DHT and REBUILT from the
stream by the decoder, never assumed), real FDCT/IDCT, byte stuffing,
restart markers, YCbCr at 4:4:4, 4:2:2 or 4:2:0 (r08 — MCU-
interleaved data units per T.81 A.2.3, box-mean chroma downsample on
encode, replication upsample on decode). No codec library anywhere.

PROGRESSIVE (SOF2) is real too (r08): the encoder emits a genuine
multi-scan script (interleaved DC successive approximation + per-
component AC spectral selection, optionally with AC successive
approximation refinement scans), and the decoder accumulates
coefficients across scans — DC first/refine, AC first with EOBn
end-of-band runs, AC refinement correction bits per T.81 G.1.2 —
with one IDCT at EOI.

Scope (documented): sequential interleaved or progressive, 8-bit,
1 or 3 components; sequential sampling factors must divide
(hmax, vmax), progressive must be 1x1-sampled. The decoder returns
None for 12-bit / arithmetic-coded / hierarchical / baseline
non-interleaved multi-scan streams instead of guessing.

Oracle strategy (the `multimodal_decode` pattern): JPEG is lossy in
general, so the fixture generator renders images that are CONSTANT
GRAY within each 8x8 block — for those the transform chain is
exactly invertible end-to-end:

  * r=g=b=v  =>  Y=v, Cb=Cr=128 after BT.601 rounding (the weights
    sum to exactly 1.0 / exactly 0),
  * a constant block has ONLY a DC coefficient (AC are ~1e-13 floats
    that quantize to 0), and with all-ones quantization tables the
    DC value 8*(v-128) is carried exactly,
  * the IDCT of a DC-only block is the constant back, and
    YCbCr->RGB returns (v,v,v) exactly.

So a DuckDB oracle recomputes every decoded pixel statistic from the
block-value formula while the Spark side must run the ENTIRE real
decode — Huffman, dequantize, IDCT, color transform — to reproduce
them; generality beyond block-constant inputs is pinned by the
lossy-roundtrip property tests (max |error| bound with unit tables).

Reference behavior parity: none — the reference (hugegraph) has no
media tier; this module serves the training-data-pipeline brief.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------
# Annex K standard Huffman table specifications: (bits[1..16], values)
# ---------------------------------------------------------------------

STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
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
     0xF9, 0xFA],
)
STD_AC_CHROMA = (
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
     0xF9, 0xFA],
)

# zig-zag scan order: ZIGZAG[k] = raster index of the k-th coefficient
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# envelope bound on decoded pixel counts (r08 review): a header-lie
# stream (tiny bytes, 65535x65535 claimed SOF dims) must map to None
# BEFORE the plane / coefficient-store allocation — never a
# MemoryError escaping the None contract. 16.7M px = 4096x4096.
MAX_PIXELS = 1 << 24

# tighter progressive-specific cap (r09 review): the SOF2 coefficient
# store is int32 x 64 per block (~12 bytes/px for 3 components), so a
# header-lie SOF2 near MAX_PIXELS would still pin ~200 MB per asset
# inside an Arrow batch. 4.2M px = 2048x2048 bounds the store at
# ~50 MB; allocation is additionally deferred until the first scan
# header PARSES (see _prog_scan).
MAX_PROG_PIXELS = 1 << 22


import functools


@functools.lru_cache(maxsize=1)
def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix A: FDCT = A @ X @ A.T, IDCT =
    A.T @ F @ A. A[0] rows give F(0,0) = 8 * mean-shifted value for a
    constant block — the exactness hook the oracle leans on. Cached
    (it is a pure constant, was rebuilt per frame — MJPEG profiling
    r10) and frozen so an accidental in-place edit raises instead of
    corrupting every later decode."""
    import numpy as np
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    a[0, :] *= 1.0 / np.sqrt(2.0)
    a.setflags(write=False)
    return a


# Huffman table construction is a pure function of the DHT segment's
# (bits, values); MJPEG streams re-declare the same standard tables
# every frame, so the build cost was paid per frame (profiled ~10% of
# MJPEG decode CPU, r10). Bounded caches (hostile streams can declare
# many distinct tables); call sites pass lists, the cached core keys
# on tuples. The returned dicts are read-only by convention
# (_read_symbol / encoder lookups only).
@functools.lru_cache(maxsize=256)
def _build_huffman_codes_cached(bits, values):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 Annex C."""
    return _build_huffman_codes_cached(tuple(bits), tuple(values))


@functools.lru_cache(maxsize=256)
def _build_huffman_decoder_cached(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_decoder(bits, values):
    """(bits, values) -> {(length, code): symbol} for MSB-first
    bit-at-a-time decoding."""
    return _build_huffman_decoder_cached(tuple(bits), tuple(values))


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81
    B.1.1.5) and 1-padding on flush."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; raises ValueError at markers/EOF mid-symbol."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.i >= len(self.d):
            raise ValueError("jpeg: entropy data exhausted")
        byte = self.d[self.i]
        if byte == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else None
            if nxt == 0x00:
                self.i += 2
            else:
                # a real marker terminates entropy data
                raise ValueError("jpeg: marker inside entropy data")
        else:
            self.i += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to the next marker (for RSTn); discards partial bits."""
        self.acc = 0
        self.n = 0
        while self.i + 1 < len(self.d):
            if self.d[self.i] == 0xFF and self.d[self.i + 1] != 0x00:
                return
            self.i += 1
        raise ValueError("jpeg: expected marker")


def _bit_size(v: int) -> int:
    """JPEG magnitude category: bits needed for |v|."""
    return 0 if v == 0 else abs(v).bit_length()


def _rgb_to_ycbcr(img):
    """JFIF BT.601 RGB->YCbCr, rounded to int16 and clamped. For
    r=g=b=v the weights sum exactly: Y=v, Cb=Cr=128 (the oracle's
    exactness hook)."""
    import numpy as np
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.int16)


def _ycbcr_to_rgb(ycc):
    """JFIF BT.601 YCbCr->RGB, rounded and clamped to uint8."""
    import numpy as np
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64) - 128.0
    cr = ycc[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _quant_table_ones():
    return [1] * 64


def _dqt_segment(tid: int, table) -> bytes:
    return (b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
            + bytes([tid]) + bytes(table[ZIGZAG[k]] for k in range(64)))


def _dht_segment(tclass: int, tid: int, bits, values) -> bytes:
    payload = bytes([tclass << 4 | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


SUBSAMPLING = {  # name -> per-component (h, v) sampling factors
    "4:4:4": ((1, 1), (1, 1), (1, 1)),
    "4:2:2": ((2, 1), (1, 1), (1, 1)),
    "4:2:0": ((2, 2), (1, 1), (1, 1)),
}


def encode_jpeg_rgb(raw: bytes, width: int, height: int,
                    quant=None, restart_interval: int = 0,
                    subsampling: str = "4:4:4") -> bytes:
    """REAL baseline JPEG encoder: YCbCr with 4:4:4 (default), 4:2:2
    or 4:2:0 chroma subsampling (r08 — box-mean downsample, MCU-
    interleaved data units per T.81 A.2.3), all-ones quantization by
    default (near-lossless — the fixture exactness configuration),
    Annex K Huffman tables, differential DC, run-length AC with
    ZRL/EOB, byte stuffing. `raw` is row-major RGB, len = w*h*3.
    Edge blocks pad by edge replication (cropped on decode).
    ``restart_interval`` > 0 emits a DRI segment and byte-aligned
    RSTn markers every that many MCUs with DC predictors reset
    (T.81 B.2.4.4/E.1.4) — the stream shape parallel decoders rely
    on, and the exerciser for the decoder's resync path.

    Subsampled-gray exactness hook: for r=g=b inputs both chroma
    planes are the constant 128, whose box mean IS 128, so the
    block-constant-gray oracle geometry survives 4:2:0/4:2:2 intact
    (Y rides at full resolution either way)."""
    import numpy as np
    assert len(raw) == width * height * 3
    sampling = SUBSAMPLING[subsampling]
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    img = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(img)
    q = list(quant) if quant is not None else _quant_table_ones()
    qmat = np.asarray(q, dtype=np.float64).reshape(8, 8)
    a = _dct_matrix()

    # MCU grid: hmax x vmax luma blocks per MCU
    mx = -(-width // (8 * hmax))
    my = -(-height // (8 * vmax))
    # per-component planes, padded by edge replication to the MCU
    # grid at that component's resolution; non-full components are
    # box-mean downsampled from the padded full-res plane
    full_h, full_w = my * 8 * vmax, mx * 8 * hmax
    planes = []
    for ci, (h, v) in enumerate(sampling):
        comp = np.pad(ycc[:, :, ci].astype(np.float64),
                      ((0, full_h - height), (0, full_w - width)),
                      mode="edge")
        if (h, v) != (hmax, vmax):
            fy, fx = vmax // v, hmax // h
            comp = np.rint(
                comp.reshape(full_h // fy, fy, full_w // fx, fx)
                .mean(axis=(1, 3)))
        planes.append(comp)

    dc_codes = [_build_huffman_codes(*STD_DC_LUMA),
                _build_huffman_codes(*STD_DC_CHROMA)]
    ac_codes = [_build_huffman_codes(*STD_AC_LUMA),
                _build_huffman_codes(*STD_AC_CHROMA)]

    w = _BitWriter()
    prev_dc = [0, 0, 0]

    def put_block(plane, py, px, comp, tbl):
        block = plane[py * 8:(py + 1) * 8, px * 8:(px + 1) * 8] - 128.0
        coef = a @ block @ a.T
        coef = np.rint(coef / qmat).astype(np.int64)
        zz = [int(coef.flat[ZIGZAG[k]]) for k in range(64)]
        # DC: differential
        diff = zz[0] - prev_dc[comp]
        prev_dc[comp] = zz[0]
        size = _bit_size(diff)
        code, length = dc_codes[tbl][size]
        w.write(code, length)
        if size:
            w.write(diff if diff > 0 else diff + (1 << size) - 1,
                    size)
        # AC: run-length
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[tbl][0xF0]  # ZRL
                w.write(code, length)
                run -= 16
            size = _bit_size(v)
            code, length = ac_codes[tbl][run << 4 | size]
            w.write(code, length)
            w.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            code, length = ac_codes[tbl][0x00]  # EOB
            w.write(code, length)

    mcu = 0
    for by in range(my):
        for bx in range(mx):
            if restart_interval and mcu and \
                    mcu % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (mcu // restart_interval
                                              - 1) % 8])
                prev_dc = [0, 0, 0]
            mcu += 1
            # T.81 A.2.3 interleave: each component contributes its
            # h x v data units per MCU, raster order within the MCU
            for ci, (h, v) in enumerate(sampling):
                tbl = 0 if ci == 0 else 1
                for dv in range(v):
                    for dh in range(h):
                        put_block(planes[ci], by * v + dv,
                                  bx * h + dh, ci, tbl)
    w.flush()

    sof = (b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8,
                                     height, width, 3)
           + bytes([1, sampling[0][0] << 4 | sampling[0][1], 0])
           + bytes([2, sampling[1][0] << 4 | sampling[1][1], 1])
           + bytes([3, sampling[2][0] << 4 | sampling[2][1], 1]))
    sos = (b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
           + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
           + bytes([0, 63, 0]))
    dri = (b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
           if restart_interval else b"")
    return (b"\xff\xd8"
            + _dqt_segment(0, q) + _dqt_segment(1, q)
            + dri + sof
            + _dht_segment(0, 0, *STD_DC_LUMA)
            + _dht_segment(1, 0, *STD_AC_LUMA)
            + _dht_segment(0, 1, *STD_DC_CHROMA)
            + _dht_segment(1, 1, *STD_AC_CHROMA)
            + sos + bytes(w.out) + b"\xff\xd9")


def decode_jpeg_rgb(b: bytes):
    """REAL baseline JPEG pixel decode: segment walk (DQT/DHT/SOF0/
    DRI/SOS are PARSED from the stream, nothing assumed), bit-level
    Huffman decode with un-stuffing and RSTn handling, dequantize,
    un-zigzag, IDCT, chroma upsample (pixel replication per the JFIF
    convention) for subsampled streams (r08 — 4:2:0/4:2:2 and any
    layout whose factors divide hmax/vmax), YCbCr->RGB (or grayscale
    replication). Returns (width, height, bytearray row-major RGB)
    or None for anything outside the supported envelope (12-bit,
    arithmetic-coded, hierarchical, progressive-with-subsampling,
    non-dividing sampling factors) or malformed — same None-not-raise
    contract as decode_png_rgb.

    PROGRESSIVE (SOF2) streams decode for 1x1-sampled components
    (r08): quantized coefficients accumulate across scans — DC
    first/refinement via successive approximation, AC spectral
    selection with full EOBRUN (EOBn) handling and AC refinement
    correction bits per T.81 G.1.2 — then ONE dequantize + IDCT at
    EOI. The coefficients equal a sequential stream's of the same
    image, so outputs are byte-identical (the property gate).
    Progressive dims are capped at MAX_PROG_PIXELS (2048x2048; the
    int32 coefficient store costs ~12 bytes/px) vs MAX_PIXELS for
    baseline."""
    import numpy as np
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    try:
        quant = {}
        huff_dc = {}
        huff_ac = {}
        width = height = None
        comps = []          # (cid, qid, h, v)
        scan = []           # (comp index, dc table, ac table)
        restart_interval = 0
        progressive = False
        prog = None         # (nc, bh*bw, 64) zigzag coefficients
        prog_scanned = False
        i = 2
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:
                if progressive and prog_scanned:
                    return _prog_reconstruct(prog, comps, quant,
                                             width, height)
                return None  # EOI before any decodable scan
            if i + 4 > len(b):
                return None
            (seg_len,) = struct.unpack(">H", b[i + 2:i + 4])
            data = b[i + 4:i + 2 + seg_len]
            if marker == 0xDB:  # DQT (possibly several tables)
                j = 0
                while j < len(data):
                    prec = data[j] >> 4
                    tid = data[j] & 0x0F
                    if prec != 0:
                        return None  # 16-bit tables: out of envelope
                    tbl = [0] * 64
                    for k in range(64):
                        tbl[ZIGZAG[k]] = data[j + 1 + k]
                    quant[tid] = tbl
                    j += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                j = 0
                while j < len(data):
                    tclass = data[j] >> 4
                    tid = data[j] & 0x0F
                    bits = list(data[j + 1:j + 17])
                    n = sum(bits)
                    vals = list(data[j + 17:j + 17 + n])
                    dec = _build_huffman_decoder(bits, vals)
                    (huff_dc if tclass == 0 else huff_ac)[tid] = dec
                    j += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                if comps:
                    # a second SOF in one stream is malformed (T.81
                    # B.2.2 allows exactly one frame header) — and
                    # repeated SOF2 headers would each grow `comps`,
                    # multiplying the lazily-sized progressive store
                    # unboundedly (r09 review wave 2)
                    return None
                _prec, height, width, nc = struct.unpack(
                    ">BHHB", data[:6])
                if _prec != 8 or nc not in (1, 3) \
                        or width * height > MAX_PIXELS:
                    return None
                for c in range(nc):
                    cid, sampling, qid = data[6 + c * 3:9 + c * 3]
                    sh, sv = sampling >> 4, sampling & 0x0F
                    if not (1 <= sh <= 4 and 1 <= sv <= 4):
                        return None
                    comps.append((cid, qid, sh, sv))
                if nc == 1 and (comps[0][2], comps[0][3]) != (1, 1):
                    # a single-component scan is NON-interleaved
                    # (T.81 A.2.2: MCU = 1 data unit); the factors
                    # are meaningless there and we keep the simple
                    # envelope
                    return None
            elif marker == 0xC2:  # SOF2 progressive
                if comps:
                    return None  # one frame header per stream (above)
                _prec, height, width, nc = struct.unpack(
                    ">BHHB", data[:6])
                if _prec != 8 or nc not in (1, 3) \
                        or width * height > MAX_PROG_PIXELS:
                    return None
                for c in range(nc):
                    cid, sampling, qid = data[6 + c * 3:9 + c * 3]
                    if sampling != 0x11:
                        return None  # progressive+subsampled: out
                    comps.append((cid, qid, 1, 1))
                if width < 1 or height < 1:
                    return None
                progressive = True
                pbw = -(-width // 8)
                pbh = -(-height // 8)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # extended/arithmetic/hierarchical
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", data[:2])
            elif marker == 0xDA and progressive:
                # one progressive scan: decode it into the
                # coefficient store, then continue the segment walk
                # at the marker that terminated the entropy data.
                # _prog_scan allocates the store lazily AFTER the
                # scan header validates (r09: a header-lie SOF2
                # prefix must not trigger the allocation)
                i, prog = _prog_scan(b, i + 2 + seg_len, data, comps,
                                     prog, huff_dc, huff_ac,
                                     restart_interval, pbh * pbw)
                prog_scanned = True
                continue
            elif marker == 0xDA:  # baseline SOS — entropy follows
                ns = data[0]
                if ns != len(comps):
                    return None  # non-interleaved multi-scan: out
                for s in range(ns):
                    cid = data[1 + s * 2]
                    tables = data[2 + s * 2]
                    ci = next(k for k, c in enumerate(comps)
                              if c[0] == cid)
                    scan.append((ci, tables >> 4, tables & 0x0F))
                i = i + 2 + seg_len
                break
            i += 2 + seg_len
        else:
            return None
        if progressive:
            return None  # stream ended without EOI
        if width is None or not scan or width < 1 or height < 1:
            return None

        nc = len(comps)
        hmax = max(c[2] for c in comps)
        vmax = max(c[3] for c in comps)
        for _, _, sh, sv in comps:
            if hmax % sh or vmax % sv:
                return None  # replication upsample needs divisors
        a = _dct_matrix()
        # MCU grid at hmax x vmax luma blocks per MCU
        mx = -(-width // (8 * hmax))
        my = -(-height // (8 * vmax))
        planes = [np.zeros((my * 8 * c[3], mx * 8 * c[2]),
                           dtype=np.uint8) for c in comps]
        reader = _BitReader(b, i)
        prev_dc = [0] * nc
        mcu = 0

        def get_block(ci, dc_t, ac_t, py, px):
            qtbl = quant[comps[ci][1]]
            dct = huff_dc[dc_t]
            act = huff_ac[ac_t]
            zz = [0] * 64
            # DC
            sym = _read_symbol(reader, dct)
            if sym > 11:
                raise ValueError("jpeg: DC category > 11")  # T.81 F.1
            if sym:
                diff = _extend(reader.read_bits(sym), sym)
            else:
                diff = 0
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci]
            # AC
            k = 1
            while k < 64:
                sym = _read_symbol(reader, act)
                if sym == 0x00:  # EOB
                    break
                run = sym >> 4
                size = sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("jpeg: bad AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC index overflow")
                zz[k] = _extend(reader.read_bits(size), size)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            for k in range(64):
                coef[ZIGZAG[k]] = zz[k] * qtbl[ZIGZAG[k]]
            block = a.T @ coef.reshape(8, 8) @ a
            pix = np.clip(np.rint(block) + 128, 0, 255) \
                .astype(np.uint8)
            planes[ci][py * 8:(py + 1) * 8,
                       px * 8:(px + 1) * 8] = pix

        for by in range(my):
            for bx in range(mx):
                if restart_interval and mcu and \
                        mcu % restart_interval == 0:
                    reader.align_to_marker()
                    m = b[reader.i + 1]
                    if not (0xD0 <= m <= 0xD7):
                        raise ValueError("jpeg: expected RSTn")
                    reader.i += 2
                    prev_dc = [0] * nc
                mcu += 1
                # T.81 A.2.3 interleave order within the MCU
                for ci, dc_t, ac_t in scan:
                    sh, sv = comps[ci][2], comps[ci][3]
                    for dv in range(sv):
                        for dh in range(sh):
                            get_block(ci, dc_t, ac_t,
                                      by * sv + dv, bx * sh + dh)
        # upsample subsampled planes by pixel replication, crop,
        # stack to (h, w, nc)
        out = np.empty((height, width, nc), dtype=np.uint8)
        for ci, (_, _, sh, sv) in enumerate(comps):
            p = planes[ci]
            if (sh, sv) != (hmax, vmax):
                p = np.repeat(np.repeat(p, vmax // sv, axis=0),
                              hmax // sh, axis=1)
            out[:, :, ci] = p[:height, :width]
        if nc == 1:
            rgb = np.repeat(out, 3, axis=2)
        else:
            rgb = _ycbcr_to_rgb(out.astype(np.int16))
        return width, height, bytearray(rgb.tobytes())
    except (ValueError, struct.error, IndexError, KeyError,
            StopIteration, OverflowError, MemoryError):
        # OverflowError (r09 review): numpy >= 2.0 raises on an
        # out-of-int32 assignment (hostile DC accumulation) where
        # 1.x only wrapped — both must resolve to None, not raise.
        # MemoryError is belt-and-braces behind the single-SOF +
        # MAX_PROG_PIXELS caps: a hostile stream must map to None,
        # never kill the Spark task.
        return None


def _read_symbol(reader: _BitReader, table) -> int:
    """One Huffman symbol, MSB-first, max 16 bits."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to the signed
    coefficient value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _prog_scan(b: bytes, i: int, data: bytes, comps, prog,
               huff_dc, huff_ac, restart_interval: int,
               n_blocks: int):
    """Decode ONE progressive scan (T.81 G.2): entropy data starts at
    offset ``i``; the scan header is ``data``. Coefficients
    accumulate into ``prog`` (nc, n_blocks, 64), zigzag-indexed —
    allocated HERE on the first scan, after the scan header has
    validated (r09 review: a ~30-byte SOF2 header-lie prefix must
    fail before the coefficient-store allocation, not after).
    Returns (offset of the marker that terminated the entropy data,
    prog). All four scan kinds: DC first (diff-coded at Al), DC
    refinement (one raw bit per block), AC first (run-length with
    EOBn end-of-band runs), AC refinement (correction bits per
    G.1.2.3 — the libjpeg decode_mcu_AC_refine structure)."""
    import numpy as np
    ns = data[0]
    sel = []
    for s in range(ns):
        cid = data[1 + s * 2]
        tables = data[2 + s * 2]
        ci = next(k for k, c in enumerate(comps) if c[0] == cid)
        sel.append((ci, tables >> 4, tables & 0x0F))
    ss, se = data[1 + ns * 2], data[2 + ns * 2]
    ah, al = data[3 + ns * 2] >> 4, data[3 + ns * 2] & 0x0F
    if ss > se or se > 63 or al > 13:
        raise ValueError("jpeg: bad progressive scan header")
    if prog is None:
        prog = np.zeros((len(comps), n_blocks, 64), dtype=np.int32)
    reader = _BitReader(b, i)

    def resync(unit, state_reset):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_to_marker()
            if not (0xD0 <= b[reader.i + 1] <= 0xD7):
                raise ValueError("jpeg: expected RSTn")
            reader.i += 2
            state_reset()

    if ss == 0:  # DC scan (interleaved over sel; Se must be 0)
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        if ah == 0:  # first pass: diff-coded at Al
            pred = [0] * len(sel)

            def reset():
                nonlocal pred
                pred = [0] * len(sel)

            for blk in range(n_blocks):
                resync(blk, reset)
                for si, (ci, dc_t, _) in enumerate(sel):
                    sym = _read_symbol(reader, huff_dc[dc_t])
                    if sym > 11:
                        # T.81 Table F.1: 8-bit DC difference
                        # categories are 0..11; a hostile DHT can
                        # carry values up to 255, which would read
                        # 255 raw bits and overflow the int32 store
                        raise ValueError("jpeg: DC category > 11")
                    diff = _extend(reader.read_bits(sym), sym) \
                        if sym else 0
                    pred[si] += diff
                    prog[ci, blk, 0] = pred[si] << al
        else:  # refinement: bit Al of each DC, one raw bit apiece
            for blk in range(n_blocks):
                resync(blk, lambda: None)
                for ci, _, _ in sel:
                    if reader.read_bit():
                        prog[ci, blk, 0] |= 1 << al
    else:  # AC scan: single component only (T.81 G.1.1.1.1)
        if ns != 1:
            raise ValueError("jpeg: interleaved AC scan")
        ci, _, ac_t = sel[0]
        act = huff_ac[ac_t]
        eobrun = 0

        def reset():
            nonlocal eobrun
            eobrun = 0

        if ah == 0:  # first (full or Al-shifted) pass
            for blk in range(n_blocks):
                resync(blk, reset)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _read_symbol(reader, act)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1  # EOBn covers this blk
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("jpeg: AC index overflow")
                    prog[ci, blk, k] = \
                        _extend(reader.read_bits(s), s) << al
                    k += 1
        else:  # refinement: corrections + newly-significant coeffs
            p1, m1 = 1 << al, -1 << al
            for blk in range(n_blocks):
                resync(blk, reset)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _read_symbol(reader, act)
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            val = 0  # ZRL: 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "jpeg: bad AC refine symbol")
                            val = p1 if reader.read_bit() else m1
                        # advance past r zero-history positions,
                        # emitting correction bits for nonzero ones
                        while k <= se:
                            cur = int(prog[ci, blk, k])
                            if cur != 0:
                                if reader.read_bit() and \
                                        not (cur & p1):
                                    prog[ci, blk, k] = cur + (
                                        p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            prog[ci, blk, k] = val
                        k += 1
                if eobrun > 0:
                    # inside the EOB run: correction bits only for
                    # the band's remaining nonzero-history coeffs
                    while k <= se:
                        cur = int(prog[ci, blk, k])
                        if cur != 0 and reader.read_bit() and \
                                not (cur & p1):
                            prog[ci, blk, k] = cur + (
                                p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1
    reader.align_to_marker()
    return reader.i, prog


def _prog_reconstruct(prog, comps, quant, width: int, height: int):
    """Final progressive reconstruction at EOI: dequantize the
    accumulated coefficients, un-zigzag, IDCT per block, crop,
    YCbCr->RGB (or grayscale replication) — identical math to the
    baseline path, so a full-script progressive stream reproduces the
    sequential decode byte-for-byte."""
    import numpy as np
    nc = len(comps)
    bw = -(-width // 8)
    bh = -(-height // 8)
    a = _dct_matrix()
    zz_to_raster = np.asarray(ZIGZAG)
    planes = np.zeros((bh * 8, bw * 8, nc), dtype=np.uint8)
    for ci in range(nc):
        qtbl = np.asarray(quant[comps[ci][1]], dtype=np.float64)
        for blk in range(bh * bw):
            coef = np.zeros(64, dtype=np.float64)
            coef[zz_to_raster] = prog[ci, blk] * qtbl[zz_to_raster]
            block = a.T @ coef.reshape(8, 8) @ a
            pix = np.clip(np.rint(block) + 128, 0, 255) \
                .astype(np.uint8)
            by, bx = divmod(blk, bw)
            planes[by * 8:(by + 1) * 8,
                   bx * 8:(bx + 1) * 8, ci] = pix
    planes = planes[:height, :width, :]
    if nc == 1:
        rgb = np.repeat(planes, 3, axis=2)
    else:
        rgb = _ycbcr_to_rgb(planes.astype(np.int16))
    return width, height, bytearray(rgb.tobytes())


def encode_jpeg_rgb_progressive(raw: bytes, width: int,
                                height: int, quant=None,
                                ac_successive: bool = False,
                                restart_interval: int = 0) -> bytes:
    """REAL progressive JPEG encoder (r08 — SOF2): 4:4:4 YCbCr with a
    genuine multi-scan script —

      scan 1: DC, all 3 components interleaved, successive
              approximation first pass (Ah=0, Al=1);
      scan 2: DC refinement (Ah=1, Al=0) — one raw bit per block;
      scans 3-5: per-component AC spectral selection, band 1..63 in
              one full-precision pass (Ah=0, Al=0), blocks ended
              individually with EOB0 (a legal EOBRUN of one, so the
              Annex K tables suffice — they carry no EOBn>0 symbols).

    With ``ac_successive`` the AC band ships in TWO passes per
    component instead — first at Al=1, then an Ah=1→Al=0 REFINEMENT
    scan carrying newly-significant coefficients and buffered
    correction bits (the T.81 G.1.2.3 / libjpeg
    encode_mcu_AC_refine algorithm) — exercising the decoder's AC
    refinement path on arbitrary images.

    Spectral selection + successive approximation is the real-world
    progressive shape (libjpeg's default script is a finer slicing of
    the same mechanics). Accumulated coefficients are IDENTICAL to
    the sequential encoder's, so with the same quant tables
    `decode(progressive) == decode(sequential)` byte-for-byte — the
    property gate — and the block-constant-gray oracle geometry
    carries over unchanged (bits lost in first passes are restored by
    the refinements)."""
    import numpy as np
    assert len(raw) == width * height * 3
    img = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(img)
    q = list(quant) if quant is not None else _quant_table_ones()
    qmat = np.asarray(q, dtype=np.float64).reshape(8, 8)
    a = _dct_matrix()
    bw = -(-width // 8)
    bh = -(-height // 8)
    padded = np.pad(ycc, ((0, bh * 8 - height), (0, bw * 8 - width),
                          (0, 0)), mode="edge")
    # quantized zigzag coefficients, identical to the sequential path
    coefs = np.zeros((3, bh * bw, 64), dtype=np.int64)
    for ci in range(3):
        for by in range(bh):
            for bx in range(bw):
                block = padded[by * 8:(by + 1) * 8,
                               bx * 8:(bx + 1) * 8, ci] \
                    .astype(np.float64) - 128.0
                coef = np.rint((a @ block @ a.T) / qmat).astype(
                    np.int64)
                coefs[ci, by * bw + bx] = coef.ravel()[ZIGZAG]

    dc_codes = [_build_huffman_codes(*STD_DC_LUMA),
                _build_huffman_codes(*STD_DC_CHROMA)]
    ac_codes = [_build_huffman_codes(*STD_AC_LUMA),
                _build_huffman_codes(*STD_AC_CHROMA)]

    def sos(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for ci, dc_t, ac_t in comps:
            body += bytes([ci + 1, dc_t << 4 | ac_t])
        body += bytes([ss, se, ah << 4 | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def rst(w, blk, state_reset=None):
        """Emit a byte-aligned RSTn before block ``blk`` when the
        restart interval says so (T.81 E.1.4 — same cadence as the
        decoder's resync expectations)."""
        if restart_interval and blk and blk % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + (blk // restart_interval
                                          - 1) % 8])
            if state_reset:
                state_reset()

    out = bytearray()
    # scan 1: DC first pass, interleaved, Al=1
    w = _BitWriter()
    prev = [0, 0, 0]

    def reset_prev():
        nonlocal prev
        prev = [0, 0, 0]

    for blk in range(bh * bw):
        rst(w, blk, reset_prev)
        for ci in range(3):
            tbl = 0 if ci == 0 else 1
            v = int(coefs[ci, blk, 0]) >> 1
            diff = v - prev[ci]
            prev[ci] = v
            size = _bit_size(diff)
            code, length = dc_codes[tbl][size]
            w.write(code, length)
            if size:
                w.write(diff if diff > 0 else diff + (1 << size) - 1,
                        size)
    w.flush()
    out += sos([(0, 0, 0), (1, 1, 0), (2, 1, 0)], 0, 0, 0, 1)
    out += bytes(w.out)
    # scan 2: DC refinement, interleaved, one raw bit per block
    w = _BitWriter()
    for blk in range(bh * bw):
        rst(w, blk)
        for ci in range(3):
            w.write(int(coefs[ci, blk, 0]) & 1, 1)
    w.flush()
    out += sos([(0, 0, 0), (1, 1, 0), (2, 1, 0)], 0, 0, 1, 0)
    out += bytes(w.out)
    # AC scans, per component: one full pass, or (ac_successive) an
    # Al=1 first pass + an Ah=1->Al=0 refinement pass
    def ac_first(ci, tbl, al):
        w = _BitWriter()
        for blk in range(bh * bw):
            rst(w, blk)
            run = 0
            for k in range(1, 64):
                # T.81 G.1.2.2: the first pass codes the MAGNITUDE
                # shifted by Al (sign preserved), not an arithmetic
                # shift of the signed value
                v = int(coefs[ci, blk, k])
                v = (abs(v) >> al) * (1 if v >= 0 else -1)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[tbl][0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                size = _bit_size(v)
                code, length = ac_codes[tbl][run << 4 | size]
                w.write(code, length)
                w.write(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if run:
                code, length = ac_codes[tbl][0x00]  # EOB0 (run of 1)
                w.write(code, length)
        w.flush()
        return bytes(w.out)

    def ac_refine(ci, tbl, al):
        # libjpeg encode_mcu_AC_refine: newly-significant coeffs as
        # (run << 4 | 1) + sign, correction bits BUFFERED and flushed
        # after the next emitted symbol; trailing state closes with
        # EOB0 + its buffered bits
        w = _BitWriter()
        for blk in range(bh * bw):
            rst(w, blk)
            absv = [abs(int(coefs[ci, blk, k])) >> al
                    for k in range(64)]
            eob = 0
            for k in range(1, 64):
                if absv[k] == 1:
                    eob = k
            run = 0
            buffered = []

            def flush_bits():
                for bit in buffered:
                    w.write(bit, 1)
                buffered.clear()

            for k in range(1, 64):
                temp = absv[k]
                if temp == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    code, length = ac_codes[tbl][0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                    flush_bits()
                if temp > 1:
                    # already significant: buffer its correction bit
                    buffered.append(temp & 1)
                    continue
                # newly significant (temp == 1)
                code, length = ac_codes[tbl][run << 4 | 1]
                w.write(code, length)
                w.write(1 if int(coefs[ci, blk, k]) > 0 else 0, 1)
                flush_bits()
                run = 0
            if run or buffered:
                code, length = ac_codes[tbl][0x00]  # EOB0
                w.write(code, length)
                flush_bits()
        w.flush()
        return bytes(w.out)

    for ci in range(3):
        tbl = 0 if ci == 0 else 1
        if ac_successive:
            out += sos([(ci, 0, tbl)], 1, 63, 0, 1)
            out += ac_first(ci, tbl, 1)
        else:
            out += sos([(ci, 0, tbl)], 1, 63, 0, 0)
            out += ac_first(ci, tbl, 0)
    if ac_successive:
        for ci in range(3):
            tbl = 0 if ci == 0 else 1
            out += sos([(ci, 0, tbl)], 1, 63, 1, 0)
            out += ac_refine(ci, tbl, 0)

    sof = (b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * 3, 8,
                                     height, width, 3)
           + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1])
           + bytes([3, 0x11, 1]))
    dri = (b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
           if restart_interval else b"")
    return (b"\xff\xd8"
            + _dqt_segment(0, q) + _dqt_segment(1, q)
            + dri + sof
            + _dht_segment(0, 0, *STD_DC_LUMA)
            + _dht_segment(1, 0, *STD_AC_LUMA)
            + _dht_segment(0, 1, *STD_DC_CHROMA)
            + _dht_segment(1, 1, *STD_AC_CHROMA)
            + bytes(out) + b"\xff\xd9")
