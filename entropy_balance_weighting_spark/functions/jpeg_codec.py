"""Baseline JPEG codec in pure numpy + stdlib — no media libraries.

The fourth REAL decoder in the multimodal layer (after BMP, PNG, WAV):
baseline sequential DCT JPEG (ITU-T T.81) — grayscale or color at any
integer sampling-factor layout (4:4:4 / 4:2:2 / 4:2:0 chroma
subsampling with nearest-neighbor upsample on decode), restart
intervals (DRI/RSTn), standard JFIF color transform, and the Annex K
quantization/Huffman tables.  The encoder exists primarily as the
fixture generator for the decode path (quality, subsampling, and
restart interval all parameterized), but is a usable sink in its own
right.

Decode dataflow: marker walk (stdlib ``struct``) → Huffman entropy
decode (the one inherently bit-serial stage — per-symbol Python over a
(length, code)→symbol table, exactly the spec's FIGURE F.16 procedure)
→ dequantize + inverse zigzag (numpy gather) → IDCT for ALL blocks in
two batched matmuls (``M.T @ C @ M`` over an (nblocks, 8, 8) stack) →
YCbCr→RGB.  Everything except the entropy scan is vectorized over the
whole image.

Unsupported (named errors): progressive/arithmetic coding, 12-bit
precision, non-integer sampling-factor ratios.  JPEG is lossy: roundtrips reconstruct within quantization
error, so tests/oracles assert error bounds (and exact values for
DC-only images), not bit equality.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (ITU-T T.81 Annex K — public spec tables) ---------------------

# K.1 luminance / K.2 chrominance quantization tables (quality 50 base)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag order: _ZIGZAG[i] = flat (row-major) index of the i-th zigzag coeff
def _zigzag_order() -> np.ndarray:
    idx = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for i in (rng if s % 2 else reversed(rng)):
            idx.append(i * 8 + (s - i))
    return np.array(idx, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# K.3 standard Huffman tables: (bits-per-length[1..16], symbol values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
        0xF9, 0xFA,
    ],
)

# 8×8 DCT-II basis: _DCT_M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= 1.0 / np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables (public formula)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _build_code_tables(bits, values):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    {symbol: (code, length)} for encoding and {(length, code): symbol}
    for decoding."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_ENC_DC_L, _DEC_DC_L = _build_code_tables(*_DC_LUMA)
_ENC_DC_C, _DEC_DC_C = _build_code_tables(*_DC_CHROMA)
_ENC_AC_L, _DEC_AC_L = _build_code_tables(*_AC_LUMA)
_ENC_AC_C, _DEC_AC_C = _build_code_tables(*_AC_CHROMA)


# -- color transform (JFIF / BT.601, public) ---------------------------------
def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# -- bit I/O -----------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("malformed JPEG payload: entropy data ran out")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    # a real marker mid-scan (e.g. truncation into EOI)
                    raise ValueError(
                        "malformed JPEG payload: marker inside entropy data"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("malformed JPEG payload: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Consume an RSTn marker at a restart boundary: discard the
        pad bits of the current byte, then expect ``0xFF 0xD0+n``."""
        self._n = 0  # byte-align
        if self.pos + 2 > len(self.data):
            raise ValueError("malformed JPEG payload: missing restart marker")
        m0, m1 = self.data[self.pos], self.data[self.pos + 1]
        if m0 != 0xFF or m1 != 0xD0 + (n & 7):
            raise ValueError(
                f"malformed JPEG payload: expected RST{n & 7}, "
                f"got {m0:02x}{m1:02x}"
            )
        self.pos += 2


def _receive_extend(r: _BitReader, size: int) -> int:
    """T.81 F.2.2.1 RECEIVE+EXTEND: size-bit magnitude to signed value."""
    if size == 0:
        return 0
    v = r.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# -- encoder -----------------------------------------------------------------

# luma sampling factors (h, v); chroma is always (1, 1)
_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int, enc_dc, enc_ac) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC (the
    next block's DPCM predictor)."""
    dc = int(blk[0])
    diff = dc - pred
    size = _category(diff)
    code, length = enc_dc[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = enc_ac[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = enc_ac[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, length = enc_ac[0x00]  # EOB
        bw.write(code, length)
    return dc


# Flat Huffman table for progressive scans: symbols 0x00..0xFE as 9-bit
# canonical codes 0..254 and 0xFF as the single 10-bit code 510 (a DHT
# length-count is one byte, so 256 codes cannot share one length; the
# all-ones codes 0x1FF/0x3FF are never assigned, as T.81 requires).
# Progressive needs the EOBn symbols (r<<4 for r>=1) that the Annex K
# baseline AC tables don't define, and a real encoder would build
# optimized tables per scan; a fixed flat table keeps the fixtures
# simple while still exercising the decoder's real DHT-driven paths.
_FLAT_BITS = [0] * 8 + [255, 1] + [0] * 6
_FLAT_VALUES = list(range(256))
_ENC_FLAT = {s: (s, 9) for s in range(255)}
_ENC_FLAT[255] = (510, 10)


def _emit_ac_first_block(bw, blk, ss, se, al, enc_ac, eobrun: int) -> int:
    """Progressive AC initial scan, one block (T.81 §G.1.2.2 / IJG
    encode_mcu_AC_first); returns the updated pending EOB run."""
    r = 0
    for k in range(ss, se + 1):
        t = int(blk[k])
        neg = t < 0
        t = (-t if neg else t) >> al
        if t == 0:
            r += 1
            continue
        if eobrun:
            eobrun = _flush_eobrun(bw, enc_ac, eobrun)
        while r > 15:
            code, length = enc_ac[0xF0]
            bw.write(code, length)
            r -= 16
        s = t.bit_length()
        code, length = enc_ac[(r << 4) | s]
        bw.write(code, length)
        bw.write((~t if neg else t) & ((1 << s) - 1), s)
        r = 0
    if r:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(bw, enc_ac, eobrun)
    return eobrun


def _flush_eobrun(bw, enc_ac, eobrun: int, bits: list | None = None) -> int:
    """Emit a pending EOBn symbol (+ its extra bits), then any buffered
    refinement correction bits."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, length = enc_ac[nbits << 4]
        bw.write(code, length)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
    if bits:
        for bit in bits:
            bw.write(bit, 1)
        bits.clear()
    return 0


def _emit_ac_refine_block(
    bw, blk, ss, se, al, enc_ac, eobrun: int, be_bits: list
) -> int:
    """Progressive AC refinement scan, one block (T.81 §G.1.2.3 / IJG
    encode_mcu_AC_refine).  ``be_bits`` buffers correction bits that
    belong to the pending EOB run; returns the updated run."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1
    for i, t in enumerate(absv):
        if t == 1:
            eob_k = ss + i
    r = 0
    br: list[int] = []  # current block's correction bits
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            eobrun = _flush_eobrun(bw, enc_ac, eobrun, be_bits)
            code, length = enc_ac[0xF0]
            bw.write(code, length)
            r -= 16
            for bit in br:
                bw.write(bit, 1)
            br = []
        if t > 1:  # history coefficient: correction bit only
            br.append(t & 1)
            continue
        # newly-nonzero coefficient at this precision
        eobrun = _flush_eobrun(bw, enc_ac, eobrun, be_bits)
        code, length = enc_ac[(r << 4) | 1]
        bw.write(code, length)
        bw.write(0 if int(blk[k]) < 0 else 1, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        eobrun += 1
        be_bits.extend(br)
        if eobrun == 0x7FFF or len(be_bits) > 900:
            eobrun = _flush_eobrun(bw, enc_ac, eobrun, be_bits)
    return eobrun


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode an ``(H, W)`` grayscale or ``(H, W, 3)`` RGB uint8 array as
    a baseline sequential JPEG (Annex K tables, IJG quality scaling) —
    pure numpy + stdlib.  ``subsampling`` picks the luma sampling factors:
    ``"4:4:4"`` (no chroma subsampling), ``"4:2:2"`` (halved chroma
    columns), or ``"4:2:0"`` (halved both ways — the dominant web layout);
    chroma planes are box-filter downsampled.  ``restart_interval=R``
    emits a DRI segment and an RSTn marker (byte-aligned, DC predictors
    reset) after every R MCUs — the layout most camera/web encoders
    produce.  ``progressive=True`` writes an SOF2 multi-scan file using
    libjpeg's standard progression script (DC first at Al=1, spectral
    AC bands, then DC and AC refinement scans) — every T.81 Annex G
    scan kind appears, so a decode roundtrip exercises the full
    progressive machinery."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {px.shape}")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(
            f"unsupported subsampling {subsampling!r} "
            f"(one of {sorted(_SUBSAMPLING)})"
        )
    if progressive and restart_interval:
        raise ValueError(
            "restart intervals with progressive encoding are not supported"
        )
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    q_luma, q_chroma = _quality_tables(quality)

    if gray:
        planes = [px.astype(np.float64)]
        factors = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        planes = [ycc[..., i] for i in range(3)]
        factors = [_SUBSAMPLING[subsampling], (1, 1), (1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    comps = []  # per component: zigzagged quantized block grid (bh, bw, 64)
    for ci, (plane, (hi, vi)) in enumerate(zip(planes, factors)):
        fy, fx = vmax // vi, hmax // hi
        if (fy, fx) != (1, 1):
            ch, cw = -(-h // fy), -(-w // fx)
            p = np.pad(
                plane, ((0, ch * fy - h), (0, cw * fx - w)), mode="edge"
            )
            plane = p.reshape(ch, fy, cw, fx).mean(axis=(1, 3))
        bh_i, bw_i = mcy * vi, mcx * hi
        p = np.pad(
            plane,
            (
                (0, bh_i * 8 - plane.shape[0]),
                (0, bw_i * 8 - plane.shape[1]),
            ),
            mode="edge",
        ) - 128.0
        blocks = (
            p.reshape(bh_i, 8, bw_i, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _DCT_M @ blocks @ _DCT_M.T
        qt = q_luma if ci == 0 else q_chroma
        qc = np.round(coef / qt).astype(np.int32)
        comps.append(qc.reshape(-1, 64)[:, _ZIGZAG].reshape(bh_i, bw_i, 64))

    # -- markers -------------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    out += seg(0xFFDB, bytes([0]) + bytes(q_luma.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xFFDB, bytes([1]) + bytes(q_chroma.reshape(-1)[_ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    if progressive:
        # flat 9-bit tables for both classes (see _FLAT_BITS above)
        for tclass in (0, 1):
            out += seg(
                0xFFC4,
                bytes([(tclass << 4) | 0])
                + bytes(_FLAT_BITS)
                + bytes(_FLAT_VALUES),
            )
        out += _encode_progressive_scans(comps, factors, mcx, mcy, h, w, seg)
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    for tclass, tid, (bits, values) in (
        (0, 0, _DC_LUMA),
        (1, 0, _AC_LUMA),
        *(() if gray else ((0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA))),
    ):
        out += seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    # entropy encode: per MCU, each component contributes its h×v blocks
    bw = _BitWriter()
    prev_dc = [0] * len(comps)
    mcu_i = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                prev_dc = [0] * len(comps)
            mcu_i += 1
            for ci, grid in enumerate(comps):
                hi, vi = factors[ci]
                enc_dc = _ENC_DC_L if ci == 0 else _ENC_DC_C
                enc_ac = _ENC_AC_L if ci == 0 else _ENC_AC_C
                for v in range(vi):
                    for hh in range(hi):
                        prev_dc[ci] = _encode_block(
                            bw,
                            grid[my * vi + v, mx * hi + hh],
                            prev_dc[ci],
                            enc_dc,
                            enc_ac,
                        )
    bw.flush()

    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_progressive_scans(comps, factors, mcx, mcy, h, w, seg) -> bytes:
    """Emit the standard libjpeg progression script as SOS segments +
    entropy data: interleaved DC first (Al=1), per-component spectral AC
    first scans, an AC successive-approximation refinement for luma, a
    DC refinement, and final AC refinements to full precision."""
    ncomp = len(comps)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    if ncomp == 1:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
        ]
    out = bytearray()
    for comp_ids, ss, se, ah, al in script:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            # flat tables live at id 0 for both classes
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)
        bw = _BitWriter()
        if ss == 0 and ah == 0:  # DC initial (interleaved MCU order)
            prev = [0] * ncomp
            for my in range(mcy):
                for mx in range(mcx):
                    for ci in comp_ids:
                        hi, vi = factors[ci]
                        for v in range(vi):
                            for hh in range(hi):
                                dc = int(comps[ci][my * vi + v, mx * hi + hh][0]) >> al
                                diff = dc - prev[ci]
                                prev[ci] = dc
                                size = _category(diff)
                                code, length = _ENC_FLAT[size]
                                bw.write(code, length)
                                if size:
                                    bw.write(
                                        diff if diff > 0 else diff + (1 << size) - 1,
                                        size,
                                    )
        elif ss == 0:  # DC refinement: one raw bit per block, MCU order
            for my in range(mcy):
                for mx in range(mcx):
                    for ci in comp_ids:
                        hi, vi = factors[ci]
                        for v in range(vi):
                            for hh in range(hi):
                                dc = int(comps[ci][my * vi + v, mx * hi + hh][0])
                                bw.write((dc >> al) & 1, 1)
        else:  # AC scan, single component, non-interleaved block order
            ci = comp_ids[0]
            hi, vi = factors[ci]
            bh_n = -(-(-(-h * vi // vmax)) // 8)
            bw_n = -(-(-(-w * hi // hmax)) // 8)
            eobrun = 0
            be_bits: list[int] = []
            for by in range(bh_n):
                for bx in range(bw_n):
                    blk = comps[ci][by, bx]
                    if ah == 0:
                        eobrun = _emit_ac_first_block(
                            bw, blk, ss, se, al, _ENC_FLAT, eobrun
                        )
                    else:
                        eobrun = _emit_ac_refine_block(
                            bw, blk, ss, se, al, _ENC_FLAT, eobrun, be_bits
                        )
            _flush_eobrun(bw, _ENC_FLAT, eobrun, be_bits)
        bw.flush()
        out += bw.out
    return bytes(out)


# -- decoder -----------------------------------------------------------------


def _refine_nonzero(reader: _BitReader, blk: np.ndarray, k: int, se: int, p1: int, m1: int) -> None:
    """T.81 §G.2 AC refinement tail: append a correction bit to every
    already-nonzero coefficient in ``blk[k..se]``."""
    while k <= se:
        c = int(blk[k])
        if c:
            if reader.read_bit() and not (c & p1):
                blk[k] = c + (p1 if c > 0 else m1)
        k += 1


def _decode_ac_first(reader, blk, ss, se, al, ac_t, eobrun: int) -> int:
    """Progressive AC initial scan for one block (T.81 §G.2.2 /
    IJG decode_mcu_AC_first); returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of end-of-band blocks
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("malformed JPEG payload: AC index out of range")
        blk[k] = _receive_extend(reader, s) << al
        k += 1
    return 0


def _decode_ac_refine(reader, blk, ss, se, al, ac_t, eobrun: int) -> int:
    """Progressive AC refinement scan for one block (T.81 §G.2.3 /
    IJG decode_mcu_AC_refine); returns the updated EOB run."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            s_val = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "malformed JPEG payload: refinement size != 1"
                    )
                s_val = p1 if reader.read_bit() else m1
            elif r < 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            # advance over r zero-history positions, appending correction
            # bits to already-nonzero coefficients passed on the way
            while k <= se:
                c = int(blk[k])
                if c:
                    if reader.read_bit() and not (c & p1):
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                blk[k] = s_val
            k += 1
    if eobrun > 0:
        _refine_nonzero(reader, blk, k, se, p1, m1)
        eobrun -= 1
    return eobrun


def _decode_scan(
    reader: _BitReader,
    grids: list,
    comps: list,
    scan_spec: tuple,
    htables: dict,
    h: int,
    w: int,
    hmax: int,
    vmax: int,
    mcx: int,
    mcy: int,
    restart_interval: int,
    progressive: bool,
) -> None:
    """Decode one entropy-coded scan into the coefficient grids.

    Handles every T.81 scan shape: baseline full-band (Ss=0, Se=63,
    interleaved or single-component), progressive DC initial/refinement
    (interleaved or not), and progressive AC initial/refinement (always
    single-component).  Restart markers reset the DC predictors and the
    EOB run."""
    scan_comps, ss, se, ah, al = scan_spec
    members = []  # (comp index, dc table, ac table)
    for cid, dc_id, ac_id in scan_comps:
        ci = next((i for i, c in enumerate(comps) if c[0] == cid), None)
        if ci is None:
            raise ValueError("malformed JPEG payload: unknown scan component")
        members.append((ci, htables.get((0, dc_id)), htables.get((1, ac_id))))
    if progressive:
        if ss == 0:
            if se != 0:
                raise ValueError("malformed JPEG payload: DC scan with Se>0")
            if ah == 0 and any(m[1] is None for m in members):
                raise ValueError("malformed JPEG payload: Huffman tables missing")
        else:
            if len(members) != 1:
                raise ValueError(
                    "malformed JPEG payload: interleaved progressive AC scan"
                )
            if se > 63 or ss > se or members[0][2] is None:
                raise ValueError("malformed JPEG payload: bad AC scan band")
    elif any(m[1] is None or m[2] is None for m in members):
        raise ValueError("malformed JPEG payload: Huffman tables missing")

    def units():
        """Restart units: one MCU (interleaved) or one block (single)."""
        if len(members) > 1:
            for my in range(mcy):
                for mx in range(mcx):
                    mcu = []
                    for ci, dc_t, ac_t in members:
                        _, hi, vi, _ = comps[ci]
                        for v in range(vi):
                            for hh in range(hi):
                                mcu.append(
                                    (
                                        ci,
                                        dc_t,
                                        ac_t,
                                        grids[ci][my * vi + v, mx * hi + hh],
                                    )
                                )
                    yield mcu
        else:
            ci, dc_t, ac_t = members[0]
            _, hi, vi, _ = comps[ci]
            # non-interleaved scans cover the component's OWN block grid
            # (ceil of its true resolution), not the MCU-padded grid
            bh_n = -(-(-(-h * vi // vmax)) // 8)
            bw_n = -(-(-(-w * hi // hmax)) // 8)
            for by in range(bh_n):
                for bx in range(bw_n):
                    yield [(ci, dc_t, ac_t, grids[ci][by, bx])]

    prev_dc = [0] * len(comps)
    eobrun = 0
    unit_i = 0
    rst = 0
    for unit in units():
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            reader.sync_restart(rst)
            rst += 1
            prev_dc = [0] * len(comps)
            eobrun = 0
        unit_i += 1
        for ci, dc_t, ac_t, blk in unit:
            if not progressive:
                size = reader.read_symbol(dc_t)
                prev_dc[ci] += _receive_extend(reader, size)
                blk[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(ac_t)
                    run, size = rs >> 4, rs & 0x0F
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError(
                            "malformed JPEG payload: AC index out of range"
                        )
                    blk[k] = _receive_extend(reader, size)
                    k += 1
            elif ss == 0:
                if ah == 0:  # DC initial: DPCM in the point-transformed domain
                    size = reader.read_symbol(dc_t)
                    prev_dc[ci] += _receive_extend(reader, size)
                    blk[0] = prev_dc[ci] << al
                elif reader.read_bit():  # DC refinement: one bit per block
                    blk[0] |= 1 << al
            elif ah == 0:
                eobrun = _decode_ac_first(reader, blk, ss, se, al, ac_t, eobrun)
            else:
                eobrun = _decode_ac_refine(reader, blk, ss, se, al, ac_t, eobrun)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential OR progressive JPEG (grayscale or
    color at any integer sampling-factor layout — 4:4:4, 4:2:2, 4:2:0,
    ...) into an ``(H, W, 3)`` uint8 RGB array — pure numpy + stdlib;
    subsampled chroma is nearest-neighbor upsampled.  Progressive images
    (SOF2) run the full multi-scan reconstruction: spectral selection
    and successive approximation, interleaved/non-interleaved DC scans,
    EOB-run decoding, and AC refinement per T.81 Annex G.  Arithmetic
    coding, hierarchical mode, and non-8-bit precision raise named
    ``NotImplementedError``s."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise NotImplementedError(
            "not a JPEG payload; use decode_image for format dispatch"
        )
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[list, list]] = {}
    sof = None
    progressive = False
    restart_interval = 0
    grids = None
    decoded_scans = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("malformed JPEG payload: expected marker")
        marker = struct.unpack_from(">H", b, pos)[0]
        if marker == 0xFFD9:  # EOI
            break
        if marker in (0xFFC6, 0xFFCA, 0xFFCE, 0xFFC9, 0xFFCB, 0xFFCD, 0xFFCF):
            raise NotImplementedError(
                "arithmetic-coded JPEG is not supported"
            )
        if marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC7):
            raise NotImplementedError(
                "only baseline sequential and progressive DCT JPEG is "
                "supported"
            )
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        body = b[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("malformed JPEG payload: truncated segment")
        if marker == 0xFFDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit DQT is not supported")
                t = np.frombuffer(body, dtype=np.uint8, count=64, offset=o + 1)
                z = np.zeros(64, dtype=np.int32)
                z[_ZIGZAG] = t
                qtables[tid] = z.reshape(8, 8)
                o += 65
        elif marker in (0xFFC0, 0xFFC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xFFC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision is supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"malformed JPEG payload: sampling factors {hi}x{vi}"
                    )
                comps.append((cid, hi, vi, tq))
            hm = max(c[1] for c in comps)
            vm = max(c[2] for c in comps)
            if any(hm % c[1] or vm % c[2] for c in comps):
                raise NotImplementedError(
                    "non-integer sampling-factor ratios are not supported"
                )
            sof = (h, w, comps)
        elif marker == 0xFFC4:  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                tclass, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                values = list(body[o + 17 : o + 17 + nv])
                _, dec = _build_code_tables(bits, values)
                htables[(tclass, tid)] = dec
                o += 17 + nv
        elif marker == 0xFFDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:  # SOS — decode this scan's entropy data
            if sof is None:
                raise ValueError("malformed JPEG payload: SOS before SOF")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("malformed JPEG payload: truncated SOS")
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            h, w, comps = sof
            if h == 0 or w == 0:
                raise ValueError(f"malformed JPEG payload: h={h}, w={w}")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            if grids is None:
                # (bh, bw, 64) zigzag coefficient grid per component,
                # MCU-padded; progressive scans accumulate into it
                grids = [
                    np.zeros((mcy * vi, mcx * hi, 64), dtype=np.int32)
                    for _, hi, vi, _ in comps
                ]
            reader = _BitReader(b, pos + 2 + ln)
            _decode_scan(
                reader,
                grids,
                comps,
                (scan_comps, ss, se, ah, al),
                htables,
                h,
                w,
                hmax,
                vmax,
                mcx,
                mcy,
                restart_interval,
                progressive,
            )
            decoded_scans += 1
            pos = reader.pos
            continue
        pos += 2 + ln
    if sof is None or grids is None or decoded_scans == 0:
        raise ValueError("malformed JPEG payload: missing SOF/SOS")
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for _, _, _, tq in comps:
        if tq not in qtables:
            raise ValueError("malformed JPEG payload: component tables missing")

    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        bh_i, bw_i = mcy * vi, mcx * hi
        zzc = grids[ci].reshape(-1, 64)
        coef = (zzc[:, _UNZIGZAG] * qtables[tq].reshape(-1)).reshape(-1, 8, 8)
        blocks = _DCT_M.T @ coef.astype(np.float64) @ _DCT_M
        plane = (
            blocks.reshape(bh_i, bw_i, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_i * 8, bw_i * 8)
        )
        # crop to the component's own resolution, then nearest-neighbor
        # upsample back to full resolution
        ch_i, cw_i = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = plane[:ch_i, :cw_i]
        fy, fx = vmax // vi, hmax // hi
        if (fy, fx) != (1, 1):
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:h, :w] + 128.0)
    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    ycc = np.stack(planes, axis=-1)
    return np.ascontiguousarray(_ycbcr_to_rgb(ycc))
