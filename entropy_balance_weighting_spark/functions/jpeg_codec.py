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


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``(H, W)`` grayscale or ``(H, W, 3)`` RGB uint8 array as
    a baseline sequential JPEG (Annex K tables, IJG quality scaling) —
    pure numpy + stdlib.  ``subsampling`` picks the luma sampling factors:
    ``"4:4:4"`` (no chroma subsampling), ``"4:2:2"`` (halved chroma
    columns), or ``"4:2:0"`` (halved both ways — the dominant web layout);
    chroma planes are box-filter downsampled.  ``restart_interval=R``
    emits a DRI segment and an RSTn marker (byte-aligned, DC predictors
    reset) after every R MCUs — the layout most camera/web encoders
    produce."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {px.shape}")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(
            f"unsupported subsampling {subsampling!r} "
            f"(one of {sorted(_SUBSAMPLING)})"
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
    out += seg(0xFFC0, sof)
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
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (grayscale or color at any
    integer sampling-factor layout — 4:4:4, 4:2:2, 4:2:0, ...) into an
    ``(H, W, 3)`` uint8 RGB array — pure numpy + stdlib; subsampled
    chroma is nearest-neighbor upsampled.  Progressive coding, restart
    intervals, and non-8-bit precision raise named
    ``NotImplementedError``s."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise NotImplementedError(
            "not a JPEG payload; use decode_image for format dispatch"
        )
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("malformed JPEG payload: expected marker")
        marker = struct.unpack_from(">H", b, pos)[0]
        if marker in (0xFFC2, 0xFFC6, 0xFFCA, 0xFFCE):
            raise NotImplementedError("progressive JPEG is not supported")
        if marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC7, 0xFFC9, 0xFFCB, 0xFFCD, 0xFFCF):
            raise NotImplementedError(
                "only baseline sequential DCT JPEG is supported"
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
        elif marker == 0xFFC0:  # SOF0 baseline
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
        elif marker == 0xFFDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan_comps is None:
        raise ValueError("malformed JPEG payload: missing SOF/SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError(f"malformed JPEG payload: h={h}, w={w}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    reader = _BitReader(b, pos)
    grids = []  # per component: (bh, bw, 64) zigzag coefficient grid
    comp_tables = []
    for cid, hi, vi, tq in comps:
        sc = next((s for s in scan_comps if s[0] == cid), None)
        if sc is None or tq not in qtables:
            raise ValueError("malformed JPEG payload: component tables missing")
        dc_t = htables.get((0, sc[1]))
        ac_t = htables.get((1, sc[2]))
        if dc_t is None or ac_t is None:
            raise ValueError("malformed JPEG payload: Huffman tables missing")
        comp_tables.append((dc_t, ac_t))
        grids.append(np.zeros((mcy * vi, mcx * hi, 64), dtype=np.int32))
    prev_dc = [0] * len(comps)
    mcu_i = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.sync_restart(rst)
                rst += 1
                prev_dc = [0] * len(comps)
            mcu_i += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_t, ac_t = comp_tables[ci]
                for v in range(vi):
                    for hh in range(hi):
                        blk = grids[ci][my * vi + v, mx * hi + hh]
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
