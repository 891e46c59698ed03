"""FLAC codec (subset) in pure numpy + stdlib — no media libraries.

Real compressed audio for the multimodal layer: the FLAC bitstream's
classic core — STREAMINFO metadata, frame headers with UTF-8-style coded
numbers and CRC-8, subframes (CONSTANT, VERBATIM, FIXED orders 0–4, and
LPC on decode), Rice-coded residuals with partitioning and the escape
code, stereo decorrelation (left/side, right/side, mid/side), wasted
bits, and frame CRC-16.  The encoder targets 8/16-bit mono/stereo with
FIXED predictors + Rice residuals (a true compressor — typical synthetic
signals shrink well below 1×) and is the fixture generator; the decoder
additionally handles LPC subframes and Rice partitions so real-world
fixed-blocksize FLAC files decode too.

FLAC is lossless: decode(encode(x)) == x exactly, which is what the
``mm_flac_decode`` driver oracle pins.  Channels: 1-8 independent on
both paths (the stereo-decorrelated left/right/mid-side assignments
decode too).  Unsupported: variable blocking strategy, bps other than
8/16 (encode) / 4–24 (decode).
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) if crc & 0x8000 else (crc << 1)
            ) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self.out.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    """MSB-first accumulator reader — a few int ops per call, with a
    fast leading-zero ``read_unary`` (the Rice-decode hot path)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos  # next UNREAD byte of the source
        self._acc = 0  # buffered bits, next bit at the top
        self._n = 0

    def _feed(self) -> None:
        if self.byte >= len(self.data):
            raise ValueError("malformed FLAC payload: bitstream ran out")
        self._acc = (self._acc << 8) | self.data[self.byte]
        self.byte += 1
        self._n += 8

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            self._feed()
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self._n == 0:
                self._feed()
            if self._acc == 0:  # all buffered bits are zeros
                q += self._n
                self._n = 0
                continue
            lead = self._n - self._acc.bit_length()
            q += lead
            self._n -= lead + 1  # consume the zeros and the one
            self._acc &= (1 << self._n) - 1
            return q

    def align(self) -> None:
        drop = self._n % 8
        if drop:
            self._n -= drop
            self._acc &= (1 << self._n) - 1

    def tell(self) -> int:
        """Logical byte position (valid when byte-aligned)."""
        return self.byte - self._n // 8


def _utf8_coded(value: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if value < 0x80:
        return bytes([value])
    out = []
    nbytes = 2
    while value >= (1 << (5 * nbytes + 6 - nbytes)) and nbytes < 7:
        nbytes += 1
    # leading byte: nbytes ones, a zero, then the top bits
    shift = 6 * (nbytes - 1)
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | (value >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((value >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("malformed FLAC payload: bad coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        nxt = r.read(8)
        if nxt & 0xC0 != 0x80:
            raise ValueError("malformed FLAC payload: bad coded number")
        v = (v << 6) | (nxt & 0x3F)
    return v


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res.astype(np.int64) << 1, ((-res.astype(np.int64)) << 1) - 1)


def _rice_encode(bw: _BitWriter, res: np.ndarray, param: int) -> None:
    """Rice-code a residual block straight into the writer's accumulator
    (hot loop — inlined int ops instead of per-value method calls)."""
    u = _zigzag(res)
    acc, n, out = bw._acc, bw._n, bw.out
    mask = (1 << param) - 1
    for v in u.tolist():
        q = v >> param
        acc = (acc << (q + 1)) | 1  # q zeros then a one
        n += q + 1
        if param:
            acc = (acc << param) | (v & mask)
            n += param
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
        acc &= (1 << n) - 1
    bw._acc, bw._n = acc, n


def _rice_decode(r: _BitReader, n: int, param: int) -> np.ndarray:
    """Decode ``n`` Rice-coded residuals (the per-sample hot loop —
    reader state pulled into locals, one pass, no method calls)."""
    data, byte, acc, nb = r.data, r.byte, r._acc, r._n
    n_data = len(data)
    mask = (1 << param) - 1
    out = [0] * n
    try:
        for i in range(n):
            q = 0
            while True:
                if nb == 0:
                    acc = (acc << 8) | data[byte]
                    byte += 1
                    nb = 8
                if acc == 0:
                    q += nb
                    nb = 0
                    continue
                lead = nb - acc.bit_length()
                q += lead
                nb -= lead + 1
                acc &= (1 << nb) - 1
                break
            if param:
                while nb < param:
                    acc = (acc << 8) | data[byte]
                    byte += 1
                    nb += 8
                nb -= param
                v = (q << param) | ((acc >> nb) & mask)
                acc &= (1 << nb) - 1
            else:
                v = q
            out[i] = (v >> 1) ^ -(v & 1)  # un-zigzag
    except IndexError:
        raise ValueError("malformed FLAC payload: bitstream ran out") from None
    r.byte, r._acc, r._n = byte, acc, nb
    return np.array(out, dtype=np.int64)


def _best_rice_param(res: np.ndarray) -> int:
    u = _zigzag(res)
    mean = float(u.mean()) if u.size else 0.0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    *,
    bits_per_sample: int = 16,
    block_size: int = 4096,
) -> bytes:
    """Encode ``(N,)`` mono or ``(N, C)`` multichannel (C ≤ 8) integer
    samples as a fixed-blocksize FLAC stream: per-block best FIXED
    predictor (order 0–4 by absolute-residual sum), Rice-coded residuals
    (single partition), independent channels, correct CRC-8/CRC-16."""
    if bits_per_sample not in (8, 16):
        raise ValueError("encode_flac supports 8- or 16-bit samples")
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or not 1 <= s.shape[1] <= 8 or s.shape[0] == 0:
        raise ValueError(f"expected (N,) or (N,1..8) samples, got {s.shape}")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError(f"samples exceed {bits_per_sample}-bit range")
    n, ch = s.shape

    out = bytearray(FLAC_MAGIC)
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + bytes(16)  # MD5 unset (zeros, spec-legal)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = blk.shape[0]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)  # blocksize: 16-bit field at header end
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(ch - 1, 4)  # independent channels
        hdr.write(0b100 if bits_per_sample == 16 else 0b001, 3)
        hdr.write(0, 1)  # reserved
        header = bytes(hdr.out) + _utf8_coded(fi) + struct.pack(">H", bs - 1)
        header += bytes([_crc8(header)])
        fw = _BitWriter()
        fw.out += header
        for c in range(ch):
            x = blk[:, c]
            # pick the fixed order with the smallest |residual| sum
            best_order, best_res, best_cost = 0, x, np.abs(x).sum()
            for order in range(1, 5):
                if bs <= order:
                    break
                res = x.copy()
                for _ in range(order):
                    res = np.diff(res)
                cost = np.abs(res).sum() + order * bits_per_sample
                if cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            if bs and np.all(x == x[0]):
                fw.write(0, 1)
                fw.write(0b000000, 6)  # CONSTANT
                fw.write(0, 1)
                fw.write(int(x[0]), bits_per_sample)
                continue
            fw.write(0, 1)
            fw.write(0b001000 | best_order, 6)  # FIXED
            fw.write(0, 1)  # no wasted bits
            for w in x[:best_order].tolist():
                fw.write(int(w), bits_per_sample)
            res = best_res
            param = _best_rice_param(res)
            fw.write(0b00, 2)  # 4-bit rice params
            fw.write(0, 4)  # partition order 0
            fw.write(param, 4)
            _rice_encode(fw, res, param)
        fw.align()
        frame = bytes(fw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a fixed-blocksize FLAC stream into ``((N, CH) int32
    samples, sample_rate)`` — CONSTANT/VERBATIM/FIXED/LPC subframes,
    Rice partitions with escape codes, stereo decorrelation, wasted
    bits; frame CRC-16 verified."""
    b = bytes(payload)
    if b[:4] != FLAC_MAGIC:
        raise NotImplementedError(
            "not a FLAC payload; other compressed audio needs a codec "
            "library"
        )
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("malformed FLAC payload: truncated metadata")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("malformed FLAC payload: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)
    si.read(24)
    si.read(24)
    rate = si.read(20)
    n_ch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if not 4 <= bps <= 24:
        raise NotImplementedError(f"unsupported FLAC bit depth {bps}")

    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    decoded = 0
    while decoded < total and pos + 4 <= len(b):
        frame_start = pos
        r = _BitReader(b, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("malformed FLAC payload: lost frame sync")
        r.read(1)
        blocking = r.read(1)
        if blocking:
            raise NotImplementedError(
                "variable-blocksize FLAC is not supported"
            )
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_asgn = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _frame_no = _read_utf8_coded(r)
        bs_table = {
            1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
            8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
            13: 8192, 14: 16384, 15: 32768,
        }
        if bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        elif bs_code in bs_table:
            bs = bs_table[bs_code]
        else:
            raise ValueError("malformed FLAC payload: bad blocksize code")
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        ss_table = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
        if ss_code not in ss_table:
            raise ValueError("malformed FLAC payload: bad sample size code")
        fbps = ss_table[ss_code]
        hdr_crc = r.read(8)
        if _crc8(b[frame_start : r.tell() - 1]) != hdr_crc:
            raise ValueError("malformed FLAC payload: frame header CRC")

        if ch_asgn < 8:
            n_sub = ch_asgn + 1
            sub_bps = [fbps] * n_sub
        elif ch_asgn in (8, 9, 10):
            n_sub = 2
            # the SIDE channel carries one extra bit
            side_idx = 1 if ch_asgn in (8, 10) else 0
            sub_bps = [fbps + (1 if i == side_idx else 0) for i in range(2)]
        else:
            raise ValueError("malformed FLAC payload: bad channel assignment")
        if (ch_asgn < 8 and n_sub != n_ch) or (ch_asgn >= 8 and n_ch != 2):
            raise ValueError("malformed FLAC payload: channel count mismatch")

        subs = []
        for c in range(n_sub):
            if r.read(1):
                raise ValueError("malformed FLAC payload: subframe pad bit")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                wasted = 1 + r.read_unary()
            eff = sub_bps[c] - wasted
            if stype == 0:  # CONSTANT
                x = np.full(bs, r.read_signed(eff), dtype=np.int64)
            elif stype == 1:  # VERBATIM
                x = np.array(
                    [r.read_signed(eff) for _ in range(bs)], dtype=np.int64
                )
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                x = _decode_predicted(
                    r, bs, eff, order, _FIXED_COEFFS[order], 0
                )
            elif stype >= 32:  # LPC, order = low 5 bits + 1
                order = (stype & 0x1F) + 1
                warm = [r.read_signed(eff) for _ in range(order)]
                prec = r.read(4) + 1
                if prec == 16:
                    raise ValueError("malformed FLAC payload: LPC precision")
                shift = r.read_signed(5)
                coeffs = [r.read_signed(prec) for _ in range(order)]
                res = _decode_residual(r, bs, order)
                x = np.empty(bs, dtype=np.int64)
                x[:order] = warm
                for i in range(order, bs):
                    pred = 0
                    for k in range(order):
                        pred += coeffs[k] * int(x[i - 1 - k])
                    x[i] = res[i - order] + (pred >> shift)
            else:
                raise ValueError(
                    f"malformed FLAC payload: subframe type {stype}"
                )
            subs.append(x << wasted)
        r.align()
        data_end = r.tell()
        (frame_crc,) = struct.unpack_from(">H", b, data_end)
        if _crc16(b[frame_start:data_end]) != frame_crc:
            raise ValueError("malformed FLAC payload: frame CRC")
        pos = data_end + 2

        # stereo decorrelation
        if ch_asgn < 8:
            chs = subs
        elif ch_asgn == 8:  # left/side
            left, side = subs
            chs = [left, left - side]
        elif ch_asgn == 9:  # right/side
            side, right = subs
            chs = [right + side, right]
        else:  # mid/side
            mid, side = subs
            left = mid * 2 + (side & 1)
            chs = [(left + side) >> 1, (left - side) >> 1]
        for c in range(n_ch):
            chans[c].append(chs[c])
        decoded += bs

    if decoded < total:
        raise ValueError(
            f"malformed FLAC payload: {decoded}/{total} samples decoded"
        )
    stacked = np.stack(
        [np.concatenate(parts)[:total] for parts in chans], axis=1
    )
    return stacked.astype(np.int32), int(rate)


def _decode_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    """Rice-coded residual section: partitions + escape codes."""
    method = r.read(2)
    if method > 1:
        raise ValueError("malformed FLAC payload: residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("malformed FLAC payload: partition size")
    out = []
    for p in range(nparts):
        count = (bs >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("malformed FLAC payload: partition underflow")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.append(
                np.array(
                    [r.read_signed(raw) if raw else 0 for _ in range(count)],
                    dtype=np.int64,
                )
            )
        else:
            out.append(_rice_decode(r, count, param))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def _decode_predicted(
    r: _BitReader, bs: int, eff: int, order: int, coeffs: list, shift: int
) -> np.ndarray:
    """FIXED subframe body: warmup + residual + reconstruction.

    A fixed predictor of order k means residual = diff^k(signal), so
    reconstruction is k vectorized cumsums, each seeded with the
    corresponding finite difference of the warmup samples — no
    per-sample Python loop."""
    warm = np.array(
        [r.read_signed(eff) for _ in range(order)], dtype=np.int64
    )
    res = _decode_residual(r, bs, order)
    if order == 0:
        return res
    cur = res
    for j in range(order - 1, -1, -1):
        cur = np.concatenate([np.diff(warm, n=j)[:1], cur]).cumsum()
    # cur now has length bs and starts at warm[0]
    return cur
