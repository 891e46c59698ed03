"""Baseline TIFF codec in pure struct/numpy — no media libraries.

Another REAL decoder for the multimodal layer: strip-based baseline TIFF
(8-bit grayscale / RGB / palette) with the classic compressions —
none (1), LZW (5), Adobe Deflate (8, legacy 32946 accepted; stdlib
zlib), and PackBits (32773) — in both byte orders ("II"
little-endian, "MM" big-endian).  TIFF LZW is NOT GIF LZW: codes pack
MSB-first and the code width bumps one code EARLY (when the next free
entry reaches ``2^w - 1``, per the TIFF 6.0 spec and libtiff), so the
two variants get separate implementations; both are true compressors.

Decode dataflow: header + IFD walk (stdlib ``struct``) → per-strip or
per-tile decompression (LZW serial as in the spec; PackBits is a tiny
run-length loop; tiled organization tags 322-325 with zero-padded edge
tiles per TIFF 6.0 §15) → horizontal-predictor inversion (tag 317 = 2,
per-row per-channel mod-256 cumsum; tag 317 = 3 on float32 samples:
the Adobe TechNote 3 byte-plane scheme, ``_fp_unpredict_rows``) →
reshape/paste to ``(H, W, samples)`` → photometric mapping (WhiteIsZero
inversion, gray replication, 16-bit ColorMap gather — all numpy).
32-bit IEEE-float samples (SampleFormat 3, the scientific/HDR layout)
decode to float32 (r9); remaining unsupported shapes (other bit depths,
other compressions) raise named errors.

Lossless, so tests and the ``mm_tiff_decode`` driver oracle assert
EXACT pixel equality across all compressions and both byte
orders."""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_CLEAR = 256
_EOI = 257
_FIRST = 258
_BITS_MAX = 12


# -- TIFF LZW (MSB-first, early change) --------------------------------------


def lzw_encode_tiff(data: bytes) -> bytes:
    """Compress bytes with TIFF 6.0 LZW: MSB-first packing, 9→12-bit
    codes with the EARLY width change, CLEAR emitted when the table
    reaches 4094 entries."""
    out = bytearray()
    acc = 0
    nbits_acc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits_acc
        acc = (acc << width) | code
        nbits_acc += width
        while nbits_acc >= 8:
            out.append((acc >> (nbits_acc - 8)) & 0xFF)
            nbits_acc -= 8

    def fresh() -> tuple[dict, int, int]:
        return {(i,): i for i in range(256)}, _FIRST, 9

    table, free_ent, width = fresh()
    emit(_CLEAR, width)
    buf: tuple = ()
    for px in data:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = free_ent
        free_ent += 1
        # EARLY change: the encoder widens as soon as the next free
        # entry needs the larger width MINUS ONE (TIFF 6.0 §13)
        if free_ent >= (1 << width) and width < _BITS_MAX:
            width += 1
        if free_ent >= (1 << _BITS_MAX) - 2:  # 4094
            emit(_CLEAR, width)
            table, free_ent, width = fresh()
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(_EOI, width)
    if nbits_acc:
        out.append((acc << (8 - nbits_acc)) & 0xFF)
    return bytes(out)


def lzw_decode_tiff(data: bytes, n_out: int) -> bytes:
    """Decompress a TIFF LZW strip into exactly ``n_out`` bytes —
    (prefix, last) table with per-segment materialization (correct
    across CLEAR resets), mirroring :func:`lzw_encode_tiff`'s early
    width change one table-entry sooner (the decoder lags one add)."""
    # MSB-first accumulator code reader (a few int ops per code); plain
    # Python lists for the table — scalar access beats numpy indexing in
    # this per-code loop.
    acc = 0
    nbits = 0
    byte_pos = 0
    n_data = len(data)
    size = 1 << _BITS_MAX
    prefix = [-1] * size
    last = list(range(256)) + [0] * (size - 256)
    length = [1] * 256 + [0] * (size - 256)

    free_ent, width = _FIRST, 9
    out = bytearray(n_out + size)
    out_len = 0
    prev = -1
    while out_len < n_out:
        while nbits < width:
            if byte_pos >= n_data:
                break
            acc = (acc << 8) | data[byte_pos]
            nbits += 8
            byte_pos += 1
        if nbits < width:
            break
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == _CLEAR:
            free_ent, width = _FIRST, 9
            prev = -1
            continue
        if code == _EOI:
            break
        if prev < 0:
            if code >= 256:
                raise ValueError("malformed TIFF LZW: first code not literal")
            out[out_len] = code
            out_len += 1
            prev = code
            continue
        if code < free_ent:
            entry_first = code
        elif code == free_ent:
            entry_first = prev  # KwKwK
        else:
            raise ValueError(
                f"malformed TIFF LZW: code {code} beyond table ({free_ent})"
            )
        c = entry_first
        while prefix[c] >= 0:
            c = prefix[c]
        first_idx = last[c]
        if free_ent < size:
            prefix[free_ent] = prev
            last[free_ent] = first_idx
            length[free_ent] = length[prev] + 1
            free_ent += 1
            # EARLY change, decoder side: one entry before the table
            # fills the current width (it lags the encoder by one add)
            if free_ent >= (1 << width) - 1 and width < _BITS_MAX:
                width += 1
        seg_len = length[code]
        end = out_len + seg_len
        c = code
        while c >= 0:
            end -= 1
            out[end] = last[c]
            c = prefix[c]
        out_len += seg_len
        prev = code

    if out_len < n_out:
        raise ValueError(
            f"malformed TIFF LZW: strip ended at {out_len}/{n_out} bytes"
        )
    return bytes(out[:n_out])


# -- PackBits (run-length) ----------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE: runs of ≥3 equal bytes become (257-n, byte);
    literals are copied in ≤128-byte groups."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal group: until the next >=3 run or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, n_out: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < n_out:
        n = data[i]
        i += 1
        if n < 128:  # literal copy of n+1 bytes
            chunk = data[i : i + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("malformed PackBits strip: truncated literal")
            out += chunk
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("malformed PackBits strip: truncated run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < n_out:
        raise ValueError(
            f"malformed PackBits strip: {len(out)}/{n_out} bytes"
        )
    return bytes(out[:n_out])


# -- container ----------------------------------------------------------------

_COMPRESSIONS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _predict_rows(block: np.ndarray) -> np.ndarray:
    """Apply the TIFF horizontal predictor (tag 317 = 2) to a
    ``(rows, width, spp)`` block: store each sample as the mod-256 delta
    against the same channel of the previous pixel in the row."""
    d = block.astype(np.int16)
    d[:, 1:, :] -= block[:, :-1, :].astype(np.int16)
    return (d & 0xFF).astype(np.uint8)


def _unpredict_rows(block: np.ndarray) -> np.ndarray:
    """Invert :func:`_predict_rows`: per-row per-channel mod-256 cumsum."""
    return (np.cumsum(block.astype(np.uint32), axis=1) & 0xFF).astype(np.uint8)


def _fp_predict_rows(block: np.ndarray, spp: int) -> bytes:
    """Apply the TIFF floating-point predictor (tag 317 = 3, Adobe
    TechNote 3 / libtiff ``fpDiff``) to a ``(rows, w, spp)`` float32
    block: per row, reorder each sample's big-endian bytes into byte
    PLANES (all MSBs first), then mod-256 horizontal differencing with
    stride = samples-per-pixel."""
    rows, w, _ = block.shape
    wc = w * spp
    be = (
        block.reshape(rows, wc)
        .astype(">f4")
        .view(np.uint8)
        .reshape(rows, wc, 4)
    )
    planes = be.transpose(0, 2, 1).reshape(rows, 4 * wc).astype(np.int16)
    out = planes.copy()
    out[:, spp:] -= planes[:, :-spp]
    return (out & 0xFF).astype(np.uint8).tobytes()


def _fp_unpredict_rows(data: bytes, rows: int, w: int, spp: int) -> np.ndarray:
    """Invert :func:`_fp_predict_rows` (libtiff ``fpAcc``): stride-spp
    mod-256 cumsum per row, then reassemble the byte planes into
    big-endian float32 samples → ``(rows, w, spp)`` float32."""
    wc = w * spp
    buf = np.frombuffer(data, np.uint8).reshape(rows, 4 * wc)
    acc = (
        buf.reshape(rows, 4 * w, spp).astype(np.uint32).cumsum(axis=1) & 0xFF
    ).astype(np.uint8)
    planes = acc.reshape(rows, 4, wc).transpose(0, 2, 1)  # (rows, wc, 4)
    return (
        np.ascontiguousarray(planes)
        .reshape(rows, wc * 4)
        .view(">f4")
        .astype(np.float32)
        .reshape(rows, w, spp)
    )


def encode_tiff(
    pixels: np.ndarray,
    *,
    compression: str = "none",
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Encode an ``(H, W)`` grayscale or ``(H, W, 3)`` RGB uint8 array as
    a baseline TIFF — the fixture generator for the decode path (and a
    usable sink).  Layout is strip-based (``rows_per_strip`` defaults to
    the whole image in one strip) unless ``tile=(tw, th)`` selects the
    tiled organization (tags 322-325; the spec requires tile dims to be
    multiples of 16; edge tiles are zero-padded to full size as TIFF 6.0
    §15 prescribes).  ``predictor=True`` writes horizontal-differencing
    (tag 317 = 2) before compression — the layout real LZW TIFFs almost
    always use.

    FLOAT32 input (any floating dtype) writes a 32-bit SampleFormat=3
    TIFF; ``predictor=True`` then selects the FLOATING-POINT predictor
    (tag 317 = 3: big-endian byte planes + stride-spp differencing, the
    Adobe TechNote 3 / libtiff scheme) — the layout scientific/HDR TIFFs
    use."""
    if compression not in _COMPRESSIONS:
        raise ValueError(
            f"compression must be one of {sorted(_COMPRESSIONS)}, "
            f"got {compression!r}"
        )
    arr = np.asarray(pixels)
    is_float = np.issubdtype(arr.dtype, np.floating)
    px = arr.astype(np.float32) if is_float else arr.astype(np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(
            f"expected (H,W) or (H,W,3) {'float32' if is_float else 'uint8'},"
            f" got {px.shape}"
        )
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    px3 = px.reshape(h, w, spp)
    bo = ">" if big_endian else "<"

    def compress(block: np.ndarray) -> bytes:
        if is_float:
            rows_n = block.shape[0]
            data = (
                _fp_predict_rows(block, spp)
                if predictor
                else block.reshape(rows_n, -1).astype(bo + "f4").tobytes()
            )
        else:
            if predictor:
                block = _predict_rows(block)
            data = block.tobytes()
        if compression == "lzw":
            return lzw_encode_tiff(data)
        if compression == "deflate":
            import zlib

            return zlib.compress(data)
        if compression == "packbits":
            return packbits_encode(data)
        return data

    blk_dtype = np.float32 if is_float else np.uint8
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError(
                f"TIFF tile dims must be positive multiples of 16, got {tile}"
            )
        blocks = []
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                t = np.zeros((th, tw, spp), dtype=blk_dtype)
                part = px3[y0 : y0 + th, x0 : x0 + tw]
                t[: part.shape[0], : part.shape[1]] = part
                blocks.append(compress(t))
    else:
        rps = h if rows_per_strip is None else max(1, rows_per_strip)
        blocks = [
            compress(px3[y0 : y0 + rps]) for y0 in range(0, h, rps)
        ]
    n_blocks = len(blocks)

    entries = []  # (tag, type, count, value_or_bytes)

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    data_off_tag = 324 if tile is not None else 273
    entry(256, 3, 1, w)  # ImageWidth SHORT
    entry(257, 3, 1, h)  # ImageLength
    entry(258, 3, spp, [32 if is_float else 8] * spp)  # BitsPerSample
    entry(259, 3, 1, _COMPRESSIONS[compression])
    entry(262, 3, 1, 1 if gray else 2)  # BlackIsZero / RGB
    if tile is None:
        entry(273, 4, n_blocks, None)  # StripOffsets, patched below
    entry(277, 3, 1, spp)  # SamplesPerPixel
    if tile is None:
        entry(278, 3, 1, rps)  # RowsPerStrip
        entry(279, 4, n_blocks, [len(s) for s in blocks])
    if predictor:
        entry(317, 3, 1, 3 if is_float else 2)
    if tile is not None:
        entry(322, 3, 1, tw)  # TileWidth
        entry(323, 3, 1, th)  # TileLength
        entry(324, 4, n_blocks, None)  # TileOffsets, patched below
        entry(325, 4, n_blocks, [len(s) for s in blocks])
    if is_float:
        entry(339, 3, spp, [3] * spp)  # SampleFormat = IEEE float
    strips = blocks

    # layout: header(8) + IFD + out-of-line values + strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    tail = bytearray()  # out-of-line entry values
    tail_off = ifd_off + ifd_size

    def pack_values(typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(bo + fmt, v) for v in values)

    # reserve space for out-of-line values first (two passes)
    serialized = []
    so_reserved_at = None  # offset inside tail for the Strip/TileOffsets block
    for tag, typ, count, value in entries:
        if tag == data_off_tag:
            serialized.append(None)  # placeholder
            if count > 1:
                so_reserved_at = len(tail)
                tail += bytes(4 * count)
            continue
        vals = value if isinstance(value, list) else [value]
        vbytes = pack_values(typ, vals)
        if len(vbytes) <= 4:
            serialized.append(vbytes.ljust(4, b"\x00"))
        else:
            serialized.append(struct.pack(bo + "I", tail_off + len(tail) - 0))
            tail += vbytes
    # strip data begins after tail
    data_off = tail_off + len(tail)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # fill the Strip/TileOffsets entry (and its out-of-line slot if any)
    so_index = next(i for i, e in enumerate(entries) if e[0] == data_off_tag)
    so_bytes = pack_values(4, offsets)
    if len(so_bytes) <= 4:
        serialized[so_index] = so_bytes.ljust(4, b"\x00")
    else:
        tail[so_reserved_at : so_reserved_at + len(so_bytes)] = so_bytes
        serialized[so_index] = struct.pack(bo + "I", tail_off + so_reserved_at)

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", len(entries))
    for (tag, typ, count, _), sv in zip(entries, serialized):
        out += struct.pack(bo + "HHI", tag, typ, count) + sv
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += tail
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a strip- or tile-based baseline 8-bit TIFF (gray / RGB /
    palette; none / LZW / PackBits; optional horizontal predictor; II or
    MM byte order) into an ``(H, W, 3)`` uint8 RGB array — stdlib struct
    + numpy, no media library."""
    b = bytes(payload)
    if b[:4] not in TIFF_MAGICS:
        raise NotImplementedError(
            "not a TIFF payload; use decode_image for format dispatch"
        )
    bo = ">" if b[:2] == b"MM" else "<"
    (ifd_off,) = struct.unpack_from(bo + "I", b, 4)
    if ifd_off + 2 > len(b):
        raise ValueError("malformed TIFF payload: IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", b, ifd_off)
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(b):
            raise ValueError("malformed TIFF payload: truncated IFD")
        tag, typ, count = struct.unpack_from(bo + "HHI", b, off)
        if typ not in type_size:
            continue  # rational/ASCII etc. — not needed here
        total = type_size[typ] * count
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", b, off + 8)
        if voff + total > len(b):
            raise ValueError("malformed TIFF payload: value out of range")
        tags[tag] = list(
            struct.unpack_from(bo + str(count) + type_fmt[typ], b, voff)
        )

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"malformed TIFF payload: missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262, 1)
    spp = one(277, 1)
    rps = one(278, h)
    bits = tags.get(258, [8])
    offsets = tags.get(273)
    counts = tags.get(279)
    tiled = 324 in tags
    sample_format = one(339, 1)
    is_float = sample_format == 3 and all(x == 32 for x in bits)
    if is_float and photo not in (1, 2):
        raise NotImplementedError(
            f"float TIFF supports MinIsBlack/RGB only (photometric={photo})"
        )
    if not is_float and any(x != 8 for x in bits):
        raise NotImplementedError(
            f"only 8-bit uint and 32-bit float TIFF are supported "
            f"(BitsPerSample={bits}, SampleFormat={sample_format})"
        )
    predictor = one(317, 1)
    if predictor not in ((1, 3) if is_float else (1, 2)):
        raise NotImplementedError(
            "only the horizontal predictor on uint8 samples and the "
            "floating-point predictor on float32 samples are supported "
            f"(predictor={predictor}, SampleFormat={sample_format})"
        )
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"only none/LZW/Deflate/PackBits TIFF compression is supported "
            f"(compression={comp})"
        )
    if photo not in (0, 1, 2, 3) or (photo == 2 and spp < 3) or (
        photo in (0, 1, 3) and spp != 1
    ):
        raise NotImplementedError(
            f"unsupported TIFF layout (photometric={photo}, samples={spp})"
        )
    def expand(data: bytes, need: int, what: str) -> bytes:
        if comp == 5:
            return lzw_decode_tiff(data, need)
        if comp in (8, 32946):  # Adobe deflate / legacy deflate
            import zlib

            try:
                out = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(
                    f"malformed TIFF payload: bad deflate {what}"
                ) from exc
            if len(out) < need:
                raise ValueError(f"malformed TIFF payload: short {what}")
            return out[:need]
        if comp == 32773:
            return packbits_decode(data, need)
        if len(data) < need:
            raise ValueError(f"malformed TIFF payload: short {what}")
        return data[:need]

    if tiled:
        tw, th = one(322), one(323)
        offsets, counts = tags.get(324), tags.get(325)
        if tw <= 0 or th <= 0 or not offsets or not counts:
            raise ValueError("malformed TIFF payload: missing tile layout")
        n_x = -(-w // tw)
        n_y = -(-h // th)
        if len(offsets) < n_x * n_y or len(counts) < n_x * n_y:
            raise ValueError("malformed TIFF payload: short tile tables")
        bs = 4 if is_float else 1
        px = np.zeros((h, w, spp), dtype=np.float32 if is_float else np.uint8)
        for ty in range(n_y):
            for tx in range(n_x):
                ti = ty * n_x + tx
                toff, tcnt = offsets[ti], counts[ti]
                tdata = b[toff : toff + tcnt]
                if len(tdata) != tcnt:
                    raise ValueError("malformed TIFF payload: truncated tile")
                data = expand(tdata, th * tw * spp * bs, "tile")
                if is_float:
                    block = (
                        _fp_unpredict_rows(data, th, tw, spp)
                        if predictor == 3
                        else np.frombuffer(data, dtype=bo + "f4")
                        .astype(np.float32)
                        .reshape(th, tw, spp)
                    )
                else:
                    block = np.frombuffer(data, dtype=np.uint8).reshape(
                        th, tw, spp
                    )
                    if predictor == 2:
                        block = _unpredict_rows(block)
                y0, x0 = ty * th, tx * tw
                ch, cw = min(th, h - y0), min(tw, w - x0)
                px[y0 : y0 + ch, x0 : x0 + cw] = block[:ch, :cw]
    else:
        if w <= 0 or h <= 0 or not offsets or not counts:
            raise ValueError("malformed TIFF payload: missing strip layout")
        bs = 4 if is_float else 1
        rowbytes = w * spp * bs
        parts = []
        for si, (soff, scnt) in enumerate(zip(offsets, counts)):
            strip = b[soff : soff + scnt]
            if len(strip) != scnt:
                raise ValueError("malformed TIFF payload: truncated strip")
            rows = min(rps, h - si * rps)
            need = rows * rowbytes
            data = expand(strip, need, "strip")
            if is_float:
                parts.append(
                    _fp_unpredict_rows(data, rows, w, spp)
                    if predictor == 3
                    else np.frombuffer(data, dtype=bo + "f4")
                    .astype(np.float32)
                    .reshape(rows, w, spp)
                )
            else:
                blk = np.frombuffer(data, dtype=np.uint8).reshape(rows, w, spp)
                parts.append(
                    _unpredict_rows(blk) if predictor == 2 else blk
                )
        px = np.concatenate(parts, axis=0)
        if px.shape[0] != h:
            raise ValueError(
                f"malformed TIFF payload: {px.shape[0]} rows, expected {h}"
            )
    if is_float:
        if photo == 2:
            return np.ascontiguousarray(px[:, :, :3])
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    if photo == 2:
        return np.ascontiguousarray(px[:, :, :3])
    if photo == 3:
        cmap = tags.get(320)
        if cmap is None or len(cmap) != 3 * (1 << 8):
            raise ValueError("malformed TIFF payload: missing/short ColorMap")
        cm = (np.asarray(cmap, dtype=np.uint32).reshape(3, 256).T >> 8).astype(
            np.uint8
        )
        return np.ascontiguousarray(cm[px[:, :, 0]])
    g = px[:, :, 0]
    if photo == 0:  # WhiteIsZero
        g = 255 - g
    return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
