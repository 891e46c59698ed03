"""GIF87a/89a codec in pure numpy + stdlib — no media libraries.

The fifth REAL decoder in the multimodal layer (after BMP, PNG, WAV,
JPEG): palette-indexed GIF with full variable-width LZW in both
directions — global and local color tables, the four-pass row
interlace, extension-block skipping (GCE/comment/application), and
255-byte data sub-block framing.  The encoder is a true LZW
compressor (dictionary build, 3→12-bit code growth, 4096-entry CLEAR
reset), not the "emit literals + clear" uncompressed trick, so
roundtrip tests exercise the decoder's real dictionary paths
(including the ``code == next_code`` KwKwK case).

Decode dataflow: header/LSD walk (stdlib ``struct``) → sub-block
concatenation → LZW decode (the one inherently serial stage — the
dictionary is built code-by-code, exactly as in the GIF89a spec
appendix; bit extraction is numpy-batched per code width) → palette
gather (numpy fancy index) → interlace de-permutation (numpy row
scatter).  :func:`decode_gif` reads the FIRST image descriptor (the
still-image contract, "poster frame" semantics);
:func:`decode_gif_frames` decodes full ANIMATIONS — per-frame
compositing at (left, top) offsets into the logical-screen canvas, GCE
transparency, and disposal methods 2/3 — with
:func:`encode_gif_animation` as the fixture generator (NETSCAPE2.0
loop block, per-frame local palettes).

GIF is lossless on palette-indexed data, so tests and the
``mm_gif_decode`` driver oracle assert EXACT pixel equality — a wrong
code-width bump, sub-block seam, or interlace pass shifts pixels and
fails the hash.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# Interlace passes: (row offset, row step) in pass order (GIF89a §20)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12  # LZW codes never exceed 12 bits (4096 entries)


def _interlace_order(h: int) -> np.ndarray:
    """Output-row index for each transmitted row of an interlaced image."""
    return np.concatenate(
        [np.arange(off, h, step) for off, step in _INTERLACE_PASSES]
    )


# -- LZW ---------------------------------------------------------------------


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Compress a 1-D array of palette indices with GIF variable-width
    LZW.  A real compressor: greedy longest-match against a growing
    dictionary, code width bumps when the next free code crosses a
    power of two, and a CLEAR + reset when the table hits 4096 — the
    same state machine the decoder mirrors."""
    clear = 1 << min_code_size
    eoi = clear + 1
    seq = np.asarray(indices, dtype=np.int64)
    if seq.size and (seq.min() < 0 or seq.max() >= clear):
        raise ValueError(
            f"index out of range for code size {min_code_size}: "
            f"[{seq.min()}, {seq.max()}]"
        )

    out = bytearray()
    acc = 0  # bit accumulator, LSB-first per spec
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> tuple[dict, int, int]:
        return (
            {(i,): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh_table()
    emit(clear, width)
    buf: tuple = ()
    for px in seq.tolist():
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        # width covers codes < 2**width; the NEXT emitted code may be
        # next_code-1, so bump as soon as next_code exceeds the range
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code >= (1 << _MAX_CODE_WIDTH):
            emit(clear, width)
            table, next_code, width = fresh_table()
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decompress a GIF LZW stream into exactly ``n_pixels`` palette
    indices.  Dictionary entries are stored as (prefix_code, last_index)
    pairs; each segment is materialized AT EMIT TIME with a backward
    prefix-walk into a preallocated buffer — O(total output) instead of
    O(n²) byte-string concatenation, and correct across mid-stream CLEAR
    resets (which legitimately rewrite table slots ≥ ``eoi+1``, so a
    deferred final-state walk would corrupt pre-reset segments)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    # LSB-first accumulator code reader (a few int ops per code — much
    # faster than per-code numpy bit slicing), widening as the decoder's
    # own table growth dictates (mirrors the encoder exactly).
    acc = 0
    nbits = 0
    byte_pos = 0
    n_data = len(data)

    # table[i] = (prefix_code or -1, last_index); entry length tracked
    # so output can be sized without materializing strings.  Plain
    # Python lists: scalar access is several times faster than numpy
    # element indexing in this per-code loop.
    size = 1 << _MAX_CODE_WIDTH
    prefix = [-1] * size
    last = list(range(clear)) + [0] * (size - clear)
    length = [1] * clear + [0] * (size - clear)

    def reset() -> tuple[int, int]:
        return eoi + 1, min_code_size + 1

    next_code, width = reset()
    # last segment may overshoot n_pixels by up to one max-length entry
    out = [0] * (n_pixels + size)
    out_len = 0
    prev = -1
    while out_len < n_pixels:
        while nbits < width:
            if byte_pos >= n_data:
                break
            acc |= data[byte_pos] << nbits
            nbits += 8
            byte_pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("malformed GIF LZW: first code not literal")
            out[out_len] = code
            out_len += 1
            prev = code
            continue
        if code < next_code:
            entry_first = code
        elif code == next_code:
            entry_first = prev  # KwKwK: entry = prev + first(prev)
        else:
            raise ValueError(
                f"malformed GIF LZW: code {code} beyond table ({next_code})"
            )
        # first index of entry_first's expansion
        c = entry_first
        while prefix[c] >= 0:
            c = prefix[c]
        first_idx = last[c]
        if next_code < size:
            prefix[next_code] = prev
            last[next_code] = first_idx
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code >= (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        # after the add, string(code) is defined even in the KwKwK case;
        # expand it right-to-left via prefix links, NOW — a later CLEAR
        # reset may rewrite the slots this segment references
        seg_len = length[code]
        end = out_len + seg_len
        c = code
        while c >= 0:
            end -= 1
            out[end] = last[c]
            c = prefix[c]
        out_len += seg_len
        prev = code

    if out_len < n_pixels:
        raise ValueError(
            f"malformed GIF LZW: stream ended at {out_len}/{n_pixels} pixels"
        )
    return np.array(out[:n_pixels], dtype=np.int32)


# -- container ---------------------------------------------------------------


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    local_palette: bool = False,
) -> bytes:
    """Encode an ``(H, W)`` array of palette indices + an ``(N, 3)``
    uint8 palette as a single-frame GIF89a.  ``local_palette=True``
    stores the table on the image descriptor instead of the logical
    screen — both decoder paths exist and are tested."""
    idx = np.asarray(indices)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError(f"expected (H, W) index array, got {idx.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= pal.shape[0] <= 256:
        raise ValueError(f"expected (N<=256, 3) palette, got {pal.shape}")
    h, w = idx.shape
    n = pal.shape[0]
    # table size field stores 2**(field+1) entries; pad palette up
    field = 0
    while (2 << field) < n:
        field += 1
    stored = 2 << field
    pal_bytes = np.zeros((stored, 3), dtype=np.uint8)
    pal_bytes[:n] = pal
    min_code_size = max(2, field + 1)

    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_palette else 1
    out += struct.pack(
        "<HHBBB", w, h, (gct_flag << 7) | (field if gct_flag else 0), 0, 0
    )
    if gct_flag:
        out += pal_bytes.tobytes()
    # image descriptor
    lct_flag = 1 if local_palette else 0
    out += struct.pack(
        "<BHHHHB",
        0x2C,
        0,
        0,
        w,
        h,
        (lct_flag << 7) | (int(interlace) << 6) | (field if lct_flag else 0),
    )
    if lct_flag:
        out += pal_bytes.tobytes()
    rows = idx[_interlace_order(h)] if interlace else idx
    data = lzw_encode(rows.reshape(-1), min_code_size)
    out.append(min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF into an ``(H, W, 3)`` uint8 RGB
    array — stdlib ``struct`` + numpy, no media library."""
    b = bytes(payload)
    if b[:6] not in GIF_MAGICS:
        raise NotImplementedError(
            "not a GIF payload; use decode_image for format dispatch"
        )
    if len(b) < 13:
        raise ValueError("malformed GIF payload: truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("malformed GIF payload: truncated color table")
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos)
        gct = gct.reshape(n, 3)
        pos += 3 * n

    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            if pos >= len(b):
                raise ValueError("malformed GIF payload: truncated extension")
            pos += 1
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(
                f"malformed GIF payload: unknown block 0x{block:02x}"
            )
        # image descriptor
        if pos + 9 > len(b):
            raise ValueError("malformed GIF payload: truncated descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError(
                f"malformed GIF payload: frame {w}x{h}@{left},{top} "
                f"outside {sw}x{sh} screen"
            )
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(b):
                raise ValueError(
                    "malformed GIF payload: truncated local color table"
                )
            pal = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos)
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("malformed GIF payload: no color table")
        if pos >= len(b):
            raise ValueError("malformed GIF payload: missing LZW code size")
        min_code_size = b[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(
                f"malformed GIF payload: LZW code size {min_code_size}"
            )
        chunks = []
        while pos < len(b) and b[pos]:
            ln = b[pos]
            chunk = b[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("malformed GIF payload: truncated sub-block")
            chunks.append(chunk)
            pos += 1 + ln
        idx = lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("malformed GIF payload: index beyond palette")
        if ipacked & 0x40:  # interlaced: scatter rows back
            out = np.empty_like(idx)
            out[_interlace_order(h)] = idx
            idx = out
        return np.ascontiguousarray(pal[idx])  # (H, W, 3) gather

    raise ValueError("malformed GIF payload: no image data")


# -- animation (multi-frame) --------------------------------------------------


def encode_gif_animation(frames: np.ndarray, delay_cs: int = 4) -> bytes:
    """Encode an ``(N, H, W, 3)`` uint8 RGB frame stack as an animated
    GIF89a: NETSCAPE2.0 loop extension, a Graphic Control Extension per
    frame, and one full-screen image per frame with its own LOCAL color
    table built from the frame's distinct colors (each frame must use
    ≤ 256 distinct RGB triples — true for synthetic fixtures; a real
    encoder would quantize)."""
    import struct

    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.shape[0] == 0:
        raise ValueError(f"expected (N,H,W,3) uint8 frames, got {fr.shape}")
    n, h, w, _ = fr.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n):
        pal, inv = np.unique(
            fr[f].reshape(-1, 3), axis=0, return_inverse=True
        )
        if pal.shape[0] > 256:
            raise ValueError(
                f"frame {f} has {pal.shape[0]} distinct colors (max 256)"
            )
        if pal.shape[0] < 2:  # GIF needs >= 2 table entries
            pal = np.vstack([pal, pal])
        idx = inv.reshape(h, w)
        # GCE: disposal 1 (leave in place), no transparency
        out += b"\x21\xf9\x04" + bytes([1 << 2]) + struct.pack("<H", delay_cs)
        out += b"\x00\x00"
        field = 0
        while (2 << field) < pal.shape[0]:
            field += 1
        stored = 2 << field
        pal_bytes = np.zeros((stored, 3), dtype=np.uint8)
        pal_bytes[: pal.shape[0]] = pal
        min_code_size = max(2, field + 1)
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, (1 << 7) | field  # local table
        )
        out += pal_bytes.tobytes()
        data = lzw_encode(idx.reshape(-1), min_code_size)
        out.append(min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode EVERY frame of a GIF into composited full-screen
    ``(H, W, 3)`` uint8 RGB arrays — real animation semantics: frames
    paint into a persistent logical-screen canvas at their (left, top)
    offset, the GCE transparency index leaves underlying pixels visible,
    and disposal methods 2 (restore to background) and 3 (restore to
    previous) rewind the canvas after the frame is emitted."""
    import struct

    b = bytes(payload)
    if b[:6] not in GIF_MAGICS:
        raise NotImplementedError(
            "not a GIF payload; use decode_image for format dispatch"
        )
    if len(b) < 13:
        raise ValueError("malformed GIF payload: truncated header")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        ngc = 2 << (packed & 0x07)
        if pos + 3 * ngc > len(b):
            raise ValueError("malformed GIF payload: truncated color table")
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * ngc, offset=pos)
        gct = gct.reshape(ngc, 3)
        pos += 3 * ngc
    bg_rgb = (
        gct[bg] if gct is not None and bg < gct.shape[0] else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy().astype(np.uint8)
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("malformed GIF payload: truncated extension")
            label = b[pos]
            pos += 1
            if label == 0xF9 and pos < len(b) and b[pos] >= 4:
                flags = b[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = b[pos + 4] if flags & 1 else -1
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(
                f"malformed GIF payload: unknown block 0x{block:02x}"
            )
        if pos + 9 > len(b):
            raise ValueError("malformed GIF payload: truncated descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError(
                f"malformed GIF payload: frame {w}x{h}@{left},{top} "
                f"outside {sw}x{sh} screen"
            )
        pal = gct
        if ipacked & 0x80:
            npal = 2 << (ipacked & 0x07)
            if pos + 3 * npal > len(b):
                raise ValueError(
                    "malformed GIF payload: truncated local color table"
                )
            pal = np.frombuffer(b, dtype=np.uint8, count=3 * npal, offset=pos)
            pal = pal.reshape(npal, 3)
            pos += 3 * npal
        if pal is None:
            raise ValueError("malformed GIF payload: no color table")
        if pos >= len(b):
            raise ValueError("malformed GIF payload: missing LZW code size")
        min_code_size = b[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(
                f"malformed GIF payload: LZW code size {min_code_size}"
            )
        chunks = []
        while pos < len(b) and b[pos]:
            ln = b[pos]
            chunk = b[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("malformed GIF payload: truncated sub-block")
            chunks.append(chunk)
            pos += 1 + ln
        pos += 1  # block terminator
        idx = lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("malformed GIF payload: index beyond palette")
        if ipacked & 0x40:  # interlaced
            scat = np.empty_like(idx)
            scat[_interlace_order(h)] = idx
            idx = scat
        region = canvas[top : top + h, left : left + w]
        saved = region.copy() if disposal == 3 else None
        px = pal[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = px[mask]
        else:
            region[:] = px
        frames.append(canvas.copy())
        if disposal == 2:  # restore region to background
            region[:] = bg_rgb
        elif disposal == 3 and saved is not None:  # restore to previous
            region[:] = saved
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("malformed GIF payload: no image data")
    return frames
