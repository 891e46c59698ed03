"""Uncompressed-AVI (RIFF) video container codec in pure struct/numpy —
no media libraries.

The video layer's REAL demuxer: AVI files whose video stream carries
uncompressed 24-bit DIB frames ('DIB ' handler, BI_RGB) are a plain RIFF
chunk tree — `LIST hdrl` (avih + stream headers), `LIST movi` (one
``00db`` chunk per frame, bottom-up BGR rows padded to 4 bytes), and an
``idx1`` index.  That is parseable with stdlib ``struct`` alone, so
frame demux + decode is real here; compressed codecs (H.264 etc.) keep
raising the named ``NotImplementedError`` in
:func:`multimodal.decode_video_frames`.

:func:`encode_avi` is the fixture generator (and a usable sink);
:func:`decode_avi_frames` demuxes + decodes to RGB arrays;
:func:`multimodal.sample_video_frames` is the Spark fan-out stage that
emits every N-th demuxed frame as a standalone BMP payload, composing
with the rest of the REAL image pipeline (``decode_image_batch``,
``resize_images``)."""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"
MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian, the biCompression value


def _bmp_rows(frame: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 → bottom-up BGR DIB rows, stride padded to 4."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    return rows.tobytes()


def encode_avi(
    frames: np.ndarray, fps: int = 30, *, codec: str = "dib", quality: int = 90
) -> bytes:
    """Encode an ``(N, H, W, 3)`` uint8 RGB frame stack (or a list of
    equal-shape frames) as an AVI — uncompressed 24-bit DIB
    (``codec="dib"``) or Motion-JPEG (``codec="mjpg"``: every frame is a
    baseline JPEG from :mod:`functions.jpeg_codec`, the one compressed
    AVI flavor this package can produce AND consume without a media
    library)."""
    if codec not in ("dib", "mjpg"):
        raise ValueError(f"codec must be 'dib' or 'mjpg', got {codec!r}")
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.shape[0] == 0:
        raise ValueError(f"expected (N,H,W,3) uint8 frames, got {fr.shape}")
    n, h, w, _ = fr.shape
    stride = (w * 3 + 3) // 4 * 4
    if codec == "mjpg":
        from entropy_balance_weighting_spark.functions.jpeg_codec import (
            encode_jpeg,
        )

        frame_blobs = [encode_jpeg(f, quality=quality) for f in fr]
        frame_size = max(len(fb) for fb in frame_blobs)
        handler, compression, chunk_id = b"MJPG", MJPG_FOURCC, b"00dc"
    else:
        frame_blobs = None
        frame_size = stride * h
        handler, compression, chunk_id = b"DIB ", 0, b"00db"

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(subtype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", subtype + data)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            frame_size,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0,
            0,
            w,
            h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    blobs = (
        frame_blobs if frame_blobs is not None else [_bmp_rows(f) for f in fr]
    )
    movi_children = b"".join(chunk(chunk_id, fb) for fb in blobs)
    movi = lst(b"movi", movi_children)
    # idx1: offsets relative to the start of the movi LIST data (i.e. the
    # position of 'movi' + 4)
    idx = bytearray()
    off = 4
    for fb in blobs:
        idx += chunk_id + struct.pack("<III", 0x10, off, len(fb))
        off += 8 + len(fb) + (len(fb) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return AVI_MAGIC + struct.pack("<I", len(body)) + body


def decode_avi_frames(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Demux an uncompressed-DIB AVI into ``([frame (H, W, 3) RGB], fps)``
    — stdlib struct + numpy, no media library.  Compressed video streams
    (any non-BI_RGB biCompression) raise a named ``NotImplementedError``."""
    b = bytes(payload)
    if b[:4] != AVI_MAGIC or len(b) < 12 or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "not a RIFF/AVI payload; compressed video needs a codec library"
        )
    w = h = bpp = None
    compression = 0
    fps = 0.0
    frames_raw: list[bytes] = []
    # Streams are numbered by strh appearance order; a multi-stream AVI
    # (video + audio, or a second video stream) must not interleave
    # foreign '##db'/'##dc' chunks into the frame list or pick a foreign
    # strf as the format header (r7 advice).  Track which stream index is
    # the 'vids' stream and only accept ITS strf and ITS movi chunks.
    stream_no = -1
    vids_stream = None
    awaiting_vids_strf = False

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, bpp, compression, fps
        nonlocal stream_no, vids_stream, awaiting_vids_strf
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            data_start = pos + 8
            data_end = data_start + clen
            if data_end > end:
                raise ValueError(
                    f"malformed AVI payload: chunk {fourcc!r} overruns"
                )
            if fourcc == b"LIST":
                walk(data_start + 4, data_end)  # skip the subtype fourcc
            elif fourcc == b"strh" and clen >= 48:
                stream_no += 1
                awaiting_vids_strf = False
                if (
                    b[data_start : data_start + 4] == b"vids"
                    and vids_stream is None
                ):
                    vids_stream = stream_no
                    awaiting_vids_strf = True
                    scale, rate = struct.unpack_from("<II", b, data_start + 20)
                    if scale:
                        fps = rate / scale
            elif fourcc == b"strf" and clen >= 40 and awaiting_vids_strf:
                _, bw, bh, _, bits, comp = struct.unpack_from(
                    "<IiiHHI", b, data_start
                )
                w, h, bpp, compression = bw, bh, bits, comp
                awaiting_vids_strf = False
            elif (
                fourcc[2:4] in (b"db", b"dc")
                and fourcc[:2].isdigit()
                and vids_stream is not None
                and int(fourcc[:2]) == vids_stream
            ):
                frames_raw.append(b[data_start:data_end])
            pos = data_end + (clen & 1)  # chunks are word-aligned

    walk(12, len(b))
    if w is None or h is None:
        raise ValueError("malformed AVI payload: missing strf header")
    if compression == MJPG_FOURCC:
        from entropy_balance_weighting_spark.functions.jpeg_codec import (
            decode_jpeg,
        )

        out = [decode_jpeg(raw) for raw in frames_raw]
        return out, fps
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed-DIB and Motion-JPEG AVI are supported "
            f"(biCompression={compression}, bpp={bpp})"
        )
    top_down = h < 0
    ah = abs(int(h))
    if w <= 0 or ah == 0:
        raise ValueError(f"malformed AVI payload: w={w}, h={h}")
    stride = (w * 3 + 3) // 4 * 4
    out = []
    for raw in frames_raw:
        if len(raw) < stride * ah:
            raise ValueError("malformed AVI payload: truncated frame")
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * ah)
        px = rows.reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]
        if not top_down:
            px = px[::-1]
        out.append(np.ascontiguousarray(px))
    return out, fps
