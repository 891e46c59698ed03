"""EXIF (APP1) metadata for JPEG payloads — pure struct, no media libs.

Real-world curation pipelines extract camera metadata and SCRUB privacy
fields (GPS above all) before training.  EXIF is a TIFF IFD embedded in
a JPEG APP1 segment (``Exif\\0\\0`` + TIFF header), so the parser here
is a small IFD walk (both byte orders, SHORT/LONG/ASCII/RATIONAL
values, IFD0 + the GPS sub-IFD behind tag 0x8825).

:func:`build_exif` / :func:`insert_app1` generate fixtures (and are a
usable tagger); :func:`extract_exif` returns a flat dict;
:func:`strip_exif` removes every APP1 segment WITHOUT touching entropy
data — the decoded pixels must be byte-identical before and after,
which is what the ``mm_exif_gps_scrub`` oracle pins."""

from __future__ import annotations

import struct

# common IFD0 tags
TAG_ORIENTATION = 0x0112
TAG_MAKE = 0x010F
TAG_GPS_IFD = 0x8825
# GPS IFD tags (subset)
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004


def build_exif(
    orientation: int | None = None,
    make: str | None = None,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """Build an APP1 payload (``Exif\\0\\0`` + little-endian TIFF) with
    IFD0 (orientation SHORT, make ASCII) and, when ``gps`` is given, a
    GPS sub-IFD with lat/lon as degree RATIONALs."""
    entries0 = []
    tail = bytearray()
    # offsets are relative to the TIFF header start (after Exif\0\0)

    def ascii_entry(tag, text):
        data = text.encode() + b"\x00"
        if len(data) <= 4:
            return (tag, 2, len(data), data.ljust(4, b"\x00"))
        return (tag, 2, len(data), ("TAIL", bytes(data)))

    if make is not None:
        entries0.append(ascii_entry(TAG_MAKE, make))
    if orientation is not None:
        entries0.append(
            (TAG_ORIENTATION, 3, 1, struct.pack("<HH", orientation, 0))
        )
    gps_entries = []
    if gps is not None:
        lat, lon = gps

        def rational(v):
            num = int(round(abs(v) * 1_000_000))
            return struct.pack("<II", num, 1_000_000)

        gps_entries = [
            (GPS_LAT_REF, 2, 2, (b"N\x00" if lat >= 0 else b"S\x00").ljust(4, b"\x00")),
            (GPS_LAT, 5, 1, ("TAIL", rational(lat))),
            (GPS_LON_REF, 2, 2, (b"E\x00" if lon >= 0 else b"W\x00").ljust(4, b"\x00")),
            (GPS_LON, 5, 1, ("TAIL", rational(lon))),
        ]
        entries0.append((TAG_GPS_IFD, 4, 1, "GPSPTR"))

    entries0.sort(key=lambda e: e[0])

    def render_ifd(entries, ifd_offset, tail, tail_base, gps_ptr=None):
        out = struct.pack("<H", len(entries))
        for tag, typ, count, val in entries:
            out += struct.pack("<HHI", tag, typ, count)
            if val == "GPSPTR":
                out += struct.pack("<I", gps_ptr)
            elif isinstance(val, tuple) and val[0] == "TAIL":
                out += struct.pack("<I", tail_base + len(tail))
                tail += val[1]
            else:
                out += val
        out += struct.pack("<I", 0)  # no next IFD
        return out

    ifd0_off = 8
    ifd0_size = 2 + 12 * len(entries0) + 4
    gps_off = ifd0_off + ifd0_size
    gps_size = (2 + 12 * len(gps_entries) + 4) if gps_entries else 0
    tail_base = gps_off + gps_size
    tail = bytearray()
    gps_blob = b""
    if gps_entries:
        gps_blob = render_ifd(gps_entries, gps_off, tail, tail_base)
    ifd0 = render_ifd(entries0, ifd0_off, tail, tail_base, gps_ptr=gps_off)
    tiff = b"II*\x00" + struct.pack("<I", ifd0_off) + ifd0 + gps_blob + bytes(tail)
    return b"Exif\x00\x00" + tiff


def insert_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (before any other marker)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


def _walk_segments(jpeg: bytes):
    """Yield (marker, start, end) for each JPEG header segment up to SOS."""
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("malformed JPEG payload: expected marker")
        marker = struct.unpack_from(">H", jpeg, pos)[0]
        if marker == 0xFFD9:
            return
        (ln,) = struct.unpack_from(">H", jpeg, pos + 2)
        yield marker, pos, pos + 2 + ln
        if marker == 0xFFDA:
            return
        pos += 2 + ln


def extract_exif(jpeg: bytes) -> dict:
    """Parse the first APP1/Exif segment into a flat dict:
    ``orientation``, ``make``, ``gps_lat``, ``gps_lon`` (signed degrees)
    and ``has_gps``.  Returns ``{}`` when no EXIF is present."""
    b = bytes(jpeg)
    for marker, start, end in _walk_segments(b):
        if marker != 0xFFE1 or b[start + 4 : start + 10] != b"Exif\x00\x00":
            continue
        t0 = start + 10  # TIFF header start
        head = b[t0 : t0 + 4]
        if head not in (b"II*\x00", b"MM\x00*"):
            raise ValueError("malformed EXIF payload: bad TIFF header")
        bo = "<" if head[:2] == b"II" else ">"

        def read_ifd(off):
            entries = {}
            if t0 + off + 2 > end:
                raise ValueError("malformed EXIF payload: IFD out of range")
            (n,) = struct.unpack_from(bo + "H", b, t0 + off)
            if t0 + off + 2 + 12 * n > end:
                raise ValueError(
                    "malformed EXIF payload: IFD entries out of range"
                )
            for i in range(n):
                e = t0 + off + 2 + 12 * i
                tag, typ, count = struct.unpack_from(bo + "HHI", b, e)
                entries[tag] = (typ, count, e + 8)
            return entries

        def value(typ, count, vpos):
            size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}.get(typ)
            if size is None:
                return None
            total = size * count
            if total > 4:
                if vpos + 4 > end:
                    raise ValueError(
                        "malformed EXIF payload: value offset out of range"
                    )
                (off,) = struct.unpack_from(bo + "I", b, vpos)
                vpos = t0 + off
            # Out-of-line offsets come from untrusted bytes: a hostile or
            # truncated payload must raise the codebase's named ValueError,
            # not silently read unrelated JPEG bytes or hit struct.error
            # past EOF.  All reads must land inside THIS APP1 segment.
            if vpos + total > end or vpos < t0:
                raise ValueError(
                    "malformed EXIF payload: value out of range"
                )
            if typ == 2:
                raw = b[vpos : vpos + count]
                return raw.split(b"\x00")[0].decode("ascii", "replace")
            if typ == 3:
                return struct.unpack_from(bo + "H", b, vpos)[0]
            if typ == 4:
                return struct.unpack_from(bo + "I", b, vpos)[0]
            if typ == 5:
                num, den = struct.unpack_from(bo + "II", b, vpos)
                return num / den if den else 0.0
            return None

        ifd0 = read_ifd(struct.unpack_from(bo + "I", b, t0 + 4)[0])
        out: dict = {}
        if TAG_ORIENTATION in ifd0:
            out["orientation"] = value(*ifd0[TAG_ORIENTATION])
        if TAG_MAKE in ifd0:
            out["make"] = value(*ifd0[TAG_MAKE])
        out["has_gps"] = False
        if TAG_GPS_IFD in ifd0:
            gps_ifd = read_ifd(value(*ifd0[TAG_GPS_IFD]))
            lat = value(*gps_ifd[GPS_LAT]) if GPS_LAT in gps_ifd else None
            lon = value(*gps_ifd[GPS_LON]) if GPS_LON in gps_ifd else None
            if lat is not None and lon is not None:
                lat_ref = value(*gps_ifd.get(GPS_LAT_REF, (2, 0, 0))) or "N"
                lon_ref = value(*gps_ifd.get(GPS_LON_REF, (2, 0, 0))) or "E"
                out["gps_lat"] = -lat if lat_ref.startswith("S") else lat
                out["gps_lon"] = -lon if lon_ref.startswith("W") else lon
                out["has_gps"] = True
        return out
    return {}


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every APP1 segment; entropy data and every other segment
    pass through untouched, so decoded pixels are byte-identical."""
    b = bytes(jpeg)
    drops = [
        (start, end)
        for marker, start, end in _walk_segments(b)
        if marker == 0xFFE1
    ]
    if not drops:
        return b
    out = bytearray()
    pos = 0
    for start, end in drops:
        out += b[pos:start]
        pos = end
    out += b[pos:]
    return bytes(out)
