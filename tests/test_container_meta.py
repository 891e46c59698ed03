"""ID3v2 / MP4 container-metadata extract + strip (functions/container_meta).

The privacy-scrub contract mirrors the r7 EXIF operator: extraction reads
exactly the planted metadata; strip removes ALL of it while leaving the
coded bitstream byte-identical; malformed/hostile containers raise the
codebase's named ValueError rather than struct.error or silent garbage.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entropy_balance_weighting_spark.functions import container_meta as cm

BODY = bytes(range(256)) * 8


# -- ID3v2 -----------------------------------------------------------------


def test_id3_roundtrip_extract_strip():
    tag = cm.build_id3(title="Song 7", artist="Band X", gps=(37.7749, -122.4194))
    mp3 = tag + BODY
    meta = cm.extract_id3(mp3)
    assert meta["title"] == "Song 7"
    assert meta["artist"] == "Band X"
    assert meta["has_gps"]
    assert abs(meta["gps_lat"] - 37.7749) < 1e-9
    assert abs(meta["gps_lon"] + 122.4194) < 1e-9
    assert cm.strip_id3(mp3) == BODY
    assert cm.extract_id3(cm.strip_id3(mp3)) == {}


def test_id3_strip_also_drops_trailing_id3v1():
    mp3 = cm.build_id3(title="t") + BODY + b"TAG" + bytes(125)
    assert cm.strip_id3(mp3) == BODY


def test_id3_no_tag_is_passthrough():
    assert cm.extract_id3(BODY) == {}
    assert cm.strip_id3(BODY) == BODY


def test_id3_v24_syncsafe_frame_sizes():
    # hand-build a v2.4 tag: frame sizes are syncsafe in v2.4
    data = b"\x03" + "wide title".encode()
    frame = b"TIT2" + cm._syncsafe(len(data)) + b"\x00\x00" + data
    tag = b"ID3\x04\x00\x00" + cm._syncsafe(len(frame)) + frame
    meta = cm.extract_id3(tag + BODY)
    assert meta["title"] == "wide title"


def test_id3_malformed_raises_named_valueerror():
    good = cm.build_id3(title="x", gps=(1.5, 2.25)) + BODY
    with pytest.raises(ValueError, match="malformed ID3"):
        cm.extract_id3(b"ID3\x03\x00\x00\xff\xff\xff\xff")  # non-syncsafe
    # tag size overrunning the payload
    with pytest.raises(ValueError, match="overruns payload"):
        cm.extract_id3(good[:12])
    # frame size overrunning the tag
    bad = bytearray(good)
    struct.pack_into(">I", bad, 14, 1 << 20)
    with pytest.raises(ValueError, match="frame overruns"):
        cm.extract_id3(bytes(bad))
    # garbage frame id
    bad2 = bytearray(good)
    bad2[10:14] = b"\x01\x02\x03\x04"
    with pytest.raises(ValueError, match="bad frame id"):
        cm.extract_id3(bytes(bad2))


@settings(max_examples=60, deadline=None)
@given(
    title=st.one_of(st.none(), st.text(min_size=0, max_size=30)),
    artist=st.one_of(st.none(), st.text(min_size=0, max_size=30)),
    lat=st.integers(-89_999_999, 89_999_999),
    lon=st.integers(-179_999_999, 179_999_999),
    with_gps=st.booleans(),
    body=st.binary(min_size=0, max_size=200),
)
def test_id3_fuzz_roundtrip(title, artist, lat, lon, with_gps, body):
    gps = (lat / 1e6, lon / 1e6) if with_gps else None
    mp3 = cm.build_id3(title=title, artist=artist, gps=gps) + body
    meta = cm.extract_id3(mp3)
    if title is not None:
        assert meta["title"] == title.split("\x00")[0]
    if artist is not None:
        assert meta["artist"] == artist.split("\x00")[0]
    assert meta.get("has_gps", False) == with_gps
    if with_gps:
        assert round(meta["gps_lat"] * 1e6) == lat
        assert round(meta["gps_lon"] * 1e6) == lon
    assert cm.strip_id3(mp3) == body


# -- MP4 -------------------------------------------------------------------


def test_mp4_roundtrip_extract_strip():
    mp4 = cm.build_mp4(BODY, name="clip 9", gps=(12.5, -98.25))
    meta = cm.extract_mp4_meta(mp4)
    assert meta["name"] == "clip 9"
    assert meta["has_gps"]
    assert meta["gps_lat"] == 12.5
    assert meta["gps_lon"] == -98.25
    clean = cm.strip_mp4_meta(mp4)
    assert cm.extract_mp4_meta(clean) == {}
    # mdat (the coded bitstream) byte-identical after the scrub
    assert clean[clean.index(b"mdat") - 4 :] == mp4[mp4.index(b"mdat") - 4 :]


def test_mp4_no_udta():
    mp4 = cm.build_mp4(BODY)
    assert cm.extract_mp4_meta(mp4) == {}
    assert cm.strip_mp4_meta(mp4) == mp4


def test_mp4_largesize_atom():
    # an mdat written with the 64-bit largesize form must walk cleanly
    base = cm.build_mp4(b"", gps=(1.5, 2.5))
    i = base.index(b"mdat") - 4
    big_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(BODY)) + BODY
    mp4 = base[:i] + big_mdat
    assert cm.extract_mp4_meta(mp4)["has_gps"]
    clean = cm.strip_mp4_meta(mp4)
    assert clean.endswith(big_mdat)
    assert cm.extract_mp4_meta(clean) == {}


def test_mp4_malformed_raises_named_valueerror():
    with pytest.raises(ValueError, match="missing ftyp"):
        cm.extract_mp4_meta(b"not an mp4 at all....")
    good = cm.build_mp4(BODY, gps=(1.5, 2.5))
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, 1 << 30)  # ftyp size overruns payload
    with pytest.raises(ValueError, match="size out of range"):
        cm.extract_mp4_meta(bytes(bad))
    # hostile ©xyz value
    j = good.index(b"\xa9xyz") + 8
    bad2 = bytearray(good)
    bad2[j : j + 4] = struct.pack(">HH", 4, 0x55C4)
    bad2[j + 4 : j + 8] = b"zzzz"
    with pytest.raises(ValueError, match="xyz location"):
        cm.extract_mp4_meta(bytes(bad2))


def test_mp4_udta_slen_overrun_named_error():
    """A hostile 16-bit string length that overruns the enclosing udta
    atom must raise the named error, not silently slice neighbor bytes."""
    good = cm.build_mp4(BODY, name="x", gps=(1.5, 2.5))
    j = good.index(b"\xa9nam") + 4
    bad = bytearray(good)
    struct.pack_into(">H", bad, j, 0xFFFF)  # slen way past the atom end
    with pytest.raises(ValueError, match="overruns atom"):
        cm.extract_mp4_meta(bytes(bad))


def test_mp4_second_udta_does_not_reset_has_gps():
    """A moov with a gps-bearing udta followed by a second udta WITHOUT
    ©xyz must keep has_gps=True (per-udta reset was a bug)."""
    nm = b"tail"
    extra_udta = cm._atom(
        b"udta", cm._atom(b"\xa9nam", struct.pack(">HH", len(nm), 0x55C4) + nm)
    )
    mp4 = cm.build_mp4(BODY, gps=(3.5, -4.25), extra_moov_children=extra_udta)
    meta = cm.extract_mp4_meta(mp4)
    assert meta["has_gps"] is True
    assert meta["gps_lat"] == 3.5
    assert meta["name"] == "tail"


@settings(max_examples=60, deadline=None)
@given(
    name=st.one_of(st.none(), st.text(min_size=0, max_size=30)),
    lat=st.integers(-899_999, 899_999),
    lon=st.integers(-1_799_999, 1_799_999),
    with_gps=st.booleans(),
    body=st.binary(min_size=0, max_size=300),
)
def test_mp4_fuzz_roundtrip(name, lat, lon, with_gps, body):
    gps = (lat / 1e4, lon / 1e4) if with_gps else None
    mp4 = cm.build_mp4(body, name=name, gps=gps)
    meta = cm.extract_mp4_meta(mp4)
    if name is not None:
        assert meta["name"] == name
    if with_gps:
        assert round(meta["gps_lat"] * 1e4) == lat
        assert round(meta["gps_lon"] * 1e4) == lon
    if name is not None or with_gps:
        clean = cm.strip_mp4_meta(mp4)
        assert cm.extract_mp4_meta(clean) == {}
        assert clean[clean.index(b"mdat") - 4 :] == mp4[mp4.index(b"mdat") - 4 :]


def test_id3_v22_three_byte_frames():
    # hand-build a v2.2 tag: 3-char ids, 3-byte sizes, no flag bytes
    def frame22(fid, text):
        data = b"\x00" + text.encode("latin-1")
        return fid + len(data).to_bytes(3, "big") + data

    frames = frame22(b"TT2", "old title") + frame22(b"TP1", "old artist")
    tag = b"ID3\x02\x00\x00" + cm._syncsafe(len(frames)) + frames
    meta = cm.extract_id3(tag + BODY)
    assert meta["title"] == "old title"
    assert meta["artist"] == "old artist"
    assert meta["has_gps"] is False
    assert cm.strip_id3(tag + BODY) == BODY


# -- MP3 frame-header probe ------------------------------------------------


def test_mp3_probe_cbr_exact():
    """CBR stream: frame count, duration, bitrate, and mode are exact
    arithmetic from the header fields (1152 samples/frame at 44.1 kHz)."""
    mp3 = cm.build_mp3_frames(38, bitrate_kbps=160, samplerate=44100)
    m = cm.probe_mp3(mp3)
    assert m["n_frames"] == 38
    assert abs(m["duration_sec"] - 38 * 1152 / 44100) < 1e-12
    assert m["bitrate_kbps_avg"] == 160.0
    assert m["samplerate"] == 44100
    assert m["channel_mode"] == "stereo"
    assert not m["is_vbr"] and not m["truncated"] and m["resync_bytes"] == 0


def test_mp3_probe_skips_id3v2_and_id3v1():
    mp3 = cm.build_mp3_frames(5)
    tagged = cm.build_id3(title="t", artist="a") + mp3 + b"TAG" + bytes(125)
    assert cm.probe_mp3(tagged)["n_frames"] == 5


def test_mp3_probe_xing_vbr_tag():
    m = cm.probe_mp3(
        cm.build_mp3_frames(
            12, bitrate_kbps=64, samplerate=22050, mpeg1=False, mono=True,
            xing=True,
        )
    )
    assert m["is_vbr"] and m["vbr_frame_count"] == 12
    # MPEG2 Layer III frames carry 576 samples
    assert abs(m["duration_sec"] - 12 * 576 / 22050) < 1e-12


def test_mp3_probe_mixed_bitrates_flag_vbr():
    a = cm.build_mp3_frames(3, bitrate_kbps=128)
    b = cm.build_mp3_frames(3, bitrate_kbps=192)
    m = cm.probe_mp3(a + b)
    assert m["n_frames"] == 6 and m["is_vbr"]
    assert abs(m["bitrate_kbps_avg"] - 160.0) < 1e-12


def test_mp3_probe_resync_and_truncation():
    mp3 = cm.build_mp3_frames(4)
    garbage = b"\x00\x01\x02junk"
    m = cm.probe_mp3(garbage + mp3[: len(mp3) - 10])
    assert m["n_frames"] == 3  # final frame incomplete
    assert m["truncated"] and m["resync_bytes"] == len(garbage)


def test_mp3_probe_no_frames_named_error():
    with pytest.raises(ValueError, match="malformed MP3 payload"):
        cm.probe_mp3(b"not audio at all" * 10)


@given(
    n_frames=st.integers(1, 40),
    layer=st.sampled_from([1, 2, 3]),
    mpeg1=st.booleans(),
    mono=st.booleans(),
    br_idx=st.integers(1, 14),
    sr_idx=st.integers(0, 2),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_mp3_probe_fuzz_roundtrip(n_frames, layer, mpeg1, mono, br_idx, sr_idx, seed):
    """Every (version, layer, bitrate, samplerate, mode) grid point the
    builder can produce probes back to exact frame count / rate / mode."""
    table = cm._MP3_BITRATES[(mpeg1, layer)]
    rates = cm._MP3_RATES[3 if mpeg1 else 2]
    mp3 = cm.build_mp3_frames(
        n_frames,
        bitrate_kbps=table[br_idx],
        samplerate=rates[sr_idx],
        layer=layer,
        mpeg1=mpeg1,
        mono=mono,
        seed=seed,
    )
    m = cm.probe_mp3(mp3)
    assert m["n_frames"] == n_frames
    assert m["samplerate"] == rates[sr_idx]
    assert m["bitrate_kbps_avg"] == float(table[br_idx])
    assert m["channel_mode"] == ("mono" if mono else "stereo")
    assert m["resync_bytes"] == 0 and not m["truncated"]


# -- Ogg/Vorbis comment walk ----------------------------------------------


def test_ogg_vorbis_extract_exact():
    ogg = cm.build_ogg_vorbis(
        comments={"ARTIST": "Band", "GEO_LOCATION": "37.77,-122.41"},
        sample_rate=48000, channels=1, n_audio_packets=3,
    )
    m = cm.extract_vorbis_comments(ogg)
    assert m["channels"] == 1 and m["sample_rate"] == 48000
    assert m["vendor"] == "ebw-spark"
    assert m["comments"] == {"ARTIST": "Band", "GEO_LOCATION": "37.77,-122.41"}
    assert abs(m["duration_sec"] - 3 * 1024 / 48000) < 1e-12


def test_ogg_vorbis_strip_preserves_audio_pages():
    """Scrub drops all comments and the vendor string; every non-header
    page (all coded audio) is BYTE-IDENTICAL; a keep-list survives."""
    ogg = cm.build_ogg_vorbis(
        comments={"ARTIST": "x", "GEO_LOCATION": "1,2", "TITLE": "keepme"},
        n_audio_packets=4,
    )
    clean = cm.strip_vorbis_comments(ogg)
    m = cm.extract_vorbis_comments(clean)
    assert m["comments"] == {} and m["vendor"] == ""
    kept = cm.extract_vorbis_comments(
        cm.strip_vorbis_comments(ogg, keep=("TITLE",))
    )
    assert kept["comments"] == {"TITLE": "keepme"}
    # pages 2.. (audio) byte-identical
    assert ogg.split(b"OggS")[3:] == clean.split(b"OggS")[3:]
    # scrubbed container still fully CRC-valid
    assert cm.extract_vorbis_comments(clean)["sample_rate"] == 44100


def test_ogg_crc_validated():
    ogg = bytearray(cm.build_ogg_vorbis(comments={"A": "b"}))
    ogg[-1] ^= 0xFF  # corrupt the last audio byte
    with pytest.raises(ValueError, match="page CRC mismatch"):
        cm.extract_vorbis_comments(bytes(ogg))


def test_ogg_malformed_named_errors():
    with pytest.raises(ValueError, match="lost page sync"):
        cm.extract_vorbis_comments(b"NotAnOggStream" + bytes(30))
    ogg = cm.build_ogg_vorbis()
    with pytest.raises(ValueError, match="truncated page"):
        cm.extract_vorbis_comments(ogg[:40])


@given(
    n_comments=st.integers(0, 8),
    n_audio=st.integers(1, 6),
    rate=st.sampled_from([8000, 22050, 44100, 48000]),
    ch=st.integers(1, 8),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_ogg_vorbis_fuzz_roundtrip(n_comments, n_audio, rate, ch, seed):
    comments = {f"K{i}": f"value-{seed}-{i}" for i in range(n_comments)}
    ogg = cm.build_ogg_vorbis(
        comments=comments, sample_rate=rate, channels=ch,
        n_audio_packets=n_audio, seed=seed,
    )
    m = cm.extract_vorbis_comments(ogg)
    assert m["comments"] == comments
    assert m["channels"] == ch and m["sample_rate"] == rate
    clean = cm.strip_vorbis_comments(ogg)
    assert cm.extract_vorbis_comments(clean)["comments"] == {}
    assert ogg.split(b"OggS")[3:] == clean.split(b"OggS")[3:]


# -- MP4 sample-table probe ------------------------------------------------


def test_mp4_track_probe_exact():
    """Per-track stats are exact arithmetic over the planted stts/stsz
    tables: mixed-delta video track with a per-sample size table plus a
    fixed-size audio track; the udta scrub preserves both tracks."""
    trak_v = cm.build_mp4_track(
        handler="vide", timescale=30000,
        sample_deltas=[(30, 1001), (10, 2002)],
        sample_sizes=list(range(100, 140)),
    )
    trak_a = cm.build_mp4_track(
        handler="soun", timescale=44100,
        sample_deltas=[(43, 1024)], fixed_sample_size=512,
    )
    mp4 = cm.build_mp4(
        b"opaque" * 20, name="clip", gps=(12.5, -7.25),
        extra_moov_children=trak_v + trak_a,
    )
    v, a = cm.probe_mp4_tracks(mp4)
    assert v["handler"] == "vide" and v["n_samples"] == 40
    assert abs(v["duration_sec"] - (30 * 1001 + 10 * 2002) / 30000) < 1e-12
    assert v["total_sample_bytes"] == sum(range(100, 140))
    assert a["handler"] == "soun" and a["n_samples"] == 43
    assert a["total_sample_bytes"] == 43 * 512
    assert abs(a["avg_sample_bytes"] - 512.0) < 1e-12
    # scrub removes udta but keeps the sample tables byte-exact
    clean = cm.strip_mp4_meta(mp4)
    assert cm.extract_mp4_meta(clean) == {}
    assert cm.probe_mp4_tracks(clean) == [v, a]


def test_mp4_track_probe_no_tracks_and_malformed():
    assert cm.probe_mp4_tracks(cm.build_mp4(b"x", name="n")) == []
    with pytest.raises(ValueError, match="missing ftyp"):
        cm.probe_mp4_tracks(b"notanmp4file" + bytes(20))
    # truncated stsz table -> named error
    trak = cm.build_mp4_track(sample_sizes=[10] * 8)
    mp4 = bytearray(cm.build_mp4(b"x", extra_moov_children=trak))
    idx = bytes(mp4).find(b"stsz")
    struct.pack_into(">I", mp4, idx + 12, 10_000)  # claim 10k samples
    with pytest.raises(ValueError, match="short stsz"):
        cm.probe_mp4_tracks(bytes(mp4))
    # hdlr atom shrunk below its 12-byte fixed header -> named error,
    # not a silent read of the neighboring atom's bytes
    trak2 = cm.build_mp4_track(sample_sizes=[10] * 4)
    mp4b = bytearray(cm.build_mp4(b"x", extra_moov_children=trak2))
    h = bytes(mp4b).find(b"hdlr")
    # rewrite the hdlr atom in place as an 8-byte (empty-payload) atom
    # followed by a free atom covering its old payload
    (old_size,) = struct.unpack_from(">I", mp4b, h - 4)
    struct.pack_into(">I", mp4b, h - 4, 8)
    struct.pack_into(">I", mp4b, h + 4, old_size - 8)
    mp4b[h + 8 : h + 12] = b"free"
    with pytest.raises(ValueError, match="short hdlr"):
        cm.probe_mp4_tracks(bytes(mp4b))
    # stts atom too short to even hold its entry count -> named error
    trak3 = cm.build_mp4_track(sample_sizes=[10] * 4)
    mp4c = bytearray(cm.build_mp4(b"x", extra_moov_children=trak3))
    s = bytes(mp4c).find(b"stts")
    (old_size3,) = struct.unpack_from(">I", mp4c, s - 4)
    struct.pack_into(">I", mp4c, s - 4, 10)  # 2-byte payload
    struct.pack_into(">I", mp4c, s + 6, old_size3 - 10)
    mp4c[s + 10 : s + 14] = b"free"
    with pytest.raises(ValueError, match="short stts"):
        cm.probe_mp4_tracks(bytes(mp4c))


@given(
    timescale=st.sampled_from([1000, 30000, 44100, 90000]),
    runs=st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 5000)),
        min_size=1, max_size=5,
    ),
    fixed=st.integers(0, 4096),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_mp4_track_probe_fuzz(timescale, runs, fixed, seed):
    n = sum(c for c, _ in runs)
    sizes = None
    if fixed == 0:
        sizes = [(seed + i * 37) % 9000 for i in range(n)]
    trak = cm.build_mp4_track(
        handler="vide", timescale=timescale, sample_deltas=runs,
        sample_sizes=sizes, fixed_sample_size=fixed,
    )
    (t,) = cm.probe_mp4_tracks(cm.build_mp4(b"body", extra_moov_children=trak))
    assert t["n_samples"] == n
    assert abs(
        t["duration_sec"] - sum(c * d for c, d in runs) / timescale
    ) < 1e-9
    want = sum(sizes) if sizes is not None else fixed * n
    assert t["total_sample_bytes"] == want


# --- AAC / ADTS ------------------------------------------------------------


def test_adts_probe_cbr_exact():
    b = cm.build_adts(43, samplerate=48000, channels=2, profile="LC",
                      payload_len=313)
    p = cm.probe_adts(b)
    assert p["n_frames"] == 43
    assert p["samplerate"] == 48000
    assert p["channels"] == 2
    assert p["profile"] == "LC"
    assert abs(p["duration_sec"] - 43 * 1024 / 48000) < 1e-12
    assert not p["crc_protected"] and not p["truncated"]
    assert p["resync_bytes"] == 0


def test_adts_probe_skips_id3_resyncs_and_flags_truncation():
    body = cm.build_adts(10, crc=True, payload_len=100)
    wrapped = cm.build_id3(title="t") + b"\x00garbage" + body + body[:20]
    p = cm.probe_adts(wrapped)
    assert p["n_frames"] == 10
    assert p["crc_protected"]
    assert p["resync_bytes"] >= 8
    assert p["truncated"]


def test_adts_no_frames_named_error():
    with pytest.raises(ValueError, match="malformed ADTS payload: no frames"):
        cm.probe_adts(b"\x00" * 64)


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(1, 30),
    sr=st.sampled_from([96000, 48000, 44100, 16000, 8000]),
    ch=st.integers(1, 7),
    prof=st.sampled_from(["Main", "LC", "SSR", "LTP"]),
    plen=st.integers(1, 700),
    crc=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_adts_fuzz_roundtrip(n_frames, sr, ch, prof, plen, crc, seed):
    b = cm.build_adts(
        n_frames, samplerate=sr, channels=ch, profile=prof,
        payload_len=plen, crc=crc, seed=seed,
    )
    p = cm.probe_adts(b)
    assert p["n_frames"] == n_frames
    assert p["samplerate"] == sr and p["channels"] == ch
    assert p["profile"] == prof and p["crc_protected"] == crc
    hdr = 9 if crc else 7
    assert abs(
        p["bitrate_kbps_avg"]
        - (hdr + plen) * n_frames * 8 / p["duration_sec"] / 1000.0
    ) < 1e-9


# --- Matroska / EBML ---------------------------------------------------------


def _mkv_sample():
    return cm.build_mkv(
        title="home movie", duration_ticks=90_000.0, muxing_app="mux1",
        writing_app="writer2",
        tracks=[
            {"type": "video", "codec_id": "V_VP9", "width": 1920,
             "height": 1080},
            {"type": "audio", "codec_id": "A_OPUS", "samplerate": 48000.0,
             "channels": 2},
        ],
        tags=b"\x00\x01opaquetagdata",
        clusters=[b"clusterbytes1", b"clusterbytes2"],
    )


def test_mkv_probe_exact():
    p = cm.probe_mkv(_mkv_sample())
    assert p["title"] == "home movie"
    assert abs(p["duration_sec"] - 90.0) < 1e-9
    assert p["muxing_app"] == "mux1" and p["writing_app"] == "writer2"
    assert p["has_tags"] and p["n_clusters"] == 2
    v, a = p["tracks"]
    assert v == {"type": "video", "codec_id": "V_VP9", "width": 1920,
                 "height": 1080}
    assert a["type"] == "audio" and a["samplerate"] == 48000.0
    assert a["channels"] == 2


def test_mkv_scrub_drops_meta_keeps_clusters():
    mkv = _mkv_sample()
    clean = cm.strip_mkv_meta(mkv)
    p = cm.probe_mkv(clean)
    assert p["title"] == "" and p["muxing_app"] == "" and p["writing_app"] == ""
    assert not p["has_tags"]
    # coded payload and stream structure survive byte-identical
    assert b"clusterbytes1" in clean and b"clusterbytes2" in clean
    assert p["n_clusters"] == 2
    assert p["tracks"] == cm.probe_mkv(mkv)["tracks"]
    assert abs(p["duration_sec"] - 90.0) < 1e-9
    # scrubbing an already-clean file is idempotent
    assert cm.strip_mkv_meta(clean) == clean


def test_mkv_malformed_named_errors():
    with pytest.raises(ValueError, match="missing EBML header"):
        cm.probe_mkv(b"notanebmlfile" + bytes(16))
    mkv = bytearray(_mkv_sample())
    # corrupt the Segment's first child size so it overruns the parent
    seg_at = bytes(mkv).find(b"\x18\x53\x80\x67")
    # Segment id(4) + size vint; find the Info element after it and blow
    # its size byte up
    info_at = bytes(mkv).find(b"\x15\x49\xa9\x66")
    mkv[info_at + 4] = 0xFE  # 1-byte size form, near-max value
    with pytest.raises(ValueError, match="overruns parent"):
        cm.probe_mkv(bytes(mkv))
    assert seg_at > 0


def test_mkv_unknown_size_segment_tolerated_elsewhere_rejected():
    # streaming muxers write the Segment with the unknown-size form
    mkv = bytearray(_mkv_sample())
    seg_at = bytes(mkv).find(b"\x18\x53\x80\x67")
    size, n = cm._ebml_size(bytes(mkv), seg_at + 4)
    assert n == 2  # build_mkv emitted a 2-byte size here
    mkv[seg_at + 4 : seg_at + 6] = b"\x01" + b"\xff" * 7  # 8-byte unknown
    streaming = bytes(mkv[: seg_at + 4]) + b"\x01" + b"\xff" * 7 + bytes(
        mkv[seg_at + 6 + 8 - 2 :]
    )
    # rebuild properly: id + unknown-size + original segment body
    body_start = seg_at + 4 + 2
    streaming = bytes(mkv[:seg_at]) + b"\x18\x53\x80\x67" + b"\x01" + b"\xff" * 7 + bytes(_mkv_sample()[body_start:])
    p = cm.probe_mkv(streaming)
    assert p["title"] == "home movie" and p["n_clusters"] == 2
    # unknown size on a NON-segment element is a named error
    bad = bytearray(_mkv_sample())
    info_at = bytes(bad).find(b"\x15\x49\xa9\x66")
    sz, n2 = cm._ebml_size(bytes(bad), info_at + 4)
    assert n2 == 1
    del bad[info_at + 4]
    bad[info_at + 4 : info_at + 4] = b"\x01" + b"\xff" * 7
    with pytest.raises(ValueError, match="unknown-size element"):
        cm.probe_mkv(bytes(bad))


@settings(max_examples=40, deadline=None)
@given(
    title=st.one_of(st.none(), st.text(min_size=0, max_size=40)),
    dur=st.floats(0, 1e7, allow_nan=False),
    w=st.integers(16, 7680),
    h=st.integers(16, 4320),
    rate=st.sampled_from([8000.0, 44100.0, 48000.0, 96000.0]),
    ch=st.integers(1, 8),
    n_clusters=st.integers(0, 5),
    tag=st.binary(min_size=0, max_size=60),
)
def test_mkv_fuzz_roundtrip(title, dur, w, h, rate, ch, n_clusters, tag):
    mkv = cm.build_mkv(
        title=title, duration_ticks=dur,
        tracks=[
            {"type": "video", "codec_id": "V_AV1", "width": w, "height": h},
            {"type": "audio", "codec_id": "A_VORBIS", "samplerate": rate,
             "channels": ch},
        ],
        tags=tag,
        clusters=[bytes([i] * (i + 1)) for i in range(n_clusters)],
    )
    p = cm.probe_mkv(mkv)
    assert p["title"] == (title or "")
    assert abs(p["duration_sec"] - dur * 1e6 / 1e9) < 1e-6 * max(1.0, dur)
    assert p["tracks"][0]["width"] == w and p["tracks"][0]["height"] == h
    assert p["tracks"][1]["samplerate"] == rate
    assert p["tracks"][1]["channels"] == ch
    assert p["has_tags"] == bool(tag)
    assert p["n_clusters"] == n_clusters
    clean = cm.strip_mkv_meta(mkv)
    pc = cm.probe_mkv(clean)
    assert pc["title"] == "" and not pc["has_tags"]
    assert pc["tracks"] == p["tracks"]
    assert pc["n_clusters"] == n_clusters


def test_mkv_unknown_size_cluster_probe_ok_scrub_rejects():
    """Live-muxed/streamed Matroska writes unknown-size Clusters; the
    probe must tolerate them (clusters are only counted, bounded by a
    resync scan to the next level-1 ID), while strip_mkv_meta keeps the
    strict named error (re-encoding needs known sizes)."""
    mkv = bytearray(_mkv_sample())
    # make the Segment unknown-size (live-mux convention), as in the
    # streaming test above
    seg_at = bytes(mkv).find(b"\x18\x53\x80\x67")
    body_start = seg_at + 4 + 2
    live = bytearray(
        bytes(mkv[:seg_at])
        + b"\x18\x53\x80\x67"
        + b"\x01" + b"\xff" * 7
        + bytes(mkv[body_start:])
    )
    # make the FIRST Cluster unknown-size too
    cl_at = bytes(live).find(b"\x1f\x43\xb6\x75")
    assert cl_at > 0
    sz, n = cm._ebml_size(bytes(live), cl_at + 4)
    assert sz == len(b"clusterbytes1") and n == 1
    del live[cl_at + 4]
    live[cl_at + 4 : cl_at + 4] = b"\x01" + b"\xff" * 7
    p = cm.probe_mkv(bytes(live))
    assert p["n_clusters"] == 2  # resync found the second Cluster
    assert p["title"] == "home movie"
    assert [t["codec_id"] for t in p["tracks"]] == ["V_VP9", "A_OPUS"]
    with pytest.raises(ValueError, match="unknown-size element"):
        cm.strip_mkv_meta(bytes(live))
    # unknown-size LAST cluster: bounded by end-of-file
    live2 = bytearray(
        bytes(mkv[:seg_at])
        + b"\x18\x53\x80\x67"
        + b"\x01" + b"\xff" * 7
        + bytes(mkv[body_start:])
    )
    cl2 = bytes(live2).rfind(b"\x1f\x43\xb6\x75")
    del live2[cl2 + 4]
    live2[cl2 + 4 : cl2 + 4] = b"\x01" + b"\xff" * 7
    assert cm.probe_mkv(bytes(live2))["n_clusters"] == 2


# --- H.264 SPS probe ---------------------------------------------------------


def test_h264_sps_exact():
    sps = cm.build_h264_sps(
        width=1920, height=1080, profile_idc=100, level_idc=41, fps=29.97
    )
    p = cm.parse_h264_sps(sps)
    assert p["width"] == 1920 and p["height"] == 1080
    assert p["profile"] == "High" and p["profile_idc"] == 100
    assert p["level"] == "4.1"
    assert p["chroma_format"] == "4:2:0"
    assert p["bit_depth_luma"] == 8 and p["bit_depth_chroma"] == 8
    assert abs(p["fps"] - 29.97) < 5e-4  # fps is quantized into the VUI tick
    # 1080 does not fill 68 macroblock rows -> cropping was exercised
    assert 1080 % 16 != 0


def test_h264_annexb_probe_counts_and_sps():
    sps = cm.build_h264_sps(width=640, height=480, profile_idc=66, level_idc=30)
    pps = b"\x68\xce\x38\x80"
    idr = b"\x65\x88\x84\x00"
    nonidr = b"\x41\x9a\x00"
    stream = cm.build_annexb([sps, pps, idr, nonidr, nonidr])
    p = cm.probe_h264(stream)
    assert p["n_nal_units"] == 5 and p["n_sps"] == 1 and p["n_pps"] == 1
    assert p["n_idr"] == 1 and p["n_slices"] == 3
    assert p["width"] == 640 and p["height"] == 480
    assert p["profile"] == "Baseline" and p["level"] == "3"
    assert p["fps"] == 0.0  # no VUI timing


def test_h264_avcc_roundtrip():
    sps = cm.build_h264_sps(
        width=1280, height=720, profile_idc=77, level_idc=31, fps=60.0
    )
    p = cm.parse_avcc(cm.build_avcc(sps))
    assert (p["width"], p["height"]) == (1280, 720)
    assert p["profile"] == "Main" and p["level"] == "3.1"
    assert p["nal_length_size"] == 4
    assert abs(p["fps"] - 60.0) < 5e-4


def test_h264_malformed_named_errors():
    with pytest.raises(ValueError, match="no Annex-B start codes"):
        cm.probe_h264(b"\xff" * 16)
    with pytest.raises(ValueError, match="no SPS"):
        cm.probe_h264(cm.build_annexb([b"\x68\xce\x38\x80"]))
    sps = cm.build_h264_sps(width=320, height=240)
    with pytest.raises(ValueError, match="nal_unit_type"):
        cm.parse_h264_sps(b"\x68" + sps[1:])
    with pytest.raises(ValueError, match="truncated bitstream"):
        cm.parse_h264_sps(sps[:4])
    with pytest.raises(ValueError, match="configurationVersion"):
        cm.parse_avcc(b"\x02" + cm.build_avcc(sps)[1:])
    with pytest.raises(ValueError, match="truncated SPS"):
        cm.parse_avcc(cm.build_avcc(sps)[: 6 + 2 + 3])


def test_h264_emulation_prevention_escape_unescape():
    """The RBSP escape/unescape pair (ISO 14496-10 7.4.1): every
    00 00 {00,01,02,03} run gains an emulation-prevention 0x03 on
    encode and loses it exactly on decode."""
    cases = [
        b"\x00\x00\x01",
        b"\x00\x00\x00\x00\x00",
        b"\x00\x00\x03",        # data byte 03 also needs protection
        b"\x7f\x00\x00\x02\x40",
        b"\x00" * 16,
        bytes(range(256)),
    ]
    for raw in cases:
        esc = cm._rbsp_escape(raw)
        # no start-code emulation (00 00 00/01/02) survives; 00 00 03
        # is the emulation-prevention byte itself and is legal
        assert not any(
            esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2
            for i in range(len(esc) - 2)
        )
        assert cm._rbsp_unescape(esc) == raw
    assert cm._rbsp_escape(b"\x00\x00\x01") == b"\x00\x00\x03\x01"


@settings(max_examples=80, deadline=None)
@given(raw=st.binary(min_size=0, max_size=64))
def test_h264_rbsp_escape_fuzz_roundtrip(raw):
    esc = cm._rbsp_escape(raw)
    assert cm._rbsp_unescape(esc) == raw
    assert not any(
        esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2
        for i in range(len(esc) - 2)
    )


@settings(max_examples=60, deadline=None)
@given(
    w_mbs=st.integers(1, 480),
    h_mbs=st.integers(1, 270),
    crop_w=st.integers(0, 7),
    crop_h=st.integers(0, 7),
    profile=st.sampled_from([66, 77, 100, 110, 122, 244]),
    level=st.sampled_from([10, 21, 30, 31, 40, 41, 51, 62]),
    fps=st.one_of(
        st.none(), st.sampled_from([23.976, 24.0, 25.0, 29.97, 30.0, 60.0])
    ),
    frame_mbs_only=st.sampled_from([1, 0]),
)
def test_h264_sps_fuzz_roundtrip(
    w_mbs, h_mbs, crop_w, crop_h, profile, level, fps, frame_mbs_only
):
    # express the target size in crop units so the builder accepts it
    cw = 2  # 4:2:0 SubWidthC
    chh = 2 * (2 - frame_mbs_only)
    width = w_mbs * 16 - crop_w * cw
    height = h_mbs * 16 * (2 - frame_mbs_only) - crop_h * chh
    if width <= 0 or height <= 0:
        return
    sps = cm.build_h264_sps(
        width=width, height=height, profile_idc=profile, level_idc=level,
        fps=fps, frame_mbs_only=frame_mbs_only,
    )
    p = cm.parse_h264_sps(sps)
    assert p["width"] == width and p["height"] == height
    assert p["profile_idc"] == profile
    assert p["level"] == f"{level // 10}.{level % 10}".removesuffix(".0")
    assert p["frame_mbs_only"] == frame_mbs_only
    if fps is None:
        assert p["fps"] == 0.0
    else:
        assert abs(p["fps"] - fps) < 5e-4
    # the avcC wrap parses to the same fields
    pa_ = cm.parse_avcc(cm.build_avcc(sps))
    assert pa_["width"] == width and pa_["height"] == height


def test_h264_inside_mp4_stsd():
    sps = cm.build_h264_sps(
        width=1920, height=1080, profile_idc=100, level_idc=42, fps=24.0
    )
    trak = cm.build_mp4_track(
        handler="vide", timescale=24000, sample_deltas=[(48, 1000)],
        fixed_sample_size=900,
        stsd_entry=cm.build_avc1_entry(
            cm.build_avcc(sps), width=1920, height=1080
        ),
    )
    mp4 = cm.build_mp4(b"mdatbytes", extra_moov_children=trak)
    (v,) = cm.probe_mp4_tracks(mp4)
    assert v["codec"] == "avc1"
    h = v["h264"]
    assert (h["width"], h["height"]) == (1920, 1080)
    assert h["profile"] == "High" and h["level"] == "4.2"
    assert abs(h["fps"] - 24.0) < 5e-4
    # tracks without an stsd keep the stable schema (codec = "")
    plain = cm.build_mp4(
        b"x", extra_moov_children=cm.build_mp4_track(fixed_sample_size=10)
    )
    (t,) = cm.probe_mp4_tracks(plain)
    assert t["codec"] == "" and "h264" not in t


def test_h264_inside_mkv_codec_private():
    sps = cm.build_h264_sps(
        width=1280, height=720, profile_idc=77, level_idc=31, fps=50.0
    )
    mkv = cm.build_mkv(
        tracks=[
            {"type": "video", "codec_id": "V_MPEG4/ISO/AVC",
             "width": 1280, "height": 720,
             "codec_private": cm.build_avcc(sps)},
            {"type": "audio", "codec_id": "A_OPUS", "samplerate": 48000.0,
             "channels": 2},
        ],
    )
    p = cm.probe_mkv(mkv)
    v, a = p["tracks"]
    assert v["codec_id"] == "V_MPEG4/ISO/AVC"
    h = v["h264"]
    assert (h["width"], h["height"]) == (1280, 720)
    assert h["profile"] == "Main" and abs(h["fps"] - 50.0) < 5e-4
    assert "h264" not in a
    # the privacy scrub must not disturb CodecPrivate
    assert cm.probe_mkv(cm.strip_mkv_meta(mkv))["tracks"] == p["tracks"]


# --- H.265 / HEVC SPS probe --------------------------------------------------


def test_h265_sps_exact():
    sps = cm.build_h265_sps(
        width=3840, height=2160, profile_idc=2, level_idc=153,
        bit_depth=10, tier=1,
    )
    p = cm.parse_h265_sps(sps)
    assert (p["width"], p["height"]) == (3840, 2160)
    assert p["profile"] == "Main 10" and p["tier"] == "High"
    assert p["level"] == "5.1"
    assert p["bit_depth_luma"] == 10 and p["bit_depth_chroma"] == 10
    assert p["chroma_format"] == "4:2:0"


def test_h265_conformance_window_crop():
    # 1920x1080 coded, 1x1 chroma-unit crop right/bottom -> 1918x1078
    p = cm.parse_h265_sps(
        cm.build_h265_sps(width=1918, height=1078, crop=(0, 1, 0, 1))
    )
    assert (p["width"], p["height"]) == (1918, 1078)


def test_h265_hvcc_and_containers():
    sps = cm.build_h265_sps(width=1280, height=720, level_idc=120)
    h = cm.parse_hvcc(cm.build_hvcc(sps))
    assert (h["width"], h["height"]) == (1280, 720)
    assert h["level"] == "4.0" and h["nal_length_size"] == 4
    # MKV CodecPrivate
    mkv = cm.build_mkv(
        tracks=[{"type": "video", "codec_id": "V_MPEGH/ISO/HEVC",
                 "width": 1280, "height": 720,
                 "codec_private": cm.build_hvcc(sps)}],
    )
    (tr,) = cm.probe_mkv(mkv)["tracks"]
    assert tr["h265"]["width"] == 1280 and tr["h265"]["profile"] == "Main"
    # MP4 stsd: reuse the avc1 VisualSampleEntry layout with hvc1 fourcc
    entry = cm.build_avc1_entry(b"", width=1280, height=720)
    body = entry[8:]  # strip size+type, keep 78-byte body + child atom
    hvc1 = cm._atom(b"hvc1", body[:78] + cm._atom(b"hvcC", cm.build_hvcc(sps)))
    trak = cm.build_mp4_track(
        handler="vide", fixed_sample_size=100, stsd_entry=hvc1
    )
    (v,) = cm.probe_mp4_tracks(cm.build_mp4(b"x", extra_moov_children=trak))
    assert v["codec"] == "hvc1"
    assert v["h265"]["width"] == 1280 and v["h265"]["bit_depth_luma"] == 8


def test_h265_malformed_named_errors():
    sps = cm.build_h265_sps(width=640, height=360)
    with pytest.raises(ValueError, match="nal_unit_type"):
        cm.parse_h265_sps(bytes([32 << 1, 1]) + sps[2:])
    with pytest.raises(ValueError, match="truncated bitstream"):
        cm.parse_h265_sps(sps[:6])
    with pytest.raises(ValueError, match="configurationVersion"):
        cm.parse_hvcc(b"\x02" + cm.build_hvcc(sps)[1:])
    with pytest.raises(ValueError, match="no SPS NAL array"):
        cm.parse_hvcc(bytes([1]) + bytes(20) + bytes([3, 0]))


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(2, 8192),
    h=st.integers(2, 4320),
    prof=st.sampled_from([1, 2, 3, 4]),
    lvl=st.sampled_from([30, 60, 63, 90, 120, 123, 150, 153, 156, 180, 183]),
    tier=st.integers(0, 1),
    depth=st.sampled_from([8, 10, 12]),
    crop_r=st.integers(0, 3),
    crop_b=st.integers(0, 3),
)
def test_h265_sps_fuzz_roundtrip(w, h, prof, lvl, tier, depth, crop_r, crop_b):
    sps = cm.build_h265_sps(
        width=w, height=h, profile_idc=prof, level_idc=lvl, tier=tier,
        bit_depth=depth, crop=(0, crop_r, 0, crop_b),
    )
    p = cm.parse_h265_sps(sps)
    assert (p["width"], p["height"]) == (w, h)
    assert p["profile_idc"] == prof
    assert p["level"] == f"{lvl // 30}.{(lvl % 30) // 3}"
    assert p["tier"] == ("High" if tier else "Main")
    assert p["bit_depth_luma"] == depth
    pv = cm.parse_hvcc(cm.build_hvcc(sps))
    assert (pv["width"], pv["height"]) == (w, h)


# --- AV1 sequence-header probe ------------------------------------------------


def test_av1_sequence_header_exact():
    obu = cm.build_av1_sequence_header(
        width=1920, height=1080, level_idx=12, fps=30.0
    )
    p = cm.parse_av1_sequence_header(obu)
    assert (p["width"], p["height"]) == (1920, 1080)
    assert p["profile"] == "Main" and p["level"] == "5.0"
    assert p["fps"] == 30.0 and p["tier"] == "Main"


def test_av1c_and_containers():
    obu = cm.build_av1_sequence_header(
        width=3840, height=2160, profile=2, level_idx=16, tier=1
    )
    rec = cm.build_av1c(
        obu, profile=2, level_idx=16, tier=1, high_bitdepth=1, twelve_bit=1
    )
    p = cm.parse_av1c(rec)
    assert (p["width"], p["height"]) == (3840, 2160)
    assert p["profile"] == "Professional" and p["bit_depth"] == 12
    assert p["level"] == "6.0" and p["tier"] == "High"
    # MKV V_AV1 CodecPrivate
    mkv = cm.build_mkv(
        tracks=[{"type": "video", "codec_id": "V_AV1", "width": 3840,
                 "height": 2160, "codec_private": rec}],
    )
    (tr,) = cm.probe_mkv(mkv)["tracks"]
    assert tr["av1"]["width"] == 3840 and tr["av1"]["bit_depth"] == 12
    # MP4 av01 sample entry
    entry = cm.build_avc1_entry(b"", width=3840, height=2160)
    av01 = cm._atom(b"av01", entry[8:][:78] + cm._atom(b"av1C", rec))
    trak = cm.build_mp4_track(
        handler="vide", fixed_sample_size=64, stsd_entry=av01
    )
    (v,) = cm.probe_mp4_tracks(cm.build_mp4(b"x", extra_moov_children=trak))
    assert v["codec"] == "av01" and v["av1"]["height"] == 2160


def test_av1_malformed_named_errors():
    obu = cm.build_av1_sequence_header(width=640, height=360)
    with pytest.raises(ValueError, match="obu_type"):
        cm.parse_av1_sequence_header(bytes([0x32]) + obu[1:])
    with pytest.raises(ValueError, match="marker/version"):
        cm.parse_av1c(b"\x01" + cm.build_av1c(obu)[1:])
    with pytest.raises(ValueError, match="truncated leb128"):
        cm.parse_av1_sequence_header(obu[:1] + b"\xff")
    with pytest.raises(ValueError, match="decoder_model_info"):
        # timing info present AND decoder_model_info_present set
        w = cm._BitWriter()
        w.u(0, 3); w.u(0, 1); w.u(0, 1)
        w.u(1, 1); w.u(1000, 32); w.u(30000, 32); w.u(0, 1)  # timing, no EPI
        w.u(1, 1)  # decoder_model_info_present
        cm.parse_av1_sequence_header(bytes([0x08]) + w.rbsp())


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 65536),
    h=st.integers(1, 65536),
    prof=st.integers(0, 2),
    lvl=st.integers(0, 23),
    tier=st.integers(0, 1),
    fps=st.one_of(st.none(), st.sampled_from([24.0, 25.0, 30.0, 60.0, 120.0])),
)
def test_av1_fuzz_roundtrip(w, h, prof, lvl, tier, fps):
    obu = cm.build_av1_sequence_header(
        width=w, height=h, profile=prof, level_idx=lvl, tier=tier, fps=fps
    )
    p = cm.parse_av1_sequence_header(obu)
    assert (p["width"], p["height"]) == (w, h)
    assert p["profile_idc"] == prof
    assert p["level"] == f"{lvl // 4 + 2}.{lvl % 4}"
    if lvl > 7:
        assert p["tier"] == ("High" if tier else "Main")
    assert p["fps"] == (fps or 0.0)
    pv = cm.parse_av1c(cm.build_av1c(obu, profile=prof, level_idx=lvl))
    assert (pv["width"], pv["height"]) == (w, h)


# ---------------------------------------------------------------------------
# Ogg Opus (RFC 7845)
# ---------------------------------------------------------------------------


def test_opus_probe_exact():
    ogg = cm.build_ogg_opus(
        channels=2, input_rate=44100, pre_skip=312,
        tags={"ARTIST": "Band", "GEO_LOCATION": "37.77,-122.41"},
        n_audio_pages=3, granules_per_page=960,
    )
    m = cm.probe_opus(ogg)
    assert m["channels"] == 2
    assert m["input_sample_rate"] == 44100
    assert m["pre_skip"] == 312
    assert m["output_gain_db"] == 0.0
    assert m["mapping_family"] == 0
    assert m["vendor"] == "ebw-test"
    assert m["comments"]["GEO_LOCATION"] == "37.77,-122.41"
    # granules are 48 kHz ticks regardless of input rate; pre-skip is
    # trimmed (the builder bakes it into the granule positions)
    assert abs(m["duration_sec"] - 3 * 960 / 48000) < 1e-12


def test_opus_strip_tags_preserves_audio_pages():
    ogg = cm.build_ogg_opus(
        tags={"ARTIST": "x", "GEO_LOCATION": "1,2", "TITLE": "keepme"},
        n_audio_pages=4,
    )
    clean = cm.strip_opus_tags(ogg)
    m = cm.probe_opus(clean)
    assert m["comments"] == {} and m["vendor"] == ""
    kept = cm.probe_opus(cm.strip_opus_tags(ogg, keep=("TITLE",)))
    assert kept["comments"] == {"TITLE": "keepme"}
    # pages 2.. (audio) byte-identical; stream params untouched
    assert ogg.split(b"OggS")[3:] == clean.split(b"OggS")[3:]
    assert m["channels"] == 2 and m["pre_skip"] == 312


def test_opus_malformed_named_errors():
    with pytest.raises(ValueError, match="no Opus BOS page"):
        cm.probe_opus(cm.build_ogg_vorbis())  # Vorbis is not Opus
    ogg = bytearray(cm.build_ogg_opus())
    ogg[-1] ^= 0xFF
    with pytest.raises(ValueError, match="page CRC mismatch"):
        cm.probe_opus(bytes(ogg))
    # major version nibble must be 0
    bad = cm.build_ogg_opus()
    head_at = bad.find(b"OpusHead")
    bad = bytearray(bad)
    bad[head_at + 8] = 0x10
    # re-CRC the tampered page so the version check (not CRC) fires
    seg0_end = bad.find(b"OggS", 4)
    page = bytearray(bad[:seg0_end])
    page[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", page, 22, cm._ogg_crc(bytes(page)))
    bad[:seg0_end] = page
    with pytest.raises(ValueError, match="OpusHead version"):
        cm.probe_opus(bytes(bad))


@given(
    n_tags=st.integers(0, 6),
    n_audio=st.integers(1, 5),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    ch=st.integers(1, 8),
    pre_skip=st.integers(0, 3840),
    gpp=st.integers(120, 5760),
)
@settings(max_examples=40, deadline=None)
def test_opus_fuzz_roundtrip(n_tags, n_audio, rate, ch, pre_skip, gpp):
    tags = {f"K{i}": f"v-{i}" for i in range(n_tags)}
    ogg = cm.build_ogg_opus(
        channels=ch, input_rate=rate, pre_skip=pre_skip, tags=tags,
        n_audio_pages=n_audio, granules_per_page=gpp,
    )
    m = cm.probe_opus(ogg)
    assert m["channels"] == ch
    assert m["input_sample_rate"] == rate
    assert m["pre_skip"] == pre_skip
    assert m["comments"] == tags
    assert abs(m["duration_sec"] - n_audio * gpp / 48000) < 1e-12
    clean = cm.strip_opus_tags(ogg)
    mc = cm.probe_opus(clean)
    assert mc["comments"] == {} and mc["duration_sec"] == m["duration_sec"]


def test_probe_video_streams_wrapper(spark):
    """DataFrame-level video probe: all four carrier kinds parse, and
    malformed payloads / unknown kinds become error ROWS (never a task
    failure) — the corruption-as-rows discipline."""
    from entropy_balance_weighting_spark.functions.multimodal import (
        probe_video_streams,
    )

    sps264 = cm.build_h264_sps(width=640, height=360)
    rows = [
        (0, "h264", cm.build_annexb([sps264, b"\x68\xce\x38\x80"])),
        (1, "avcc", cm.build_avcc(sps264)),
        (2, "hvcc", cm.build_hvcc(cm.build_h265_sps(width=1280, height=720))),
        (3, "av1c", cm.build_av1c(
            cm.build_av1_sequence_header(width=320, height=240))),
        (4, "hvcc", b"\x00bad"),          # malformed -> error row
        (5, "mpeg2", b"\x00\x00\x01\xb3"),  # unknown kind -> error row
    ]
    df = spark.createDataFrame(
        [(i, k, bytearray(p)) for i, k, p in rows],
        "doc_id long, kind string, payload binary",
    )
    got = {r["doc_id"]: r for r in probe_video_streams(df).collect()}
    assert (got[0]["codec"], got[0]["width"], got[0]["height"]) == (
        "h264", 640, 360)
    assert got[1]["codec"] == "h264" and got[1]["width"] == 640
    assert (got[2]["codec"], got[2]["width"], got[2]["profile"]) == (
        "hevc", 1280, "Main")
    assert (got[3]["codec"], got[3]["width"], got[3]["level"]) == (
        "av1", 320, "4.0")
    assert got[4]["error"] is not None and got[4]["codec"] == "hevc"
    assert got[5]["error"] is not None and "unknown stream kind" in got[5]["error"]
    assert all(got[i]["error"] is None for i in (0, 1, 2, 3))


def test_probe_video_streams_null_payload_is_error_row(spark):
    from entropy_balance_weighting_spark.functions.multimodal import (
        probe_video_streams,
    )

    df = spark.createDataFrame(
        [(0, "h264", bytearray(b"")), (1, "hvcc", None)],
        "doc_id long, kind string, payload binary",
    )
    got = {r["doc_id"]: r for r in probe_video_streams(df).collect()}
    assert got[1]["error"] == "null payload" and got[1]["codec"] == "hevc"
    assert got[0]["error"] is not None  # empty payload: parse error row
