"""Subtitle parsing (functions/subtitles.py): SRT/WebVTT cue recovery,
dirty-input tolerance, the timestamp round trip, and derived signals —
all JVM expressions (the registered query is plan-linted)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import subtitles as sub


def _cues(spark, payload, parser):
    return spark.createDataFrame([(payload,)], "t string").select(
        parser("t").alias("c")
    ).first()["c"]


_SRT = (
    "1\n00:00:01,000 --> 00:00:02,500\nHello there\n\n"
    "2\n00:00:03,000 --> 00:00:04,250\nSecond line\nwraps here\n\n"
    "3\n01:02:03,456 --> 01:02:04,000\nbye\n"
)

_VTT = (
    "WEBVTT - with a comment\n\n"
    "NOTE\nthis block is not a cue\n\n"
    "intro-cue\n00:00:01.000 --> 00:00:02.500 align:start position:0%\n"
    "Hello there\n\n"
    "00:00:03.000 --> 00:00:04.250\nSecond line\nwraps here\n"
)


def test_srt_basic(spark):
    cues = _cues(spark, _SRT, sub.srt_cues)
    assert len(cues) == 3
    assert cues[0]["seq"] == 1
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 2500
    assert cues[1]["text"] == "Second line\nwraps here"
    assert cues[2]["start_ms"] == 3723456


def test_vtt_skips_non_cue_blocks_and_settings(spark):
    cues = _cues(spark, _VTT, sub.vtt_cues)
    assert len(cues) == 2
    assert cues[0]["seq"] is None
    # identifier line is not cue text; settings after end time ignored
    assert cues[0]["text"] == "Hello there"
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 2500
    assert cues[1]["text"] == "Second line\nwraps here"


def test_sniffing_dispatch(spark):
    assert len(_cues(spark, _SRT, sub.subtitle_cues)) == 3
    assert len(_cues(spark, _VTT, sub.subtitle_cues)) == 2


def test_dirty_input_tolerance(spark):
    dirty = (
        "garbage header\n\n"
        "not-a-number\n99:59:59,999 --> 100:00:00,000\nlong recording\n\n"
        "5\nbroken --> timing\nskipped\n\n"
        "\n\n"
        "6\n00:00:07.100 --> 00:00:08,200\ndot-comma mix\r\ncrlf text\n"
    )
    cues = _cues(spark, dirty, sub.srt_cues)
    assert len(cues) == 2
    assert cues[0]["seq"] is None  # non-numeric index -> null, cue kept
    assert cues[0]["start_ms"] == 359999999
    assert cues[0]["end_ms"] == 360000000  # 3-digit hours
    assert cues[1]["seq"] == 6
    assert cues[1]["start_ms"] == 7100
    assert cues[1]["text"] == "dot-comma mix\ncrlf text"
    assert _cues(spark, "", sub.srt_cues) == []
    assert _cues(spark, "WEBVTT\n", sub.vtt_cues) == []


def test_derived_signals(spark):
    row = (
        spark.createDataFrame([(_SRT,)], "t string")
        .select(sub.srt_cues("t").alias("c"))
        .select(
            sub.subtitle_text(F.col("c"), " ").alias("txt"),
            sub.subtitle_span_ms(F.col("c")).alias("span"),
        )
        .first()
    )
    assert row["txt"] == "Hello there Second line\nwraps here bye"
    assert row["span"] == 1500 + 1250 + 544


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 359_999_000),  # start ms (fits HH:MM:SS)
            st.integers(1, 60_000),  # duration ms
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters="\r\n",
                ),
                min_size=1,
                max_size=40,
            ).filter(lambda t: t.strip() and "-->" not in t),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_srt_build_parse_roundtrip(cues):
    """format_srt_timestamp → srt_cues recovers every (start, end, text)
    exactly — one Spark-side property run per example set, driven
    through a single DataFrame to keep the fuzz fast."""
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(
        app_name="ebw_tests", master="local[4]", shuffle_partitions=4
    )
    df = spark.createDataFrame(
        [(i, s, s + d, t) for i, (s, d, t) in enumerate(cues)],
        "i int, s long, e long, t string",
    )
    built = df.select(
        F.concat(
            (F.col("i") + 1).cast("string"),
            F.lit("\n"),
            sub.format_srt_timestamp(F.col("s")),
            F.lit(" --> "),
            sub.format_srt_timestamp(F.col("e")),
            F.lit("\n"),
            F.col("t"),
        ).alias("block"),
        F.col("i"),
    )
    out = built.select(
        F.col("i"), sub.srt_cues(F.col("block")).alias("c")
    ).collect()
    got = {r["i"]: r["c"] for r in out}
    for i, (s, d, t) in enumerate(cues):
        (cue,) = got[i]
        assert cue["seq"] == i + 1
        assert cue["start_ms"] == s and cue["end_ms"] == s + d
        # block-level trim strips trailing Java-\s whitespace from the
        # last text line (and nothing else)
        import re

        assert cue["text"] == re.sub(r"[ \t\x0b\f]+$", "", t)
