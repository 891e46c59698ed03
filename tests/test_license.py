"""License detection (text.detect_license): SPDX precedence, phrase
family ordering (LGPL/AGPL before generic GPL), and the unknown
fallback."""

from __future__ import annotations

from entropy_balance_weighting_spark.functions.text import detect_license


def _det(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    return [
        r["l"]
        for r in df.select("i", detect_license("t").alias("l"))
        .orderBy("i")
        .collect()
    ]


def test_spdx_wins_over_phrases(spark):
    out = _det(
        spark,
        [
            # SPDX tag beats a conflicting phrase in the same document
            "SPDX-License-Identifier: GPL-2.0-only\n"
            "Permission is hereby granted, free of charge",
            "SPDX-License-Identifier: MIT",
        ],
    )
    assert out == ["GPL-2.0-only", "MIT"]


def test_family_ordering_and_fallback(spark):
    out = _det(
        spark,
        [
            "GNU Lesser General Public License version 3",
            "GNU Affero General Public License version 3",
            "GNU General Public License ... either version 3 of",
            "GNU GENERAL PUBLIC LICENSE\n Version 2, June 1991",
            "Redistribution and use in source and binary forms",
            "This is free and unencumbered software released into the "
            "public domain",
            "no license words here",
            "",
        ],
    )
    assert out == [
        "LGPL",
        "AGPL-3.0",
        "GPL-3.0",
        "GPL-2.0",
        "BSD",
        "Unlicense",
        "unknown",
        "unknown",
    ]
