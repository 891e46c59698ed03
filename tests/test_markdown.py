"""Markdown → text extraction (functions/markdown.py): construct
coverage, plain-text passthrough, Spark↔DuckDB chain equivalence (the
oracle contract), and the stats profile."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import markdown as md


def _one(spark, s):
    return spark.createDataFrame([(s,)], "md string").select(
        md.strip_markdown("md").alias("v")
    ).first()["v"]


_DOC = """# Title here

Some **bold** and *italic* and _under_ and __dunder__ text.

- item one
- item [two](http://ex.com/2)
1. ordered
2. also ordered

> quoted line
> more quote

```python
code_stays = "but fences go"
```

Inline `code span` and an image ![alt words](img.png) end.

| col a | col b |
| ----- | ----- |
| 1     | 2     |

---
"""


def test_strip_markdown_constructs(spark):
    out = _one(spark, _DOC)
    assert out == (
        "Title here\n"
        "Some bold and italic and under and dunder text.\n"
        "item one\n"
        "item two\n"
        "ordered\n"
        "also ordered\n"
        "quoted line\n"
        "more quote\n"
        'code_stays = "but fences go"\n'
        "Inline code span and an image alt words end.\n"
        "col a col b\n"
        "1 2"
    )


def test_plain_text_passthrough(spark):
    s = "just ordinary words with no markup at all"
    assert _one(spark, s) == s


def test_md_stats(spark):
    df = spark.createDataFrame([(1, _DOC)], "doc_id long, md string")
    row = md.md_stats(df).first()
    assert row["n_links"] == 1
    assert row["n_images"] == 1
    assert row["n_headers"] == 1
    assert row["n_code_spans"] == 1


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("ab c\n#*_`[]()|->!123.") + ["**", "```", "](", "- ", "# "]
        ),
        min_size=0,
        max_size=80,
    ).map("".join)
)
def test_spark_duckdb_chain_equivalence(s):
    """The Spark strip chain and the DuckDB rendering of the SAME chain
    agree byte-for-byte on adversarial markdown-ish soup — the exact
    property the registered query's oracle depends on."""
    import duckdb

    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(
        app_name="ebw_tests", master="local[4]", shuffle_partitions=4
    )
    got_spark = (
        spark.createDataFrame([(s,)], "md string")
        .select(md.strip_markdown("md").alias("v"))
        .first()["v"]
    )
    con = duckdb.connect()
    got_duck = con.execute(
        f"SELECT {md.sql_strip_chain('?')} AS v", [s]
    ).fetchone()[0]
    assert got_spark == got_duck, (s, got_spark, got_duck)
