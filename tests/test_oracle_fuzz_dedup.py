"""Fuzzed oracle parity over the near-dup PAIR pipelines: random corpora
with PLANTED near-duplicate structure (shared passages, shuffled tails,
boilerplate prefixes) — the MinHash banding, shingle inverted-index, and
winnowing fingerprint oracles are the most intricate SQL in the repo,
and their agreement must not depend on the fixed testdata's particular
duplicate layout."""

from __future__ import annotations

import shutil

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE

FUZZ_QUERIES = [
    "dd_minhash_near_dups",
    "dd_ngram_jaccard",
    "dd_winnow_near_dups",
    "dd_dup_clusters",
    "dd_simhash_clusters",
    "txt_winnow_fingerprints",
    "txt_fingerprint_dups",
    "dd_decontaminate",
    # boilerplate-line removal: the planted boilerplate prefixes make
    # shared 2-word lines; below the df threshold the sweep still pins the
    # reassembly-order identity (sort_array struct == string_agg ORDER BY)
    "dd_boilerplate_lines",
    # PII scan: the seeded injection is doc_id arithmetic, so random ids +
    # random text fuzz the regex-parity and redaction-order contract
    "txt_pii_scan",
    # substring spans: the planted near-dups and shared passages create
    # cross-doc 6-gram runs; fuzzes the gram-hash DF plan vs the string-
    # grouped SQL (incl. overlap-merge coverage arithmetic)
    "dd_substring_spans",
]

VOCAB = [f"w{i}" for i in range(40)] + ["the", "of", "héllo", "a.b", "42"]


def _corpus(seed):
    import numpy as np

    rng = np.random.default_rng(seed)

    def nxt(n):
        return int(rng.integers(n))

    def words(k):
        return [VOCAB[nxt(len(VOCAB))] for _ in range(k)]

    boiler = words(12)  # shared boilerplate prefix for some docs
    docs = []
    n_base = 6 + nxt(8)
    for i in range(n_base):
        body = words(15 + nxt(25))
        if nxt(3) == 0:
            body = boiler + body  # boilerplate carriers
        docs.append(body)
        variant = nxt(4)
        if variant == 0:
            # near-dup: mutate a couple of tokens
            v = list(body)
            for _ in range(1 + nxt(2)):
                v[nxt(len(v))] = VOCAB[nxt(len(VOCAB))]
            docs.append(v)
        elif variant == 1:
            # partial overlap: shared passage + fresh tail
            docs.append(body[: len(body) // 2] + words(10 + nxt(10)))
    rows = []
    for i, toks in enumerate(docs):
        text = " ".join(toks)
        rows.append((i, text, "en", f"src{nxt(3)}", len(text)))
    return rows


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9))
def test_near_dup_pairs_match_oracle_on_planted_corpora(
    spark, tmp_path_factory, seed
):
    from entropy_balance_weighting_spark.queries import QUERIES

    tmp = tmp_path_factory.mktemp("fuzz_dd")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", tmp / f"{t}.parquet")
    pdf = pd.DataFrame(
        _corpus(seed),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(tmp / "documents.parquet", index=False)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'")

    for name in FUZZ_QUERIES:
        q = QUERIES[name]
        srows = sorted(
            tuple(f"{v:.9g}" if isinstance(v, float) else repr(v) for v in r)
            for r in q.fn(spark, str(tmp)).collect()
        )
        orows = sorted(
            tuple(f"{v:.9g}" if isinstance(v, float) else repr(v) for v in r)
            for r in con.execute(q.oracle).fetchall()
        )
        assert srows == orows, (name, srows[:3], orows[:3])
    con.close()


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9))
def test_semantic_dedup_matches_oracle_on_planted_embeddings(
    spark, tmp_path_factory, seed
):
    """SemDeDup fuzz: random embedding sets with PLANTED near-parallel
    vectors (small-noise copies) so removals actually fire; the Spark
    argmax-assignment + within-cell greedy must match the SQL mirror on
    every random geometry, including assignment ties broken by cell id."""
    import numpy as np

    from entropy_balance_weighting_spark.queries import QUERIES

    rng = np.random.default_rng(seed)
    n = 20 + int(rng.integers(30))
    dim = 6
    vecs = rng.normal(size=(n, dim))
    # plant near-dup groups: ~1/4 of vectors are noisy copies of earlier ones
    for i in range(n // 4):
        src = int(rng.integers(n - 1))
        dst = src + 1 + int(rng.integers(n - src - 1))
        vecs[dst] = vecs[src] + rng.normal(scale=0.03, size=dim)
    norms = np.linalg.norm(vecs, axis=1)
    vecs[norms < 1e-6] += 1.0  # no zero vectors
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
            "label": (np.arange(n) % 3).astype(np.int32),
        }
    )
    tmp = tmp_path_factory.mktemp("fuzz_sem")
    pdf.to_parquet(tmp / "embeddings.parquet", index=False)
    shutil.copy(f"{SF_SMOKE}/documents.parquet", tmp / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp}/embeddings.parquet'")
    q = QUERIES["dd_semantic_dedup"]
    srows = sorted(
        tuple(f"{v:.9g}" if isinstance(v, float) else repr(v) for v in r)
        for r in q.fn(spark, str(tmp)).collect()
    )
    orows = sorted(
        tuple(f"{v:.9g}" if isinstance(v, float) else repr(v) for v in r)
        for r in con.execute(q.oracle).fetchall()
    )
    assert srows == orows, (srows[:4], orows[:4])
    con.close()
