"""Product quantization (functions/similarity.py fit_pq/pq_encode/
pq_topk): codebook shape + determinism, byte-packed codes, ADC top-k
recall vs the exact cosine baseline, and the numpy cross-check of the
distributed encode/scan arithmetic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import similarity as sim


def _clustered(n=1200, d=64, n_clusters=12, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    x = centers[rng.integers(n_clusters, size=n)] + 0.15 * rng.normal(
        size=(n, d)
    )
    return x.astype(np.float64)


@pytest.fixture(scope="module")
def corpus(spark):
    x = _clustered()
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    yield df, x
    df.unpersist()


def test_fit_shape_and_determinism(corpus):
    df, _ = corpus
    cb1 = sim.fit_pq(df, m=8, k=16, seed=3)
    cb2 = sim.fit_pq(df, m=8, k=16, seed=3)
    assert cb1.shape == (8, 16, 8)
    assert np.array_equal(cb1, cb2)
    assert not np.array_equal(cb1, sim.fit_pq(df, m=8, k=16, seed=4))


def test_fit_validation(corpus, spark):
    df, _ = corpus
    with pytest.raises(ValueError, match="not divisible"):
        sim.fit_pq(df, m=7)
    with pytest.raises(ValueError, match="one byte"):
        sim.fit_pq(df, m=8, k=300)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        sim.fit_pq(empty, m=8, k=4)


def test_encode_codes_are_byte_packed_and_match_numpy(corpus):
    df, x = corpus
    cb = sim.fit_pq(df, m=8, k=16, seed=3)
    codes = {
        r["vec_id"]: bytes(r["pq_code"])
        for r in sim.pq_encode(df, cb).collect()
    }
    assert len(codes) == len(x)
    assert all(len(c) == 8 for c in codes.values())
    # numpy reference encode of a few rows
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    for i in (0, 17, 555):
        want = bytes(
            int(((cb[j] - u[i, j * 8 : (j + 1) * 8]) ** 2).sum(1).argmin())
            for j in range(8)
        )
        assert codes[i] == want


def test_adc_topk_recall_vs_exact(corpus):
    df, x = corpus
    cb = sim.fit_pq(df, m=8, k=32, seed=3)
    codes = sim.pq_encode(df, cb).cache()
    codes.count()
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    try:
        recalls = []
        for qi in (5, 123, 777):
            exact = set(np.argsort(-(u @ u[qi]))[:10].tolist())
            # PQ's production contract is SHORTLIST recall: ADC ranks a
            # candidate set, an exact re-rank orders it (within-cluster
            # points share codes, so ADC top-10 alone is tie-dominated)
            short = [
                r["vec_id"]
                for r in sim.pq_topk(codes, cb, x[qi], k=100).collect()
            ]
            assert len(short) == 100
            recalls.append(len(exact & set(short)) / 10)
        assert sum(recalls) / len(recalls) >= 0.8, recalls
        # rank-0 sanity: the query's own vector is its nearest neighbor
        top = sim.pq_topk(codes, cb, x[5], k=1).first()
        assert top["adc_dist"] < 0.5
    finally:
        codes.unpersist()


def test_adc_distance_matches_table_lookup(corpus):
    """The distributed ADC scan equals the driver-side numpy ADC —
    catches byte-order / reshape slips in the compressed scan."""
    df, x = corpus
    cb = sim.fit_pq(df, m=8, k=16, seed=3)
    codes_df = sim.pq_encode(df, cb)
    q = x[42]
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in sim.pq_topk(codes_df, cb, q, k=50).collect()
    }
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    qq = q / np.linalg.norm(q)
    codes = {r["vec_id"]: bytes(r["pq_code"]) for r in codes_df.collect()}
    table = np.stack(
        [((cb[j] - qq[j * 8 : (j + 1) * 8]) ** 2).sum(1) for j in range(8)]
    )
    for vid, dist in got.items():
        want = sum(table[j, codes[vid][j]] for j in range(8))
        assert abs(dist - want) < 1e-9


def test_quantization_error_shrinks_with_k(corpus):
    df, x = corpus
    u = x / np.linalg.norm(x, axis=1, keepdims=True)

    def mse(k):
        cb = sim.fit_pq(df, m=8, k=k, seed=3)
        codes = {
            r["vec_id"]: np.frombuffer(bytes(r["pq_code"]), dtype=np.uint8)
            for r in sim.pq_encode(df, cb).collect()
        }
        rec = np.stack(
            [
                np.concatenate([cb[j, codes[i][j]] for j in range(8)])
                for i in range(len(u))
            ]
        )
        return float(((u - rec) ** 2).sum(axis=1).mean())

    assert mse(32) < mse(4) * 0.5


def test_pq_codebook_persistence_roundtrip(corpus, tmp_path):
    """save_quantizer/load_quantizer are shape-generic: the (m, k, ds)
    PQ codebook persists through the same JSON artifact as the IVF
    centroids."""
    df, _ = corpus
    cb = sim.fit_pq(df, m=8, k=16, seed=3)
    p = str(tmp_path / "pq.json")
    sim.save_quantizer(cb, p)
    back = sim.load_quantizer(p)
    assert back.shape == cb.shape
    assert np.array_equal(back, cb)


def test_ivfpq_index_and_search(corpus):
    """IVF+PQ: the one-pass index carries correct cells and codes, the
    cell filter prunes candidate volume by ~n_probe/C, and shortlist
    recall vs exact cosine stays high on clustered data."""
    df, x = corpus
    centers = sim.fit_ivf_quantizer(df, n_cells=12, seed=5)
    cb = sim.fit_pq(df, m=8, k=32, seed=3)
    idx = sim.build_ivfpq_index(df, centers, cb).cache()
    try:
        assert idx.count() == len(x)
        # codes identical to the PQ-only encode; cells identical to the
        # IVF assignment arithmetic
        codes_only = {
            r["vec_id"]: bytes(r["pq_code"])
            for r in sim.pq_encode(df, cb).collect()
        }
        import numpy as np

        cent = np.asarray(centers)
        u = x / np.linalg.norm(x, axis=1, keepdims=True)
        want_cells = (
            u @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]
        ).argmax(1)
        for r in idx.collect():
            assert bytes(r["pq_code"]) == codes_only[r["vec_id"]]
            assert r["cell"] == want_cells[r["vec_id"]]

        # search: pruned candidate volume + shortlist recall
        recalls = []
        for qi in (5, 123, 777):
            exact = set(np.argsort(-(u @ u[qi]))[:10].tolist())
            short = [
                r["vec_id"]
                for r in sim.pq_topk_ivf(
                    idx, centers, cb, x[qi], n_probe=4, k=100
                ).collect()
            ]
            assert len(short) <= 100
            recalls.append(len(exact & set(short)) / 10)
        assert sum(recalls) / len(recalls) >= 0.7, recalls
        # n_probe=C degenerates to the full PQ scan (same top ids)
        full = [
            r["vec_id"]
            for r in sim.pq_topk(
                idx.select("vec_id", "pq_code"), cb, x[5], k=20
            ).collect()
        ]
        allp = [
            r["vec_id"]
            for r in sim.pq_topk_ivf(
                idx, centers, cb, x[5], n_probe=12, k=20
            ).collect()
        ]
        assert full == allp
    finally:
        idx.unpersist()


def test_batched_adc_matches_single_query(corpus):
    df, x = corpus
    cb = sim.fit_pq(df, m=8, k=16, seed=3)
    codes = sim.pq_encode(df, cb).cache()
    codes.count()
    try:
        qs = [x[5], x[123], x[777]]
        batch = sim.pq_topk_batch(codes, cb, qs, k=15).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["vec_id"], r["adc_dist"])
            )
        assert set(by_q) == {0, 1, 2}
        for qi, qv in enumerate(qs):
            single = [
                (r["vec_id"], r["adc_dist"])
                for r in sim.pq_topk(codes, cb, qv, k=15).collect()
            ]
            assert by_q[qi] == single
    finally:
        codes.unpersist()
