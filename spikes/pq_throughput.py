"""Spike: product-quantization throughput at corpus scale — fit,
encode, and compressed-domain ADC scan at N=2M × D=64 (a 1.0 GB
float64 embedding store compressing to 16 MB of codes).

Run:  python spikes/pq_throughput.py [n_rows]
Writes bench_pq_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import similarity as sim
from entropy_balance_weighting_spark.session import get_spark

D = 64
M = 8
K = 256


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="pq_spike")

    def gen(batches):
        import numpy as np
        import pandas as pd

        centers = np.random.default_rng(7).normal(size=(64, D))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            x = centers[ids % 64] + 0.2 * rng.normal(size=(len(ids), D))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(x)}
            )

    emb = (
        spark.range(n, numPartitions=64)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .cache()
    )
    emb.count()  # materialize the store

    # best-of-2 on every stage: single-shot walls on this box swing
    # 2-3x under host-level noise the loadavg gate cannot see (same
    # phenomenon PLANS 13/15 document for the solver bench)
    fits = []
    for _ in range(2):
        t0 = time.time()
        cb = sim.fit_pq(emb, m=M, k=K, seed=3)
        fits.append(time.time() - t0)
    fit_s = min(fits)

    # warm pass, then best-of-2 steady encodes (same discipline as
    # bench.py's cold/steady split — single-shot walls at this size
    # are host-noise-dominated)
    assert sim.pq_encode(emb, cb).count() == n
    encodes = []
    for _ in range(2):
        t0 = time.time()
        n_codes = sim.pq_encode(emb, cb).count()
        encodes.append(time.time() - t0)
        assert n_codes == n
    encode_s = min(encodes)
    codes = sim.pq_encode(emb, cb).cache()
    codes.count()

    # one warm scan, then measured ADC scans
    q = [0.1 * (i % 7) for i in range(D)]
    sim.pq_topk(codes, cb, q, k=10).collect()
    scans = []
    for i in range(3):
        qv = [0.1 * ((i + j) % 9) for j in range(D)]
        t0 = time.time()
        top = sim.pq_topk(codes, cb, qv, k=10).collect()
        scans.append(time.time() - t0)
        assert len(top) == 10
    scan_s = min(scans)

    raw_gb = n * D * 8 / 2**30
    out = {
        "metric": "pq_throughput",
        "n": n,
        "d": D,
        "m": M,
        "k": K,
        "raw_gb": round(raw_gb, 3),
        "code_mb": round(n * M / 2**20, 1),
        "fit_s": round(fit_s, 2),
        "encode_s": round(encode_s, 2),
        "encode_vecs_s": round(n / encode_s, 1),
        "encode_gb_s": round(raw_gb / encode_s, 3),
        "adc_scan_s": round(scan_s, 4),
        "adc_vecs_s": round(n / scan_s, 1),
        "spread": {
            "fit_s": [round(v, 2) for v in sorted(fits)],
            "encode_s": [round(v, 2) for v in sorted(encodes)],
            "adc_scan_s": [round(v, 3) for v in sorted(scans)],
        },
        "loadavg": list(os.getloadavg()),
        "note": (
            "local[32]; scan reads 8-byte codes only (the float64 "
            "store is never touched after encode) — at 100 TB of "
            "embeddings the ADC pass scans ~3 TB of codes."
        ),
    }
    print(json.dumps(out))
    (Path(__file__).resolve().parents[1] / "bench_pq_r10.json").write_text(
        json.dumps(out) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
