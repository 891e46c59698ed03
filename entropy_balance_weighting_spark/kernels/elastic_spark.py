"""Distributed kernel for the elastic interior-point solver — split-state
Arrow batches over an RDD ``zip`` (round-7 design, adjudicated by
``spikes/zip_state_spike.py``).

The elastic loop is the only kernel that mutates per-row state every
iteration.  The previous packed-DataFrame design committed by rewriting the
WHOLE row cache — including the immutable CSR columns (idx/val, most of the
bytes): ~3 s/iter of pure cache-write bandwidth at 5M rows (PLANS.md
§"Elastic per-iteration anatomy").  DataFrames cannot narrow-align two
co-partitioned caches (that align is a join = a shuffle per iteration), but
``RDD.zip`` is exactly that narrow pairing, legal here by construction
because the state RDD is derived element-for-element from the base RDD.

Data plane:
  - **base RDD** — one element per Arrow batch: the IPC-serialized
    immutable columns ``(row_id, w0, idx, val)``.  Cached ONCE, never
    rewritten.
  - **state RDD** — IPC batches of the 5 mutable doubles
    ``(ratio, s_lo, s_hi, lm_lo, lm_hi)`` (~40 B/row vs ~150 B/row for
    full packed rows at K=8; the gap widens with K).  Re-cached per
    commit; the hi block is inert (s_hi=1, lm_hi=0) without an upper
    bound.
  - **passes** — ``base.zip(state).mapPartitions(pass_fn)`` where the
    pair batches are reassembled ZERO-COPY (same buffers, one combined
    RecordBatch) and fed to the same ``_estats``/``_estep`` math as
    before; K/K²-sized partials only; commits stay lazy (zero jobs) and
    materialize inside the next stats scan — 2 jobs per iteration, the
    same discipline the job-count pin (tests/test_elastic.py) enforces.

Measured at N=5M, K=8 (solo box): full iteration 4.5–5.5 s vs 7.8–10 s for
the packed-row design — the predicted commit-bandwidth saving.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark import StorageLevel
from pyspark.serializers import BatchedSerializer, CPickleSerializer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.kernels.base import EStats, EStepStats
from entropy_balance_weighting_spark.kernels.penalty_spark import _ftb_batch
from entropy_balance_weighting_spark.kernels.spark import (
    _post_cleanup_gc,
    _flatten_rb,
    _pack_rb,
    _rb_col,
    _x_dot,
    _xt_v,
    blocks_tuple,
    gram_bytes,
    reduce_big,
    gram_from_sums,
    make_gram_accum,
    maybe_elide_idx,
    pack_rows,
)

BASE_NAMES = ["row_id", "w0", "idx", "val"]
STATE_NAMES = ["ratio", "s_lo", "s_hi", "lm_lo", "lm_hi"]

# Both zip sides must carry the IDENTICAL batched serializer: ``RDD.zip``
# falls back to an extra re-serialization pass over BOTH rdds whenever the
# batch sizes differ (pyspark/core/rdd.py, ``zip``), silently turning every
# cached read into cache-read + re-pickle (measured 3.6× slower passes in
# the spike).  Batch size 1 is right regardless: each element is already a
# multi-MB Arrow IPC blob.
_ZIP_SER = BatchedSerializer(CPickleSerializer(), 1)


def _cols(rb: pa.RecordBatch):
    return (
        _rb_col(rb, "w0"),
        _rb_col(rb, "ratio"),
        _rb_col(rb, "s_lo"),
        _rb_col(rb, "s_hi"),
        _rb_col(rb, "lm_lo"),
        _rb_col(rb, "lm_hi"),
    )


def _pieces(rb, flat_idx, flat_val, lens, lam, eta, mu_s, lb, ub, has_ub):
    """Batch rendering of ElasticLocalKernel._pieces (kept in lockstep)."""
    w0, r, s_lo, s_hi, lm_lo, lm_hi = _cols(rb)
    with np.errstate(divide="ignore", invalid="ignore"):
        lr = np.log(r)
    xlam = _x_dot(flat_idx, flat_val, lens, lam)
    lm_net = lm_lo - lm_hi if has_ub else lm_lo
    cd = (1.0 / eta) * w0 * lr - w0 * xlam - lm_net
    ci_lo = r - s_lo - lb
    cs_lo = s_lo * lm_lo - mu_s
    with np.errstate(divide="ignore", invalid="ignore"):
        ht = (1.0 / eta) * w0 / r + lm_lo / s_lo
        zterm = lm_lo / s_lo * (ci_lo + cs_lo / lm_lo)
        if has_ub:
            ci_hi = -r - s_hi + ub
            cs_hi = s_hi * lm_hi - mu_s
            ht = ht + lm_hi / s_hi
            zterm = zterm - lm_hi / s_hi * (ci_hi + cs_hi / lm_hi)
        else:
            ci_hi = np.zeros(len(r))
            cs_hi = np.zeros(len(r))
    return w0, r, s_lo, s_hi, lm_lo, lm_hi, lr, xlam, lm_net, cd, ci_lo, ci_hi, cs_lo, cs_hi, ht, zterm


def _steps_arrays(pieces, flat_idx, flat_val, lens, dlam, mu_s, has_ub):
    (w0, r, s_lo, s_hi, lm_lo, lm_hi, lr, xlam, lm_net, cd,
     ci_lo, ci_hi, cs_lo, cs_hi, ht, zterm) = pieces
    xdl = _x_dot(flat_idx, flat_val, lens, dlam)
    r_step = (1.0 / ht) * (w0 * xdl - cd - zterm)
    li_lo = lm_lo / s_lo * (-r_step - ci_lo - cs_lo / lm_lo)
    ss_lo = -s_lo - s_lo / lm_lo * li_lo + mu_s / lm_lo
    if has_ub:
        li_hi = lm_hi / s_hi * (r_step - ci_hi - cs_hi / lm_hi)
        ss_hi = -s_hi - s_hi / lm_hi * li_hi + mu_s / lm_hi
    else:
        li_hi = np.zeros(len(r_step))
        ss_hi = np.zeros(len(r_step))
    return r_step, li_lo, li_hi, ss_lo, ss_hi


def _estats_pass(k, lam, eta, mu_s, lb, ub, has_ub, blocks) -> Callable:
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        f_val = cd_sq = ci_sq = cs_sq = alt_sq = nan_ct = 0.0
        sl_sum = sl_sq = sl_cnt = 0.0
        sl_min = np.inf
        neg_lm_max = np.inf  # min(−λ) = −max(λ)
        g1 = np.zeros(k)
        rhs_leg = np.zeros(k)
        rhs_mu_leg = np.zeros(k)
        gram, gram_add = make_gram_accum(k, blocks)
        for rb in batches:
            if not rb.num_rows:
                continue
            flat_idx, flat_val, lens = _flatten_rb(rb)
            pieces = _pieces(
                rb, flat_idx, flat_val, lens, lam, eta, mu_s, lb, ub, has_ub
            )
            (w0, r, s_lo, s_hi, lm_lo, lm_hi, lr, xlam, lm_net, cd,
             ci_lo, ci_hi, cs_lo, cs_hi, ht, zterm) = pieces
            bad = ~np.isfinite(cd) | ~np.isfinite(ht) | (ht <= 0)
            cdf = np.where(bad, 0.0, cd)
            lrf = np.where(np.isfinite(lr), lr, 0.0)
            with np.errstate(over="ignore"):
                alt = np.exp(eta * (xlam + lm_net / w0)) - r
            # Overflowing alt residual -> alt_sq=inf, NOT an abort (the
            # reference keeps iterating, ebw_routines.py:586-600); only
            # Cd/ht non-finiteness counts toward nan_ct.
            alt_bad = ~np.isfinite(alt)
            nan_ct += float(bad.sum())
            altf = np.where(alt_bad, 0.0, alt)
            inv_ht = np.where(bad, 0.0, 1.0 / ht)
            f_val += float(np.sum(w0 * (r * lrf - r + 1.0)))
            cd_sq += float(cdf @ cdf)
            ci_sq += float(ci_lo @ ci_lo) + (float(ci_hi @ ci_hi) if has_ub else 0.0)
            cs_sq += float(cs_lo @ cs_lo) + (float(cs_hi @ cs_hi) if has_ub else 0.0)
            alt_sq += np.inf if alt_bad.any() else float(altf @ altf)
            # μ_s decomposition legs + slack/multiplier stats of THIS state
            # (post-commit when a lazy commit is pending — this scan applies
            # it), so the driver updates μ_s/η with no separate pass
            z1 = 1.0 / s_lo - (1.0 / s_hi if has_ub else 0.0)
            sl = s_lo * lm_lo
            lm_mx = float(lm_lo.max())
            if has_ub:
                sl = np.concatenate([sl, s_hi * lm_hi])
                lm_mx = max(lm_mx, float(lm_hi.max()))
            sl_sum += float(np.sum(sl))
            sl_sq += float(sl @ sl)
            sl_cnt += float(len(sl))
            sl_min = min(sl_min, float(sl.min()))
            neg_lm_max = min(neg_lm_max, -lm_mx)
            g1 += _xt_v(flat_idx, flat_val, lens, w0 * r, k)
            rhs_leg += _xt_v(flat_idx, flat_val, lens, w0 * inv_ht * (cdf + zterm), k)
            rhs_mu_leg += _xt_v(flat_idx, flat_val, lens, w0 * inv_ht * z1, k)
            gram_add(flat_idx, flat_val, lens, w0**2 * inv_ht)
        yield _pack_rb(
            [f_val, cd_sq, ci_sq, cs_sq, alt_sq, nan_ct,
             sl_sum, sl_sq, sl_cnt, g1, rhs_leg, rhs_mu_leg, gram],
            [sl_min, neg_lm_max],
        )

    return fn


def _estep_pass(k, lam, dlam, eta, mu_s, lb, ub, has_ub) -> Callable:
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rstep_sq = nan_ct = 0.0
        xt_rstep = np.zeros(k)
        ftb_s = np.inf
        ftb_l = np.inf
        for rb in batches:
            if not rb.num_rows:
                continue
            flat_idx, flat_val, lens = _flatten_rb(rb)
            pieces = _pieces(
                rb, flat_idx, flat_val, lens, lam, eta, mu_s, lb, ub, has_ub
            )
            r_step, li_lo, li_hi, ss_lo, ss_hi = _steps_arrays(
                pieces, flat_idx, flat_val, lens, dlam, mu_s, has_ub
            )
            s_lo, s_hi, lm_lo, lm_hi = pieces[2], pieces[3], pieces[4], pieces[5]
            bad = ~np.isfinite(r_step)
            nan_ct += float(bad.sum())
            rsf = np.where(bad, 0.0, r_step)
            rstep_sq += float(rsf @ rsf)
            xt_rstep += _xt_v(flat_idx, flat_val, lens, rsf, k)
            ftb_s = min(ftb_s, _ftb_batch(s_lo, ss_lo))
            ftb_l = min(ftb_l, _ftb_batch(lm_lo, li_lo))
            if has_ub:
                ftb_s = min(ftb_s, _ftb_batch(s_hi, ss_hi))
                ftb_l = min(ftb_l, _ftb_batch(lm_hi, li_hi))
        yield _pack_rb([rstep_sq, nan_ct, xt_rstep], [ftb_s, ftb_l])

    return fn


def _ipc_ser(rb: pa.RecordBatch) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, rb.schema) as w:
        w.write_batch(rb)
    return sink.getvalue().to_pybytes()


def _ipc_deser(b: bytes) -> pa.RecordBatch:
    return pa.ipc.open_stream(pa.BufferReader(b)).read_next_batch()


def _state_rb(arrays) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [pa.array(np.ascontiguousarray(a, dtype=np.float64)) for a in arrays],
        STATE_NAMES,
    )


def _combined_iter(pair_iter) -> Iterator[pa.RecordBatch]:
    """zip pairs → one combined RecordBatch, zero-copy (same buffers).
    The combined schema inherits the BASE blob's schema (column names AND
    metadata — a dense-elided base has no idx column, and the stamp that
    lets ``_flatten_rb`` resynthesize it must survive the zip)."""
    for bb, sb in pair_iter:
        base_rb = _ipc_deser(bytes(bb))
        st_rb = _ipc_deser(bytes(sb))
        fields = [
            *(base_rb.schema.field(i) for i in range(base_rb.num_columns)),
            *(st_rb.schema.field(i) for i in range(st_rb.num_columns)),
        ]
        yield pa.RecordBatch.from_arrays(
            list(base_rb.columns) + list(st_rb.columns),
            schema=pa.schema(fields, metadata=base_rb.schema.metadata),
        )


def _payload_adapter(pass_fn: Callable) -> Callable:
    """Wrap a combined-batch kernel pass into a zip-pair ``mapPartitions``
    function yielding one ``(sums_bytes, mins_bytes)`` pair per partition."""

    def fn(pair_iter):
        for rb in pass_fn(_combined_iter(pair_iter)):
            yield (
                rb.column(0).to_pylist()[0],
                rb.column(1).to_pylist()[0],
            )

    return fn


def _merge_payload(a, b):
    sums = np.frombuffer(a[0], dtype=np.float64) + np.frombuffer(
        b[0], dtype=np.float64
    )
    mins = np.minimum(
        np.frombuffer(a[1], dtype=np.float64),
        np.frombuffer(b[1], dtype=np.float64),
    )
    return (sums.tobytes(), mins.tobytes())


def _ecommit_state_pass(
    lam, dlam, eta, mu_s, alpha_p, alpha_d, lb, ub, has_ub
) -> Callable:
    """Per-pair commit: recompute the step on the CURRENT state and emit
    only the next state blob — the immutable base columns are never
    rewritten."""

    def fn(pair_iter):
        for rb in _combined_iter(pair_iter):
            flat_idx, flat_val, lens = _flatten_rb(rb)
            pieces = _pieces(
                rb, flat_idx, flat_val, lens, lam, eta, mu_s, lb, ub, has_ub
            )
            r_step, li_lo, li_hi, ss_lo, ss_hi = _steps_arrays(
                pieces, flat_idx, flat_val, lens, dlam, mu_s, has_ub
            )
            _, r, s_lo, s_hi, lm_lo, lm_hi = _cols(rb)
            yield _ipc_ser(
                _state_rb(
                    [
                        r + alpha_p * r_step,
                        s_lo + alpha_p * ss_lo,
                        s_hi + alpha_p * ss_hi if has_ub else s_hi,
                        lm_lo + alpha_d * li_lo,
                        lm_hi + alpha_d * li_hi if has_ub else lm_hi,
                    ]
                )
            )

    return fn


def _g1_pass(k) -> Callable:
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        g1 = np.zeros(k)
        for rb in batches:
            if not rb.num_rows:
                continue
            flat_idx, flat_val, lens = _flatten_rb(rb)
            w0 = _rb_col(rb, "w0")
            r = _rb_col(rb, "ratio")
            g1 += _xt_v(flat_idx, flat_val, lens, w0 * r, k)
        yield _pack_rb([g1], [np.inf])

    return fn


class ElasticSparkKernel:
    _CKPT_EVERY = 8

    def __init__(
        self, base_rdd, state_rdd, spark, k: int, sum_w0: float, n: int,
        lb: float, ub: float, has_ub: bool, block_structure=None,
    ) -> None:
        self._base = base_rdd
        self._state = state_rdd
        self._spark = spark
        self.k = k
        self.sum_w0 = sum_w0
        self.n = n
        self.lb = lb
        self.ub = ub
        self.has_ub = has_ub
        self.block_structure = block_structure
        self._prev = None
        self._commits_since_ckpt = 0

    @classmethod
    def from_problem(
        cls,
        x_long: DataFrame,
        w0: DataFrame,
        k: int,
        *,
        bounds: tuple[float, float | None],
        ratio_guess: DataFrame | None = None,
        moment_groups: list[str] | None = None,
        known_sums: tuple[float, int] | None = None,
        prepacked: DataFrame | None = None,
    ) -> "ElasticSparkKernel":
        df, sum_w0, n = pack_rows(x_long, w0, known_sums, prepacked)
        lb = max(float(bounds[0]), 0.0)
        has_ub = bounds[1] is not None
        ub = float(bounds[1]) if has_ub else 0.0

        if ratio_guess is None:
            # Fast path (the common case): the start ratio is the constant
            # 1.0, so bounds validation is a driver-side scalar check and
            # the state derives from the cached base with no extra source
            # scan — one generator pass total.
            if not (lb < 1.0 and (not has_ub or 1.0 < ub)):
                raise ValueError(
                    "bounds must strictly contain the initial ratio guess"
                )

            def to_base(batches: Iterator[pa.RecordBatch]):
                for rb in batches:
                    if rb.num_rows:
                        out = maybe_elide_idx(rb, k)
                        yield pa.RecordBatch.from_arrays(
                            [pa.array([_ipc_ser(out)], type=pa.binary())],
                            ["payload"],
                        )

            base_rdd = (
                df.select(*BASE_NAMES)
                .mapInArrow(to_base, "payload binary")
                .rdd.map(lambda r: bytes(r[0]))
                ._reserialize(_ZIP_SER)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # no base_rdd.count(): the state-init job below computes base
            # partitions through the persist, materializing BOTH caches in
            # ONE source scan (r8 pack-cost work, PLANS.md sec. 13)

            def init_state(payloads):
                for b in payloads:
                    nr = _ipc_deser(bytes(b)).num_rows
                    ratio = np.ones(nr)
                    yield _ipc_ser(
                        _state_rb(
                            [
                                ratio,
                                ratio - lb,
                                (ub - ratio) if has_ub else ratio,
                                np.full(nr, 0.05),
                                np.full(nr, 0.05 if has_ub else 0.0),
                            ]
                        )
                    )

            state_rdd = (
                base_rdd.mapPartitions(init_state, preservesPartitioning=True)
                ._reserialize(_ZIP_SER)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            state_rdd.count()  # reads the base cache, not the source scan
        else:
            base_rdd, state_rdd = cls._build_with_guess(
                df, ratio_guess, k, lb, ub, has_ub
            )
        from entropy_balance_weighting_spark.solvers.linalg import BlockStructure

        bs = BlockStructure.from_groups(moment_groups) if moment_groups else None
        return cls(
            base_rdd, state_rdd, df.sparkSession, k, sum_w0, n, lb, ub,
            has_ub, block_structure=bs,
        )

    @staticmethod
    def _build_with_guess(df, ratio_guess, k, lb, ub, has_ub):
        """Warm-start path: the per-row start ratio comes from a DataFrame,
        so one Arrow pass renders each batch into aligned (base, state) IPC
        blobs and the per-row bounds validation rides that same scan."""
        df = df.join(
            ratio_guess.select("row_id", "ratio"), "row_id", "left"
        ).withColumn("ratio", F.coalesce("ratio", F.lit(1.0)))

        def to_pair(batches: Iterator[pa.RecordBatch]):
            for rb in batches:
                if not rb.num_rows:
                    continue
                ratio = _rb_col(rb, "ratio")
                s_lo = ratio - lb
                s_hi = (ub - ratio) if has_ub else np.ones(len(ratio))
                if (s_lo <= 0).any() or (has_ub and (s_hi <= 0).any()):
                    raise ValueError(
                        "bounds must strictly contain the initial ratio guess"
                    )
                base_rb = maybe_elide_idx(
                    pa.RecordBatch.from_arrays(
                        [
                            rb.column(rb.schema.get_field_index(c))
                            for c in BASE_NAMES
                        ],
                        BASE_NAMES,
                    ),
                    k,
                )
                st_rb = _state_rb(
                    [
                        ratio,
                        s_lo,
                        s_hi,
                        np.full(len(ratio), 0.05),
                        np.full(len(ratio), 0.05 if has_ub else 0.0),
                    ]
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([_ipc_ser(base_rb)], type=pa.binary()),
                        pa.array([_ipc_ser(st_rb)], type=pa.binary()),
                    ],
                    ["base", "state"],
                )

        pair_rdd = (
            df.select("row_id", "w0", "idx", "val", "ratio")
            .mapInArrow(to_pair, "base binary, state binary")
            .rdd.map(lambda r: (bytes(r[0]), bytes(r[1])))
            ._reserialize(_ZIP_SER)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        base_rdd = (
            pair_rdd.map(lambda t: t[0], preservesPartitioning=True)
            ._reserialize(_ZIP_SER)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        state_rdd = (
            pair_rdd.map(lambda t: t[1], preservesPartitioning=True)
            ._reserialize(_ZIP_SER)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            base_rdd.count()
        except Exception as exc:
            if "bounds must strictly contain" in str(exc):
                raise ValueError(
                    "bounds must strictly contain the initial ratio guess"
                ) from None
            raise
        state_rdd.count()  # reads the pair cache, not the source scan
        pair_rdd.unpersist(blocking=True)
        return base_rdd, state_rdd

    def _reduce(self, fn, big: bool = False):
        pairs = self._base.zip(self._state).mapPartitions(
            _payload_adapter(fn), preservesPartitioning=True
        )
        if big:
            # dense K² Gram payloads: merge executor-side so the driver
            # receives O(tree-fanout) blobs, same gate as collect_payload
            sums_b, mins_b = pairs.treeReduce(_merge_payload)
            sums = np.frombuffer(sums_b, dtype=np.float64).copy()
            mins = np.frombuffer(mins_b, dtype=np.float64).copy()
        else:
            rows = pairs.collect()
            sums = np.sum(
                [np.frombuffer(s, dtype=np.float64) for s, _ in rows], axis=0
            )
            mins = np.min(
                [np.frombuffer(m, dtype=np.float64) for _, m in rows], axis=0
            )
        # the reduce materialized any pending lazy commit into its cache
        if self._prev is not None:
            self._prev.unpersist()
            self._prev = None
        return sums, mins

    def elastic_g1(self) -> np.ndarray:
        sums, _ = self._reduce(_g1_pass(self.k))
        return sums

    def elastic_stats(self, lam, eta, mu_s) -> EStats:
        k = self.k
        sums, mins = self._reduce(
            _estats_pass(
                k, lam, eta, mu_s, self.lb, self.ub, self.has_ub,
                blocks_tuple(self.block_structure),
            ),
            big=reduce_big(
                k, self.block_structure, self._base.getNumPartitions()
            ),
        )
        (f_val, cd_sq, ci_sq, cs_sq, alt_sq, nan_ct,
         sl_sum, sl_sq, sl_cnt) = sums[:9]
        g1 = sums[9 : 9 + k]
        rhs_leg = sums[9 + k : 9 + 2 * k]
        rhs_mu_leg = sums[9 + 2 * k : 9 + 3 * k]
        gram = gram_from_sums(sums[9 + 3 * k :], k, self.block_structure)
        return EStats(
            f_val=float(f_val),
            cd_sq=float(cd_sq),
            ci_sq=float(ci_sq),
            cs_sq=float(cs_sq),
            alt_sq=float(alt_sq),
            g1=g1,
            rhs_leg=rhs_leg,
            rhs_mu_leg=rhs_mu_leg,
            gram=gram,
            sl_sum=float(sl_sum),
            sl_sq=float(sl_sq),
            sl_min=float(mins[0]),
            sl_cnt=float(sl_cnt),
            lm_max=float(-mins[1]),
            has_nan=nan_ct > 0,
        )

    def elastic_step(self, lam, dlam, eta, mu_s) -> EStepStats:
        sums, mins = self._reduce(
            _estep_pass(
                self.k, lam, dlam, eta, mu_s, self.lb, self.ub, self.has_ub
            )
        )
        return EStepStats(
            rstep_sq=float(sums[0]),
            xt_rstep=sums[2 : 2 + self.k],
            ftb_slack=float(mins[0]),
            ftb_dual=float(mins[1]),
            has_nan=sums[1] > 0,
        )

    def elastic_commit(
        self, lam, dlam, eta, mu_s, alpha_p, alpha_d
    ) -> None:
        """Lazy transition — ZERO jobs here: the swapped-in state RDD
        materializes (commit transform + state-cache write, ~40 B/row)
        inside the NEXT ``elastic_stats`` reduce, which also returns the
        post-commit slack/multiplier aggregates the μ/η rules need.  2 jobs
        per iteration total (stats, step), same shape as the Newton solver.
        Lineage is truncated every ``_CKPT_EVERY`` commits so the zip chain
        (state_i = f(base, state_{i-1})) stays bounded."""
        new_state = (
            self._base.zip(self._state)
            .mapPartitions(
                _ecommit_state_pass(
                    lam, dlam, eta, mu_s, alpha_p, alpha_d, self.lb,
                    self.ub, self.has_ub,
                ),
                preservesPartitioning=True,
            )
            ._reserialize(_ZIP_SER)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._commits_since_ckpt += 1
        if self._commits_since_ckpt >= self._CKPT_EVERY:
            new_state.localCheckpoint()
            self._commits_since_ckpt = 0
        self._prev = self._state
        self._state = new_state

    def new_weights(self) -> DataFrame:
        """(row_id, new_weight = ratio·w0) as a DataFrame — Arrow blobs end
        to end; the per-batch IPC payloads cross the RDD→DataFrame seam as
        single binary rows, then ``mapInArrow`` explodes them JVM-side."""

        def to_weights(pair_iter):
            for rb in _combined_iter(pair_iter):
                out = pa.RecordBatch.from_arrays(
                    [
                        rb.column(rb.schema.get_field_index("row_id")),
                        pa.array(_rb_col(rb, "ratio") * _rb_col(rb, "w0")),
                    ],
                    ["row_id", "new_weight"],
                )
                yield (_ipc_ser(out),)

        payload = self._base.zip(self._state).mapPartitions(
            to_weights, preservesPartitioning=True
        )

        def unpack(batches: Iterator[pa.RecordBatch]):
            for rb in batches:
                for blob in rb.column(0).to_pylist():
                    yield _ipc_deser(blob)

        return self._spark.createDataFrame(
            payload, "payload binary"
        ).mapInArrow(unpack, "row_id bigint, new_weight double")

    def cleanup(self) -> None:
        self._base.unpersist(blocking=True)
        self._state.unpersist(blocking=True)
        if self._prev is not None:
            self._prev.unpersist(blocking=True)
            self._prev = None
        _post_cleanup_gc(self._spark.sparkContext)
