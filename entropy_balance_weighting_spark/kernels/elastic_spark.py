"""Distributed kernel for the elastic interior-point solver — packed-row
DataFrame + Arrow-native ``mapInArrow`` passes (same execution design as
the other distributed kernels: one fused scan per stage, zero per-iteration
shuffles, K/K²-sized partials only, lineage truncated per commit).

State columns: ``ratio, s_lo, s_hi, lm_lo, lm_hi``.  The hi block is inert
(s_hi=1, lm_hi=0) when no upper bound is set.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.kernels.base import EStats, EStepStats
from entropy_balance_weighting_spark.kernels.penalty_spark import (
    BOUNDED_SCHEMA,
    _ftb_batch,
)
from entropy_balance_weighting_spark.kernels.spark import (
    _TREE_REDUCE_BYTES,
    _flatten_rb,
    _pack_rb,
    _rb_col,
    _rb_with,
    _x_dot,
    _xt_v,
    blocks_tuple,
    collect_payload,
    gram_bytes,
    gram_from_sums,
    make_gram_accum,
    pack_rows,
)

_PAYLOAD_SCHEMA = "sums binary, mins binary"


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


def _ecommit_pass(
    lam, dlam, eta, mu_s, alpha_p, alpha_d, lb, ub, has_ub
) -> Callable:
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if not rb.num_rows:
                yield rb
                continue
            flat_idx, flat_val, lens = _flatten_rb(rb)
            pieces = _pieces(
                rb, flat_idx, flat_val, lens, lam, eta, mu_s, lb, ub, has_ub
            )
            r_step, li_lo, li_hi, ss_lo, ss_hi = _steps_arrays(
                pieces, flat_idx, flat_val, lens, dlam, mu_s, has_ub
            )
            _, r, s_lo, s_hi, lm_lo, lm_hi = _cols(rb)
            new_cols = {
                "ratio": r + alpha_p * r_step,
                "s_lo": s_lo + alpha_p * ss_lo,
                "lm_lo": lm_lo + alpha_d * li_lo,
            }
            if has_ub:
                new_cols["s_hi"] = s_hi + alpha_p * ss_hi
                new_cols["lm_hi"] = lm_hi + alpha_d * li_hi
            yield _rb_with(rb, **new_cols)

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
        self, df: DataFrame, k: int, sum_w0: float, n: int, lb: float,
        ub: float, has_ub: bool, block_structure=None,
    ) -> None:
        self.df = df
        self.k = k
        self.sum_w0 = sum_w0
        self.n = n
        self.lb = lb
        self.ub = ub
        self.has_ub = has_ub
        self.block_structure = block_structure
        self._prev: DataFrame | None = None
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
        if ratio_guess is not None:
            df = df.join(
                ratio_guess.select("row_id", "ratio"), "row_id", "left"
            ).withColumn("ratio", F.coalesce("ratio", F.lit(1.0)))
        else:
            df = df.withColumn("ratio", F.lit(1.0))
        lb = max(float(bounds[0]), 0.0)
        has_ub = bounds[1] is not None
        ub = float(bounds[1]) if has_ub else 0.0
        df = df.withColumn("s_lo", F.col("ratio") - F.lit(lb))
        df = df.withColumn("lm_lo", F.lit(0.05))
        if has_ub:
            df = df.withColumn("s_hi", F.lit(ub) - F.col("ratio")).withColumn(
                "lm_hi", F.lit(0.05)
            )
        else:
            df = df.withColumn("s_hi", F.lit(1.0)).withColumn("lm_hi", F.lit(0.0))
        # bounds validation fused into the checkpoint materialization (one
        # scan instead of a separate count job): assert_true evaluates per
        # row while the eager checkpoint writes the cache
        df = df.withColumn(
            "__chk",
            F.assert_true(
                (F.col("s_lo") > 0) & (~F.lit(has_ub) | (F.col("s_hi") > 0)),
                F.lit("bounds must strictly contain the initial ratio guess"),
            ),
        )
        try:
            df = df.localCheckpoint(eager=True)
        except Exception as exc:
            if "bounds must strictly contain" in str(exc):
                raise ValueError(
                    "bounds must strictly contain the initial ratio guess"
                ) from None
            raise
        df = df.drop("__chk")
        from entropy_balance_weighting_spark.solvers.linalg import BlockStructure

        bs = BlockStructure.from_groups(moment_groups) if moment_groups else None
        return cls(df, k, sum_w0, n, lb, ub, has_ub, block_structure=bs)

    def _reduce(self, fn, big: bool = False):
        sums, mins = collect_payload(
            self.df.mapInArrow(fn, _PAYLOAD_SCHEMA), big
        )
        # a reduce materializes any pending lazy commit into its cache
        if self._prev is not None:
            self._prev.unpersist()
            self._prev = None
            if self._commits_since_ckpt >= self._CKPT_EVERY:
                old = self.df
                self.df = self.df.localCheckpoint(eager=True)
                old.unpersist()
                self._commits_since_ckpt = 0
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
            big=gram_bytes(k, self.block_structure) > _TREE_REDUCE_BYTES,
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
        """Lazy transition — ZERO jobs here: the swapped-in DataFrame
        materializes (commit transform + cache write) inside the NEXT
        ``elastic_stats`` reduce, which also returns the post-commit
        slack/multiplier aggregates the μ/η rules need.  2 jobs per
        iteration total (stats, step), same shape as the Newton solver."""
        new_df = self.df.mapInArrow(
            _ecommit_pass(
                lam, dlam, eta, mu_s, alpha_p, alpha_d, self.lb, self.ub,
                self.has_ub,
            ),
            BOUNDED_SCHEMA,
        ).persist()
        self._prev = self.df
        self.df = new_df
        self._commits_since_ckpt += 1

    def new_weights(self) -> DataFrame:
        return self.df.select(
            "row_id", (F.col("ratio") * F.col("w0")).alias("new_weight")
        )

    def cleanup(self) -> None:
        self.df.unpersist()
        if self._prev is not None:
            self._prev.unpersist()
            self._prev = None
