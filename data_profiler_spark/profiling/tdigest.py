"""Mergeable t-digest quantile sketches (north_star: "approx-quantiles via
t-digest-style sketches").

``percentile_approx`` (Greenwald-Khanna) answers quantiles *within one
aggregation*; it cannot combine results across RUNS — and the resume
manifest (plans/manifest.py) means a table's partitions are routinely
profiled by different runs. This module closes that gap: each partition
persists a compact centroid sketch, and table-level quantiles at ANY later
time are a driver-side merge of the stored sketches — no re-read of
completed partitions (the whole point of resumability).

Algorithm: the merging t-digest of Dunning & Ertl ("Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023, public) with the
standard scale-function bound 4·n·q(1−q)/δ — centroids near the median
absorb more mass, tails stay fine-grained. Pure numpy; sketches serialize
to JSON for the `sketches` output table.

Per-partition sketch construction runs as one ``applyInPandas`` over the
(small, post-decode) stats frame — Arrow-batched, no per-row Python
(SURVEY.md §2.10 discipline).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_DELTA = 200


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    cum = 0.0  # weight fully to the left of the current cluster
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= max(limit, 1.0):
            cur_m += (m - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


@dataclass
class TDigest:
    means: np.ndarray = field(default_factory=lambda: np.empty(0))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0))
    d_min: float = float("inf")
    d_max: float = float("-inf")
    delta: int = DEFAULT_DELTA

    @classmethod
    def from_values(cls, values, delta: int = DEFAULT_DELTA) -> TDigest:
        x = np.asarray(values, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return cls(delta=delta)
        m, w = _compress(x, np.ones_like(x), delta)
        return cls(m, w, float(x.min()), float(x.max()), delta)

    @property
    def n(self) -> float:
        return float(self.weights.sum()) if self.weights.size else 0.0

    def merge(self, other: TDigest) -> TDigest:
        if other.n == 0:
            return self
        if self.n == 0:
            return other
        m, w = _compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            self.delta,
        )
        return TDigest(
            m, w, min(self.d_min, other.d_min), max(self.d_max, other.d_max), self.delta
        )

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        target = q * self.n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            # interpolate from the true minimum to the first centroid
            frac = target / cum[0] if cum[0] > 0 else 0.0
            return self.d_min + frac * (self.means[0] - self.d_min)
        if target >= cum[-1]:
            span = self.n - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 1.0
            return self.means[-1] + frac * (self.d_max - self.means[-1])
        i = int(np.searchsorted(cum, target))
        lo, hi = cum[i - 1], cum[i]
        frac = (target - lo) / (hi - lo) if hi > lo else 0.0
        return float(self.means[i - 1] + frac * (self.means[i] - self.means[i - 1]))

    def to_json(self) -> str:
        return json.dumps(
            {
                "m": [round(v, 10) for v in self.means.tolist()],
                "w": self.weights.tolist(),
                "min": self.d_min if self.n else None,
                "max": self.d_max if self.n else None,
                "delta": self.delta,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> TDigest:
        d = json.loads(s)
        if not d["m"]:
            return cls(delta=d.get("delta", DEFAULT_DELTA))
        return cls(
            np.asarray(d["m"], dtype=np.float64),
            np.asarray(d["w"], dtype=np.float64),
            float(d["min"]),
            float(d["max"]),
            d.get("delta", DEFAULT_DELTA),
        )


def sketch_by_group(
    df: DataFrame,
    columns: list[str],
    group_col: str = "partition_id",
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """One t-digest per (group, column): (group_col, column, digest json).

    applyInPandas per group — the input here is the post-decode stats frame
    (fixed-width rows), so a group is at most a logical partition's worth of
    scalars, never audio payloads.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf[group_col].iloc[0]
        rows = [
            {
                group_col: gid,
                "column": c,
                "digest": TDigest.from_values(pdf[c].to_numpy(np.float64), delta).to_json(),
            }
            for c in columns
        ]
        return pd.DataFrame(rows)

    out_schema = f"{group_col} int, column string, digest string"
    return df.select(group_col, *columns).groupBy(group_col).applyInPandas(
        build, schema=out_schema
    )


def merge_sketch_rows(rows, column: str | None = None) -> TDigest:
    """Driver-side merge of sketch-table rows (each row: .digest JSON,
    optionally filtered to one .column)."""
    acc = TDigest()
    for r in rows:
        if column is not None and r["column"] != column:
            continue
        acc = acc.merge(TDigest.from_json(r["digest"]))
    return acc
