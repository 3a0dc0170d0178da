"""Deterministic stratified sampling for training-data pipelines.

Corpus curation constantly re-balances strata — downsample the dominant
language, cap a crawl source, keep high-quality docs at a higher rate.
The operator here is Bernoulli-per-stratum with a *portable, keyed* coin:

    keep(row)  <=>  u(key) < fraction(stratum),
    u(key) = portable_hash64(seed|key) / 2^60  in [0, 1)

Because the coin is a pure function of (seed, key) — not Spark's
partition-dependent ``rand()`` — the sample is reproducible across runs,
engines (the DuckDB oracle replays the identical md5 arithmetic), cluster
sizes, and repartitionings, and it composes: re-running with a smaller
fraction yields a strict subset (nested samples, the property you need for
deterministic train/val carve-outs).

(Reference seed: the reference samples only via df.head()-style previews,
data_profiler.py:540-560 — order-dependent and engine-local; this replaces
that with a keyed coin that survives distribution.)

Scale: the fraction lookup is a broadcast join against a tiny strata frame
(never a driver-side dict lookup in a UDF); the filter is a pure Catalyst
expression that survives pushdown past the scan boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_profiler_spark.functions.frames import local_frame
from data_profiler_spark.functions.hashing import portable_hash64

_DENOM = float(1 << 60)  # portable_hash64 folds 15 hex chars = 60 bits


def sample_uniform(col, seed: str = "sample") -> F.Column:
    """u(key) in [0, 1): the keyed coin as a reusable column expression.

    Total over null keys too: a NULL key hashes as the empty string
    (otherwise the coin itself is NULL — Bernoulli would silently drop the
    row while an ORDER BY would sort it first, two different behaviors for
    the same bad input). All-null keys share one coin value; a real primary
    key never has nulls, and the pk_not_null check is where that's caught.
    """
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash64(
        F.coalesce(c.cast("string"), F.lit("")), seed=seed
    ) / F.lit(_DENOM)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Rows of ``df`` kept at ``fractions[stratum]`` (else ``default``),
    decided by the deterministic keyed coin above.

    ``key_col`` must identify a row stably (a primary key); sampling on a
    non-unique key keeps or drops all rows of that key together — sometimes
    exactly what you want (all chunks of one document), so it is the
    caller's contract, not enforced here.
    """
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    frac = local_frame(
        df.sparkSession,
        [(k, float(v)) for k, v in sorted(fractions.items())],
        StructType(
            [
                StructField("__stratum", StringType()),
                StructField("__frac", DoubleType()),
            ]
        ),
    )
    joined = df.join(
        broadcast(frac),
        df[stratum_col].cast("string") == frac["__stratum"],
        "left",
    )
    keep = sample_uniform(df[key_col], seed=seed) < F.coalesce(
        F.col("__frac"), F.lit(float(default))
    )
    return joined.filter(keep).drop("__stratum", "__frac")


def stratified_take(
    df: DataFrame,
    stratum_col: str,
    k: int,
    key_col: str,
    seed: str = "sample",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — a deterministic
    "reservoir": rows are ranked by the keyed coin (uniform, reproducible)
    and the top k per stratum survive, via the salted two-phase
    ``grouped_topk`` (no single-task-per-stratum window, so a 10^11-row
    language stratum is fine).

    Nested like the Bernoulli variant: the k'-take (k' < k) of a stratum is
    a strict subset of its k-take, because the coin order is fixed.
    """
    from data_profiler_spark.functions.topk import grouped_topk

    ranked = df.withColumn("__u", sample_uniform(F.col(key_col), seed=seed))
    out = grouped_topk(
        ranked,
        [stratum_col],
        [F.asc("__u"), F.asc(key_col)],
        k=k,
        salt_col=key_col,
    )
    return out.drop("__u", "rank")
