"""Weekend-date rules + mixed-format date parsing — parity against pandas
re-implementations of the reference semantics
(transform_service.py:869-883 weekend dispatch, :372-374 dayfirst parse)."""

from __future__ import annotations

from datetime import date, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_profiler_spark.functions.dates import (
    MIXED_DATE_FORMATS,
    WEEKEND_DATE_RULES,
    adjust_weekend_dates,
    parse_date_mixed,
)

# Two full weeks → both weekend days, all weekdays, a month boundary.
FIXTURE_DATES = [date(2024, 2, 23) + timedelta(days=i) for i in range(14)]


def _pandas_weekend(d: pd.Series, rule: str) -> pd.Series:
    """Literal re-implementation of transform_service.py:869-883."""
    import numpy as np

    d = d.copy()
    if rule == "NEAREST_WEEKDAY":
        d = pd.Series(np.where(d.dt.day_name() == "Saturday", d - pd.Timedelta(days=1), d))
        d = pd.Series(np.where(d.dt.day_name() == "Sunday", d + pd.Timedelta(days=1), d))
    elif rule == "ALL_TO_MONDAY":
        d = pd.Series(np.where(d.dt.day_name() == "Saturday", d + pd.Timedelta(days=2), d))
        d = pd.Series(np.where(d.dt.day_name() == "Sunday", d + pd.Timedelta(days=1), d))
    elif rule == "ALL_TO_FRIDAY":
        d = pd.Series(np.where(d.dt.day_name() == "Saturday", d - pd.Timedelta(days=1), d))
        d = pd.Series(np.where(d.dt.day_name() == "Sunday", d - pd.Timedelta(days=2), d))
    return pd.Series(d).dt.date


@pytest.mark.parametrize("rule", WEEKEND_DATE_RULES)
def test_weekend_rules_match_reference_pandas(spark, rule):
    df = spark.createDataFrame([(d.isoformat(),) for d in FIXTURE_DATES], "d string")
    got = {
        r["d"]: r["adj"]
        for r in df.select("d", adjust_weekend_dates(F.col("d"), rule).alias("adj")).collect()
    }
    expect = _pandas_weekend(pd.Series(pd.to_datetime(FIXTURE_DATES)), rule)
    for d, e in zip(FIXTURE_DATES, expect):
        assert got[d.isoformat()] == e, (rule, d)


def test_weekend_rules_rejects_unknown_rule():
    with pytest.raises(ValueError):
        adjust_weekend_dates(F.col("d"), "SOMETIMES_TUESDAY")


MIXED_FIXTURE = [
    "2024-01-02",    # ISO
    "2024-1-2",      # relaxed ISO
    "2024/01/02",
    "01/02/2024",    # ambiguous → day-first: Feb 1 (reference dayfirst=True)
    "1/2/2024",
    "13/01/2024",    # unambiguous day-first
    "01/13/2024",    # unambiguous month-first → pandas falls back
    "03-04-2024",    # ambiguous dashed → day-first: Apr 3
    "20240102",
    "3 Jan 2024",
    "Jan 3 2024",
    "not a date",
    "",
]


def test_mixed_date_parse_matches_pandas_dayfirst(spark):
    df = spark.createDataFrame([(s,) for s in MIXED_FIXTURE], "s string")
    got = {r["s"]: r["d"] for r in df.select("s", parse_date_mixed(F.col("s")).alias("d")).collect()}
    for s in MIXED_FIXTURE:
        try:
            e = pd.to_datetime(s, dayfirst=True, format="mixed", errors="coerce")
        except ValueError:
            e = pd.NaT
        expect = None if pd.isna(e) else e.date()
        assert got[s] == expect, s


def test_mixed_chain_first_format_is_iso():
    # coercion fill-count semantics depend on strict ISO staying first
    assert MIXED_DATE_FORMATS[0].startswith("yyyy-")


def test_weekend_rules_never_emit_weekends(spark):
    """Invariant over two full years of dates: the three shifting rules
    never output a Saturday/Sunday, weekdays always pass through unchanged,
    AS_IS is the identity."""
    days = [(date(2023, 1, 1) + timedelta(days=i)).isoformat() for i in range(730)]
    df = spark.createDataFrame([(d,) for d in days], "d string")
    cols = [
        adjust_weekend_dates(F.col("d"), r).alias(r) for r in WEEKEND_DATE_RULES
    ] + [F.dayofweek(F.col("d").cast("date")).alias("dow")]
    for row in df.select("d", *cols).collect():
        src = date.fromisoformat(row["d"])
        for rule in WEEKEND_DATE_RULES:
            out = row[rule]
            if rule == "AS_IS":
                assert out == src
            else:
                assert out.isoweekday() <= 5, (rule, src, out)
            if src.isoweekday() <= 5:  # weekday in -> unchanged, every rule
                assert out == src


def test_mixed_parse_roundtrips_every_format(spark):
    """Each documented format round-trips: render a known date in that
    format, parse it back, get the same date."""
    py_fmt = {
        "yyyy-M-d": "%Y-%m-%d",
        "yyyy/M/d": "%Y/%m/%d",
        "d/M/yyyy": "%d/%m/%Y",
        "d-M-yyyy": "%d-%m-%Y",
        "d.M.yyyy": "%d.%m.%Y",
        "yyyyMMdd": "%Y%m%d",
        "d MMM yyyy": "%d %b %Y",
        "MMM d yyyy": "%b %d %Y",
    }
    target = date(2024, 3, 7)
    rows = [(f, target.strftime(py_fmt[f])) for f in py_fmt]
    # M/d/yyyy is shadowed by the day-first preference for ambiguous
    # strings (by design); exercise it with an unambiguous month-first date
    rows.append(("M/d/yyyy", "3/19/2024"))
    df = spark.createDataFrame(rows, "fmt string, s string")
    got = {r["fmt"]: r["d"] for r in df.select("fmt", parse_date_mixed(F.col("s")).alias("d")).collect()}
    for f, _ in rows:
        expect = date(2024, 3, 19) if f == "M/d/yyyy" else target
        assert got[f] == expect, (f, got[f])
