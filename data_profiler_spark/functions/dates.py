"""Date-handling expression builders.

Reference semantics (apex-companies/data-profiler):
- ``adjust_weekend_dates``: all four weekend rules of
  ``services/transform_service.py:869-883`` (NEAREST_WEEKDAY, ALL_TO_MONDAY,
  ALL_TO_FRIDAY, AS_IS) as a single Catalyst ``CASE`` expression — no UDF.
- ``parse_date_mixed``: the reference accepts mixed/day-first date strings
  (``pd.to_datetime(dayfirst=True, format='mixed')``,
  ``services/transform_service.py:372-374``). Re-expressed as an ordered
  ``coalesce(try_to_date ...)`` chain: each format is attempted in order and
  the first successful parse wins, malformed values fall through to NULL
  (pandas ``errors='coerce'`` behavior). Pure codegen — the chain folds into
  one projection, so at 10^12 rows this costs one pass, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WEEKEND_DATE_RULES = (
    "NEAREST_WEEKDAY",  # Saturday → Friday, Sunday → Monday
    "ALL_TO_MONDAY",    # Saturday → +2, Sunday → +1
    "ALL_TO_FRIDAY",    # Saturday → −1, Sunday → −2
    "AS_IS",            # no adjustment
)


def adjust_weekend_dates(col: Column, rule: str) -> Column:
    """Shift weekend dates per ``rule`` (transform_service.py:869-883).

    ``col`` is cast to date; weekday values always pass through unchanged.
    """
    if rule not in WEEKEND_DATE_RULES:
        raise ValueError(f"rule must be one of {WEEKEND_DATE_RULES}, got {rule!r}")
    d = col.cast("date")
    if rule == "AS_IS":
        return d
    dow = F.dayofweek(d)  # 1=Sunday .. 7=Saturday
    sat_shift = {"NEAREST_WEEKDAY": -1, "ALL_TO_MONDAY": 2, "ALL_TO_FRIDAY": -1}[rule]
    sun_shift = {"NEAREST_WEEKDAY": 1, "ALL_TO_MONDAY": 1, "ALL_TO_FRIDAY": -2}[rule]
    return (
        F.when(dow == 7, F.date_add(d, sat_shift))
        .when(dow == 1, F.date_add(d, sun_shift))
        .otherwise(d)
    )


# Ordered try-chain: ISO first (unambiguous), then day-first forms before
# month-first — matching the reference's dayfirst=True preference where the
# string is ambiguous (01/02/2020 → Feb 1), while unambiguous month-first
# strings (01/13/2020) still parse via the later pattern, exactly like
# pandas' fallback. Single-letter patterns accept 1-or-2-digit fields, so
# one pattern covers both 1/2/2020 and 01/02/2020.
MIXED_DATE_FORMATS = (
    "yyyy-M-d",    # ISO and relaxed ISO
    "yyyy/M/d",
    "d/M/yyyy",    # day-first (reference preference)
    "d-M-yyyy",
    "d.M.yyyy",
    "M/d/yyyy",    # month-first fallback for day>12 strings like 01/13/2020
    "yyyyMMdd",
    "d MMM yyyy",  # 3 Jan 2020
    "MMM d yyyy",  # Jan 3 2020
)


def parse_date_mixed(col: Column, formats: tuple[str, ...] = MIXED_DATE_FORMATS) -> Column:
    """Mixed-format date parse: first matching format wins, else NULL."""
    s = F.trim(col.cast("string"))
    return F.coalesce(*[F.try_to_date(s, f) for f in formats])
