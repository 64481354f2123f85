"""Timezone-independent calendar truncation for TIMESTAMP_NTZ columns.

Spark's ``date_trunc`` silently CASTS a TIMESTAMP_NTZ input to
TIMESTAMP_LTZ (interpreting the wall clock in the session timezone)
and returns LTZ — so a query that truncates an NTZ event time renders
differently depending on the driver process's timezone, and a
wall-clock that falls in a DST gap is shifted before truncation.
Every fixture timestamp in this repo is NTZ by contract
(sources/tables.py), so truncation must stay NTZ end to end.

``trunc_hour_ntz`` / ``trunc_day_ntz`` rebuild the truncated value
with ``make_timestamp_ntz`` from the wall-clock components, which
extract natively on NTZ with no timezone conversion anywhere in the
expression — pure codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc_hour_ntz(col: Column | str) -> Column:
    """Floor a TIMESTAMP_NTZ to the start of its hour, staying NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.make_timestamp_ntz(
        F.year(c), F.month(c), F.dayofmonth(c), F.hour(c), F.lit(0), F.lit(0)
    )


def trunc_day_ntz(col: Column | str) -> Column:
    """Floor a TIMESTAMP_NTZ to midnight of its day, staying NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.make_timestamp_ntz(
        F.year(c), F.month(c), F.dayofmonth(c), F.lit(0), F.lit(0), F.lit(0)
    )


def trunc_week_monday_date(col: Column | str) -> Column:
    """The Monday DATE of the ISO week containing an NTZ timestamp —
    the tz-free twin of ``date_trunc('week', ts).cast('date')``. Pure
    date arithmetic: ``dayofweek`` is 1=Sunday..7=Saturday, so
    ``(dayofweek + 5) % 7`` is the day offset back to Monday."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.to_date(c)
    return F.date_sub(d, (F.dayofweek(d) + F.lit(5)) % F.lit(7))
