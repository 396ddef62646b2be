"""DateTools: dates as lexicographically-ordered index strings.

Re-expression of ``document/DateTools.java:54``: a GMT timestamp encodes
to a prefix of ``yyyyMMddHHmmssSSS`` at one of seven resolutions
(YEAR=4 chars ... MILLISECOND=17), so string order == time order and a
``TermRangeQuery`` over the encoded field is a date-range filter. The
reference rounds (truncates) the timestamp to the resolution before
formatting; parsing dispatches on string length.

Two twins share the semantics:

- plain-Python ``time_to_string``/``string_to_time``/``round_time`` over
  epoch milliseconds (driver-side encode of query bounds);
- ``encode_col`` — the same encoding as ONE Catalyst ``date_format``
  Column over a timestamp column, so the per-row path is pure codegen
  (never a Python UDF) and a range predicate over it pushes down to the
  parquet scan as an ordinary string comparison.
"""

from __future__ import annotations

import enum
from datetime import datetime, timezone

__all__ = ["Resolution", "time_to_string", "string_to_time", "round_time", "encode_col"]

_FULL = "%Y%m%d%H%M%S"  # + milliseconds handled manually


class Resolution(enum.Enum):
    """Format length per DateTools.Resolution (DateTools.java:174)."""

    YEAR = 4
    MONTH = 6
    DAY = 8
    HOUR = 10
    MINUTE = 12
    SECOND = 14
    MILLISECOND = 17

    @property
    def format_len(self) -> int:
        return self.value


# Spark date_format / Java SimpleDateFormat pattern prefixes by length
_PATTERN = "yyyyMMddHHmmssSSS"


def _format_ms(ms: int, length: int) -> str:
    dt = datetime.fromtimestamp(ms // 1000, tz=timezone.utc)
    base = dt.strftime(_FULL) + f"{ms % 1000:03d}"
    return base[:length]


def round_time(ms: int, resolution: Resolution) -> int:
    """Truncate epoch-ms to the resolution (DateTools.round semantics:
    lower calendar fields zeroed, in GMT)."""
    dt = datetime.fromtimestamp(ms // 1000, tz=timezone.utc)
    r = resolution
    if r is Resolution.MILLISECOND:
        return ms
    parts = dict(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    keep = {
        Resolution.YEAR: (),
        Resolution.MONTH: ("month",),
        Resolution.DAY: ("month", "day"),
        Resolution.HOUR: ("month", "day", "hour"),
        Resolution.MINUTE: ("month", "day", "hour", "minute"),
        Resolution.SECOND: ("month", "day", "hour", "minute", "second"),
    }[r]
    for k in keep:
        parts.pop(k)
    return int(dt.replace(**parts).timestamp()) * 1000


def time_to_string(ms: int, resolution: Resolution) -> str:
    """Epoch-ms -> index string at the resolution (timeToString)."""
    return _format_ms(round_time(ms, resolution), resolution.format_len)


def string_to_time(s: str) -> int:
    """Index string -> epoch ms; the resolution is the string length
    (stringToTime). Raises ValueError on lengths/contents no resolution
    produces — the reference's ParseException."""
    lengths = {r.format_len for r in Resolution}
    if len(s) not in lengths or not s.isdigit():
        raise ValueError(f"Input is not a valid date string: {s!r}")
    padded = s + "19700101000000000"[len(s):]
    dt = datetime.strptime(padded[:14], _FULL).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1000 + int(padded[14:17])


def encode_col(col, resolution: Resolution):
    """The Column twin: encode a timestamp column to the resolution's
    index string with one codegen ``date_format`` (no Python per row)."""
    from pyspark.sql import functions as F

    return F.date_format(col, _PATTERN[: resolution.format_len])
