"""Pre-sync sanity guards (SURVEY §2.9 C3-C4).

The reference fatally aborts when source and destination server timezones
differ (``/root/reference/copy/copy.go:151-160``) — a mismatch silently
corrupts every DateTime comparison — and warns when the destination has
more rows than the source (``:162-168``).
"""

from __future__ import annotations

import warnings

from pyspark.sql import SparkSession


class TimezoneMismatchError(RuntimeError):
    pass


def assert_timezone(spark: SparkSession, expected: str = "UTC") -> str:
    """C3: fatal guard that the session timezone is the engine's contract.

    One SparkSession executes both sides here, so 'two servers disagree'
    becomes 'the session isn't running under the TZ every stored timestamp
    was written with'. Returns the timezone for logging parity with
    GetTimezone (database.go:301-320).
    """
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != expected:
        raise TimezoneMismatchError(
            f"session timezone {tz!r} != required {expected!r}; "
            "timestamp predicates and fingerprints would diverge"
        )
    return tz


def warn_if_dest_larger(src_rows: int, dest_rows: int) -> bool:
    """C4: the reference's row-count sanity warning (copy.go:162-168).
    Returns True when the warning fired."""
    if dest_rows > src_rows:
        warnings.warn(
            f"destination has more rows ({dest_rows}) than source ({src_rows}); "
            "sync will overwrite inconsistent partitions",
            stacklevel=2,
        )
        return True
    return False
