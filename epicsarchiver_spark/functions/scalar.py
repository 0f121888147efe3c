"""Scalar function library — SURVEY §2.8 (C1–C19).

Each function returns a pyspark ``Column`` built from JVM-side builtins so
it stays inside whole-stage codegen; the only pandas-UDF fallbacks are the
pure-Python formatters (`hformat`) and the reference-parity bucket hash
(`hashname_parity`), both vectorized over Arrow batches.

Reference behaviors cited per-function into /root/reference (file:line).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

# C2 — charset whitelist (ref epicsarchiver/util.py:18,325-326)
PV_CHARSET_RE = r"^[A-Za-z0-9:._+\[\]<>;{}\-]+$"


def normalize_pvname(col: Column) -> Column:
    """C1 — append '.VAL' when the name has no field suffix
    (ref epicsarchiver/util.py:328-333)."""
    trimmed = F.trim(col)
    return F.when(trimmed.contains("."), trimmed).otherwise(F.concat(trimmed, F.lit(".VAL")))


def valid_pvname(col: Column) -> Column:
    """C2 — charset whitelist check (ref epicsarchiver/util.py:325-326)."""
    return col.rlike(PV_CHARSET_RE)


def clean_string(col: Column, maxlen: int = 4090) -> Column:
    """C3 — truncate at ';'/'#' and bound length
    (ref epicsarchiver/util.py:295-312)."""
    return F.substring(F.regexp_replace(col, "[;#].*$", ""), 1, maxlen)


def clean_value_num(col: Column) -> Column:
    """C4 — re-impose numeric semantics on string-stored values, unwrapping
    stray ``"b'1.23'"`` byte-reprs; non-numeric → NULL
    (ref epicsarchiver/archiver.py:34-44)."""
    unwrapped = F.regexp_replace(col, r"""^b['"](.*)['"]$""", r"$1")
    return unwrapped.try_cast("double")  # ANSI-safe: malformed → NULL


def bucket_id(name: Column, n_buckets: int = 128) -> Column:
    """C5 (Spark-native) — hash-partition a series name into a bucket.
    Replaces the reference's sha256/base64/ord-sum scheme
    (ref epicsarchiver/archiver.py:25-32) with the engine-native xxhash64;
    the 128 physical tables were a partitioning scheme, not semantics."""
    return F.pmod(F.xxhash64(name), F.lit(n_buckets)).cast("int")


@F.pandas_udf(IntegerType())
def hashname_parity(names: pd.Series) -> pd.Series:
    """C5 (parity) — bit-for-bit reimplementation of the reference's bucket
    function: sha256(name) → base64 → sum of byte values mod 128
    (ref epicsarchiver/archiver.py:25-32). Only needed when reading a
    layout produced by the reference."""
    import base64
    import hashlib

    def _h(name: str) -> int:
        digest = base64.b64encode(hashlib.sha256(name.encode("utf-8")).digest())
        return sum(digest) % 128

    return names.map(_h).astype("int32")


def _hformat_one(value: float, length: int = 10) -> str:
    """C6 core — '%g'-like fixed-width float rendering, reimplemented to
    the documented behavior of the reference formatter
    (ref epicsarchiver/util.py:427-491): width-padded with a leading
    blank for positives, trailing zeros kept, 'f' form within the
    precision window and 'e' outside it (the docstring's own example:
    99999995.2 → ' 99999995.2' but +10 more → ' 1.0000e+08' at length
    11), and a trailing '000' triple stripped."""
    import math

    if value is None or value != value:  # None / NaN
        return "nan".rjust(max(length, 7))
    width = max(length, 7)
    digits = width - 7
    try:
        magnitude = int(math.log10(abs(value)))
    except (ValueError, OverflowError):
        magnitude = 0
    kind = "e"
    if abs(magnitude) > 99:
        digits -= 1
    elif (0 < magnitude < digits + 6) or (magnitude <= 0 and -magnitude < digits - 1):
        kind = "f"
        digits += 4
        if magnitude > 0:
            digits = max(0, digits - magnitude)
    # the reference raises on width 7 with |exponent|>99 (negative
    # precision); clamp instead — documented divergence
    rendered = format(value, f" {width}.{max(digits, 0)}{kind}")[:width]
    return rendered[:-3] if rendered.endswith("000") else rendered


@F.pandas_udf(StringType())
def hformat(values: pd.Series) -> pd.Series:
    """C6 — vectorized fixed-width formatter for cvalue parity
    (ref epicsarchiver/util.py:427-491, applied at cache.py:448-452)."""
    return values.map(lambda v: _hformat_one(v))


def tformat(ts_sec: Column) -> Column:
    """C7 — epoch seconds → 'YYYY-MMM-DD HH:MM:SS'
    (ref epicsarchiver/util.py:364-370)."""
    return F.date_format(F.timestamp_seconds(ts_sec), "yyyy-MMM-dd HH:mm:ss")


def timehash(ts_sec: Column) -> Column:
    """C11 — 0.1-ms timestamp hash for unique filenames
    (ref epicsarchiver/util.py:357-362): ``hex(int(10000.*t))[2:-1]``.
    The reference is Python-2 code, where ``hex(long)`` ends with an
    ``L`` — the ``[2:-1]`` strips the ``0x`` prefix and that suffix, so
    the value is ALL lower-hex digits of ``floor(t·10000)`` (10 chars
    for current epochs; the docstring's "10 character" is descriptive,
    not a truncation). Deterministic in t → oracle-checkable; callers
    wanting the reference's wall-clock behavior pass
    ``F.lit(time.time())`` or a processing-time column."""
    return F.lower(F.hex((ts_sec * 10000).cast("long")))


def ts2iso(ts_sec: Column) -> Column:
    """C9 — epoch seconds → ISO with milliseconds
    (ref epicsarchiver/web_utils.py:24-29)."""
    return F.date_format(F.timestamp_seconds(ts_sec), "yyyy-MM-dd HH:mm:ss.SSS")


def chararray_as_string(col: Column) -> Column:
    """C12 — int-waveform string ``"[72, 105, 0, ...]"`` → text, stopping at
    the NUL terminator (ref epicsarchiver/web_utils.py:93-110).

    Pure builtin pipeline: strip brackets → split → cast → take-until-0 →
    chr() via transform → join. Stays in codegen, no UDF.
    """
    stripped = F.regexp_replace(col, r"[\[\]\s]", "")
    ints = F.filter(
        F.transform(F.split(stripped, ","), lambda x: x.try_cast("int")),
        lambda x: x.isNotNull(),
    )
    nul_pos = F.array_position(ints, F.lit(0)).cast("int")  # 0 when absent
    upto_nul = F.slice(
        ints, F.lit(1), F.when(nul_pos > 0, nul_pos - F.lit(1)).otherwise(F.size(ints))
    )
    return F.array_join(F.transform(upto_nul, F.char), "")


def enum_label(value_int: Column, enum_strs: Column) -> Column:
    """C13 — enum integer → label through the per-PV ``enum_strs`` array
    (ref epicsarchiver/cache.py:171-178, applied webapp.py:302-305).
    Out-of-range indices fall back to the raw integer as text."""
    label = F.try_element_at(enum_strs, value_int + F.lit(1))
    return F.coalesce(label, value_int.cast("string"))


def yes_no(col: Column) -> Column:
    """C14 — 0→No, else Yes (ref epicsarchiver/web/WebStatus.py:87-93)."""
    return F.when(col.cast("double") == 0, F.lit("No")).otherwise(F.lit("Yes"))


# C16 — alert comparison operators (ref epicsarchiver/cache.py:31-36)
ALERT_OPS = {"eq": "=", "ne": "!=", "le": "<=", "lt": "<", "ge": ">=", "gt": ">"}


def alert_fires(value: Column, compare: Column, trippoint: Column) -> Column:
    """C16 — value <op> trippoint, numeric when both sides cast, else string
    comparison (ref epicsarchiver/cache.py:609-621)."""
    v_num, t_num = value.try_cast("double"), trippoint.try_cast("double")
    numeric = v_num.isNotNull() & t_num.isNotNull()

    def both(op):
        return F.when(numeric, op(v_num, t_num)).otherwise(op(value, trippoint))

    return (
        F.when(compare == "eq", both(lambda a, b: a == b))
        .when(compare == "ne", both(lambda a, b: a != b))
        .when(compare == "le", both(lambda a, b: a <= b))
        .when(compare == "lt", both(lambda a, b: a < b))
        .when(compare == "ge", both(lambda a, b: a >= b))
        .when(compare == "gt", both(lambda a, b: a > b))
        .otherwise(F.lit(False))
    )


def enum_strs_from_json(col: Column) -> Column:
    """C19 — pvextra.data JSON array → array<string> enum labels
    (ref epicsarchiver/cache.py:177,198)."""
    from pyspark.sql.types import ArrayType

    return F.from_json(col, ArrayType(StringType()))


def enum_strs_to_json(col: Column) -> Column:
    """C19 inverse — array<string> → JSON text for storage parity."""
    return F.to_json(col)


def null_norm(col: Column) -> Column:
    """F8 — '', 'none', NULL → NULL (ref epicsarchiver/web_utils.py:11-22)."""
    return F.when(col.isNull() | F.lower(col).isin("", "none"), F.lit(None)).otherwise(col)
