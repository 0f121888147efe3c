"""Text sinks — S9 (ASCII data files) and S13 (save/restore scripts).

Row formatting happens JVM-side (`format_string`/`date_format`); only the
final write is an edge concern. Headers are tiny driver-side strings."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ascii_rows(frame: DataFrame, pvname_col: str = "pvname") -> DataFrame:
    """S9 — `ts value YYYYMMDD HHMMSS` lines per point
    (ref epicsarchiver/webapp.py:260-323 data-file endpoint)."""
    ts = F.timestamp_seconds(F.col("time"))
    return frame.select(
        F.col(pvname_col),
        F.format_string(
            "%.3f  %s  %s",
            F.col("time"),
            F.col("value").cast("string"),
            F.date_format(ts, "yyyyMMdd HHmmss"),
        ).alias("line"),
    )


def write_ascii(frame: DataFrame, path: str, header: str | None = None) -> None:
    """Write one text part per series partition. At scale this fans out
    per-series files exactly like the reference's /data/<pv>/ tree."""
    rows = ascii_rows(frame)
    rows.select("line").write.mode("overwrite").text(path)
    if header:
        # header comment lines live in a sidecar, parquet-style metadata
        with open(f"{path}/_header.txt", "w", encoding="utf-8") as fh:
            fh.write(header)


def saverestore_lines(values: DataFrame, fmt: str = "plain") -> DataFrame:
    """S13 — save/restore script rendering of a (pvname, value) frame
    (ref epicsarchiver/util.py:391-424 write_saverestore; formats plain /
    idl / python)."""
    if fmt == "plain":
        line = F.format_string("%s  %s", F.col("pvname"), F.col("value").cast("string"))
    elif fmt == "idl":
        line = F.format_string(
            "s = caput('%s', %s)", F.col("pvname"), F.col("value").cast("string")
        )
    elif fmt == "python":
        line = F.format_string(
            "caput('%s', %s)", F.col("pvname"), F.col("value").cast("string")
        )
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return values.select(line.alias("line"))


def sql_dump_lines(frame: DataFrame, table: str) -> DataFrame:
    """S11 — portable SQL dump: one multi-row-safe INSERT statement per
    row (ref epicsarchiver/pvarch.py:254-272 shells out to mariadb-dump;
    here the dump is a distributed text render — every executor formats
    its partition, `.write.text` commits atomically).

    Strings are single-quote-escaped JVM-side; NULLs render bare. Column
    order follows the frame schema, quoted in the header comment."""
    cols = frame.columns

    def lit_of(c: str) -> F.Column:
        col = F.col(c)
        dt = dict(frame.dtypes)[c]
        if dt in ("string",):
            return F.when(
                col.isNull(), F.lit("NULL")
            ).otherwise(F.concat(F.lit("'"), F.regexp_replace(col, "'", "''"), F.lit("'")))
        return F.when(col.isNull(), F.lit("NULL")).otherwise(col.cast("string"))

    values = F.concat_ws(",", *[lit_of(c) for c in cols])
    stmt = F.concat(
        F.lit(f"INSERT INTO {table} ({','.join(cols)}) VALUES ("), values, F.lit(");")
    )
    return frame.select(stmt.alias("line"))


def write_sql_dump(frame: DataFrame, table: str, path: str) -> None:
    sql_dump_lines(frame, table).coalesce(1).write.mode("overwrite").text(path)
