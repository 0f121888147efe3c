"""Text sinks — S9 (ASCII data files), S12 (plot JSON), S13 (save/restore
scripts).

Row formatting happens JVM-side (`format_string`/`date_format`); only the
final write is an edge concern. Headers are tiny driver-side strings."""

from __future__ import annotations

import json

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


# --- S12: plot-JSON sink (ref epicsarchiver/web_utils.py:177-237) -------

# the reference's fixed trace color cycle (web_utils.py:174-175)
PLOT_COLORS = (
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
)  # fmt: skip


def plot_traces(frame: DataFrame, key: str = "pvname") -> DataFrame:
    """S12 data plane — one row per series with aligned (x-ISO, y) arrays,
    built entirely JVM-side: time-ordered collect_list per series, then a
    single `transform` pass formatting x exactly as the reference's ts2iso
    (web_utils.py:24-29, applied at make_plot's trace loop 193-199).

    Callers decimate first (``cull_data``, ref webapp.py:396-401) so every
    series is ≤ ~30 k points — the per-series array then fits comfortably
    in one aggregation buffer, which is what makes collect_list the right
    tool here rather than a scale hazard."""
    pts = F.sort_array(F.collect_list(F.struct("time", "value")))
    return (
        frame.groupBy(key)
        .agg(pts.alias("_pts"))
        .select(
            key,
            F.transform(
                "_pts",
                lambda p: F.date_format(
                    F.timestamp_seconds(p["time"]), "yyyy-MM-dd HH:mm:ss.SSS"
                ),
            ).alias("x"),
            F.transform("_pts", lambda p: p["value"]).alias("y"),
        )
    )


def _auto_ylog(ys: list[float]) -> bool:
    """ref web_utils.py:113-128 auto_ylog: log-scale when the positive
    1-99 percentile spread exceeds 200× (disabled upstream; kept faithful
    and off by default here too)."""
    pos = sorted(v for v in ys if v is not None and v > 1.0e-150)
    if not pos or min(ys) < 0:
        return False
    x01 = pos[max(0, int(0.01 * (len(pos) - 1)))]
    x99 = pos[int(0.99 * (len(pos) - 1))]
    return x99 > 200 * x01


def make_plot_json(
    traces: list,
    labels: dict[str, str] | None = None,
    enum_labels: dict[str, list[str]] | None = None,
    force_ylog: set[str] | frozenset[str] = frozenset(),
    auto_ylog: bool = False,
    width: int = 625,
    height: int = 525,
) -> str | None:
    """S12 presentation edge — assemble the reference's plotly figure JSON
    (web_utils.py:177-237: step-line 'hv' traces, one y-axis per trace
    anchored right of the first, enum tick labels, fixed color cycle) from
    ``plot_traces`` rows. Pure driver-side dict assembly over a handful of
    already-aggregated traces; returns None for an empty plot exactly as
    the reference does."""
    labels = labels or {}
    enum_labels = enum_labels or {}
    data, layout_axes = [], {}
    ntraces = len(traces)
    domwid = 1.07 - 0.09 * (ntraces - 1)
    xdomain = [0.1, domwid]
    for i, row in enumerate(traces):
        name, xs, ys = row["pvname"], list(row["x"]), list(row["y"])
        ykey = f"y{i + 1}" if i else "y"
        data.append(
            {
                "x": xs,
                "y": ys,
                "name": name,
                "mode": "lines+markers",
                "yaxis": ykey,
                "line": {"width": 3, "shape": "hv"},
            }
        )
        color = PLOT_COLORS[i % len(PLOT_COLORS)]
        yax: dict = {
            "title": {"text": labels.get(name, name), "color": color},
            "zeroline": False,
            "type": "linear",
            "titlefont": {"color": color},
            "tickfont": {"color": color},
        }
        if name in force_ylog or (auto_ylog and _auto_ylog(ys)):
            yax.update({"type": "log", "tickformat": ".3g"})
        if name in enum_labels:
            tvals = list(range(len(enum_labels[name])))
            yax.update(
                {
                    "ticktext": enum_labels[name],
                    "tickvals": tvals,
                    "range": (-0.25, len(tvals) + 0.25),
                }
            )
            xdomain = [0.15, domwid]
        if i > 0:
            yax.update(
                {
                    "anchor": "free",
                    "side": "right",
                    "overlaying": "y",
                    "showgrid": False,
                    "position": domwid + 0.09 * (i - 1),
                }
            )
        layout_axes[ykey.replace("y", "yaxis", 1)] = yax

    if not data:
        return None
    layout = {
        "width": width,
        "height": height,
        "bgcolor": "#FEFEFE",
        "hovermode": "closest",
        "showlegend": True,
        "legend": {
            "borderwidth": 0.5,
            "bgcolor": "#F2F2F2",
            "orientation": "h",
            "x": 0.1,
            "y": 1.15,
            "yanchor": "top",
            "font": {"size": 10},
        },
        "xaxis": {"title": {"text": "Date"}, "domain": xdomain},
        **layout_axes,
    }
    config = {
        "displaylogo": False,
        "modeBarButtonsToRemove": [
            "hoverClosestCartesian",
            "hoverCompareCartesian",
            "toggleSpikelines",
            "select2d",
            "lasso2d",
        ],
    }
    return json.dumps({"data": data, "layout": layout, "config": config})


def write_plot_json(frame: DataFrame, path: str, **plot_kw) -> str | None:
    """S12 — distributed trace aggregation, then one small JSON document
    at the edge (the figure is a presentation artifact; post-cull it is a
    few × ≤30 k points)."""
    doc = make_plot_json(plot_traces(frame).orderBy("pvname").collect(), **plot_kw)
    if doc is not None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(doc)
    return doc


def read_ascii(spark, path: str, pvname: str) -> DataFrame:
    """S9 inverse — parse the `time  value  YYYYMMDD HHMMSS` data files
    this sink (and the reference's /data/<pv>/ endpoint,
    webapp.py:260-323) emit, back into typed rows: the migration path
    for users holding exported ASCII archives. Comment (#) and blank
    lines are skipped; ``value`` is a lenient double (``try_cast`` —
    enum/string archives keep ``value_raw``), the redundant date stamp
    is preserved for audit. All parsing is JVM-side split/cast — the
    file scan distributes like any text source, one narrow pass, no
    Python in the loop."""
    raw = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        raw.filter(~F.col("value").startswith("#"))
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.lit(pvname).alias("pvname"),
            F.element_at(toks, 1).cast("double").alias("time"),
            F.element_at(toks, 2).alias("value_raw"),
            F.element_at(toks, 2).try_cast("double").alias("value"),
            F.concat_ws(" ", F.element_at(toks, 3), F.element_at(toks, 4)).alias(
                "stamp"
            ),
        )
    )
