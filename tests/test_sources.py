"""File-format source/sink tests (S7/S8/S9/S13) on synthetic fixtures
matching the reference's documented formats (FIXTURES.md §10)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.sources.pvlist import pvlist_pairs, read_pvlist
from epicsarchiver_spark.sources.sinks import ascii_rows, saverestore_lines
from epicsarchiver_spark.sources.template import page_model, read_template

PVLIST = """\
# a comment line
XXX:m1.VAL
XXX:m2.VAL XXX:m3.VAL
YYY:scaler1 , YYY:scaler2  # trailing comment

XXX:m1.VAL XXX:m2.VAL
"""

TEMPLATE = """\
# status page
[Section One]
XXX:m1.VAL | Motor 1 | %8.3f
XXX:m2.VAL,XXX:m3.VAL | Motors 2+3 | yes/no
--
[Section Two]
<>
YYY:scaler1.VAL | Scaler | %d
"""


@pytest.fixture()
def pvlist_file(tmp_path):
    p = tmp_path / "pvlist.txt"
    p.write_text(PVLIST)
    return str(p)


@pytest.fixture()
def template_file(tmp_path):
    p = tmp_path / "page.txt"
    p.write_text(TEMPLATE)
    return str(p)


def test_read_pvlist(spark, pvlist_file):
    names = {r.pvname for r in read_pvlist(spark, pvlist_file).collect()}
    assert names == {
        "XXX:m1.VAL",
        "XXX:m2.VAL",
        "XXX:m3.VAL",
        "YYY:scaler1.VAL",  # .VAL appended (C1)
        "YYY:scaler2.VAL",
    }


def test_pvlist_pairs(spark, pvlist_file):
    pairs = {
        (r.pv1, r.pv2, r.score) for r in pvlist_pairs(spark, pvlist_file).collect()
    }
    assert pairs == {
        ("XXX:m2.VAL", "XXX:m3.VAL", 10),
        ("YYY:scaler1.VAL", "YYY:scaler2.VAL", 10),
        ("XXX:m1.VAL", "XXX:m2.VAL", 10),
    }


def test_read_template(spark, template_file):
    rows = read_template(spark, template_file).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert len(by_kind["rule"]) == 1 and by_kind["rule"][0].section == "Section One"
    assert len(by_kind["spacer"]) == 1 and by_kind["spacer"][0].section == "Section Two"
    data_rows = by_kind["row"]
    assert [list(r.pvnames) for r in data_rows] == [
        ["XXX:m1.VAL"],
        ["XXX:m2.VAL", "XXX:m3.VAL"],
        ["YYY:scaler1.VAL"],
    ]
    assert [r.format for r in data_rows] == ["%8.3f", "yes/no", "%d"]


def test_page_model_join(spark, template_file):
    cache = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["XXX:m1.VAL", "XXX:m2.VAL", "YYY:scaler1.VAL"],
                "value": ["1.5", "2.5", "100"],
            }
        )
    )
    model = page_model(read_template(spark, template_file), cache).collect()
    vals = {(r.pvname, r.value) for r in model}
    assert ("XXX:m1.VAL", "1.5") in vals
    assert ("XXX:m3.VAL", None) in vals  # missing from cache -> left join null


def test_expand_motor_fields(spark):
    from epicsarchiver_spark.sources.pvlist import MOTOR_FIELDS, expand_motor_fields

    names = spark.createDataFrame(
        pd.DataFrame({"pvname": ["XXX:m1.VAL", "XXX:scaler.CNT"]})
    )
    got = expand_motor_fields(names).collect()
    assert {r.base for r in got} == {"XXX:m1"}
    assert {r.pvname for r in got} == {f"XXX:m1{s}" for s in MOTOR_FIELDS}


def test_enum_strs_json_round_trip(spark):
    from pyspark.sql import functions as F

    from epicsarchiver_spark.functions.scalar import enum_strs_from_json, enum_strs_to_json

    df = spark.createDataFrame(pd.DataFrame({"data": ['["Off","On","Fault"]']}))
    arr = df.select(enum_strs_from_json(F.col("data")).alias("a"))
    assert list(arr.head().a) == ["Off", "On", "Fault"]
    back = arr.select(enum_strs_to_json(F.col("a")).alias("j")).head().j
    assert back == '["Off","On","Fault"]'


def test_ascii_rows(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"pvname": ["A"], "time": [1704067200.0], "value": [3.25]})
    )
    line = ascii_rows(df).head().line
    assert line == "1704067200.000  3.25  20240101 000000"


def test_saverestore_formats(spark):
    df = spark.createDataFrame(pd.DataFrame({"pvname": ["A.VAL"], "value": [2.5]}))
    assert saverestore_lines(df, "plain").head().line == "A.VAL  2.5"
    assert saverestore_lines(df, "idl").head().line == "s = caput('A.VAL', 2.5)"
    assert saverestore_lines(df, "python").head().line == "caput('A.VAL', 2.5)"
    with pytest.raises(ValueError):
        saverestore_lines(df, "nope")


def test_sql_dump_lines(spark):
    from epicsarchiver_spark.sources.sinks import sql_dump_lines

    df = spark.createDataFrame(
        [("PV:a", 1.5, "it's ok"), ("PV:b", None, None)],
        "pvname string, time double, note string",
    )
    lines = sorted(r.line for r in sql_dump_lines(df, "points").collect())
    assert lines == [
        "INSERT INTO points (pvname,time,note) VALUES ('PV:a',1.5,'it''s ok');",
        "INSERT INTO points (pvname,time,note) VALUES ('PV:b',NULL,NULL);",
    ]


def test_plot_json_sink(spark, tmp_path):
    """S12 round trip: the written document has the reference figure shape
    (web_utils.py:177-237) — step-'hv' traces with ISO x, per-trace y-axes
    anchored right of the first, enum tick labels, None for empty input."""
    import json

    from epicsarchiver_spark.sources.sinks import make_plot_json, write_plot_json

    df = spark.createDataFrame(
        [
            ("PV:a", 1704067200.0, 1.0),
            ("PV:a", 1704067260.5, 2.0),
            ("PV:b", 1704067200.0, 0.0),
        ],
        "pvname string, time double, value double",
    )
    out = str(tmp_path / "plot.json")
    doc = write_plot_json(df, out, enum_labels={"PV:b": ["Off", "On"]})
    fig = json.loads(open(out).read())
    assert json.loads(doc) == fig
    assert set(fig) == {"data", "layout", "config"}

    t_a, t_b = fig["data"]
    assert t_a["name"] == "PV:a" and t_b["name"] == "PV:b"
    assert t_a["line"]["shape"] == "hv" and t_a["yaxis"] == "y"
    assert t_a["x"] == ["2024-01-01 00:00:00.000", "2024-01-01 00:01:00.500"]
    assert t_a["y"] == [1.0, 2.0]
    # second trace: its own axis overlaying the first, on the right
    assert t_b["yaxis"] == "y2"
    ax2 = fig["layout"]["yaxis2"]
    assert ax2["overlaying"] == "y" and ax2["side"] == "right"
    assert ax2["ticktext"] == ["Off", "On"] and ax2["tickvals"] == [0, 1]
    # enum trace shifts the x domain exactly as the reference does
    assert fig["layout"]["xaxis"]["domain"][0] == 0.15

    assert make_plot_json([]) is None


def test_plot_json_ylog(spark):
    from epicsarchiver_spark.sources.sinks import make_plot_json, plot_traces

    df = spark.createDataFrame(
        [("PV:log", 1704067200.0 + i, v) for i, v in enumerate([0.001, 1.0, 500.0] * 40)],
        "pvname string, time double, value double",
    )
    rows = plot_traces(df).collect()
    fig_lin = make_plot_json(rows)
    fig_log = make_plot_json(rows, auto_ylog=True)
    import json

    assert json.loads(fig_lin)["layout"]["yaxis"]["type"] == "linear"
    assert json.loads(fig_log)["layout"]["yaxis"]["type"] == "log"


def test_read_ascii_skips_comments_and_keeps_raw_for_enums(spark, tmp_path):
    """The S9 reader must skip # comments and blank lines, parse numeric
    values, and keep value_raw when the archive holds enum strings."""
    from epicsarchiver_spark.sources.sinks import read_ascii

    p = tmp_path / "data"
    p.mkdir()
    (p / "part-0.txt").write_text(
        "# pv: X:1\n"
        "\n"
        "100.500  1.25  20240108 000140\n"
        "101.000  OPEN  20240108 000141\n"
    )
    rows = {r.time: r for r in read_ascii(spark, str(p), "X:1").collect()}
    assert set(rows) == {100.5, 101.0}
    assert rows[100.5].value == 1.25 and rows[100.5].value_raw == "1.25"
    assert rows[101.0].value is None and rows[101.0].value_raw == "OPEN"
    assert rows[100.5].stamp == "20240108 000140"
    assert all(r.pvname == "X:1" for r in rows.values())
