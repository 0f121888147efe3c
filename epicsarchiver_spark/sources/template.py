"""S8 — template status-page source.

Format (behavioral spec from epicsarchiver/web/WebStatus.py:137-191 and
the compiler web_utils.py:269-323): lines of ``pv1[,pv2,…] | description |
format`` where format is a printf pattern (``%8.3f``) or ``yes/no``;
``[Section]`` headers; ``--`` horizontal rule; ``<>`` spacer; ``#``
comments. Produces a page-model frame the serving layer joins against the
latest-value cache (J7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_template(spark: SparkSession, path: str) -> DataFrame:
    """→ (line_no, section, kind, pvnames array<string>, description,
    format) — kind ∈ {'row','rule','spacer'}; section carried forward via
    a LOCF window over line order."""
    raw = spark.read.text(path).withColumn(
        "line_no", F.monotonically_increasing_id()
    )
    lines = raw.select(
        "line_no", F.trim(F.col("value")).alias("line")
    ).filter((F.col("line") != "") & ~F.col("line").startswith("#"))

    section_hdr = F.regexp_extract("line", r"^\[(.+)\]$", 1)
    parsed = lines.select(
        "line_no",
        F.when(section_hdr != "", section_hdr).alias("new_section"),
        F.col("line"),
    )
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    with_section = parsed.select(
        "line_no",
        F.coalesce(F.last("new_section", ignorenulls=True).over(w), F.lit("")).alias(
            "section"
        ),
        "line",
        F.col("new_section").isNotNull().alias("is_header"),
    ).filter(~F.col("is_header"))

    parts = F.split("line", r"\s*\|\s*")
    return with_section.select(
        "line_no",
        "section",
        F.when(F.col("line") == "--", F.lit("rule"))
        .when(F.col("line") == "<>", F.lit("spacer"))
        .otherwise(F.lit("row"))
        .alias("kind"),
        F.when(
            ~F.col("line").isin("--", "<>"),
            F.filter(F.split(F.element_at(parts, 1), r"[\s,]+"), lambda t: t != ""),
        ).alias("pvnames"),
        F.when(F.size(parts) >= 2, F.element_at(parts, 2)).alias("description"),
        F.when(F.size(parts) >= 3, F.element_at(parts, 3)).alias("format"),
    )


def page_model(template: DataFrame, cache: DataFrame) -> DataFrame:
    """J7 — resolve every template row's PV names against the latest-value
    cache (broadcast hash join of the small name set against the cache
    table; ref epicsarchiver/webapp.py:52-76,360-369)."""
    rows = (
        template.filter(F.col("kind") == "row")
        .select("line_no", "section", "description", "format", F.explode("pvnames").alias("pvname"))
    )
    return rows.join(cache, "pvname", "left").orderBy("line_no")
