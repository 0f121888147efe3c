"""S7 — PV-list file source.

Format (behavioral spec from epicsarchiver/cache.py:570-588 and fixture
shape test/PV_File1.txt): one or more PV names per line, space/comma
separated; ``#`` starts a comment; blank lines ignored; names sharing a
line become related pairs with score 10.

Spark formulation: spark.read.text → split/explode for the names,
posexplode pair-generation for the same-line edges. Distributed — a
3 754-line production list (sql/pvlist.txt) or a 100 M-line one parse the
same way."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epicsarchiver_spark.functions.scalar import normalize_pvname

PAIR_SCORE = 10

# motor record sibling fields auto-archived with a motor .VAL
# (ref epicsarchiver/util.py:15-16, applied cache.py:544-559)
MOTOR_FIELDS = (
    ".VAL",
    ".OFF",
    ".FOFF",
    ".SET",
    ".HLS",
    ".LLS",
    ".DIR",
    "_able.VAL",
    ".SPMG",
    ".DESC",
)


def expand_motor_fields(names: DataFrame, name_col: str = "pvname") -> DataFrame:
    """Catalog expansion for motor PVs: each ``<prefix>.VAL`` name fans
    out to the full motor field family (ref epicsarchiver/cache.py:544-559
    — there gated on a live `.RTYP == 'motor'` read; batch-side the
    caller supplies the names already known to be motors). Returns
    (pvname, base) rows — base links fields of one motor for pair
    scoring."""
    vals = names.filter(F.col(name_col).endswith(".VAL")).select(
        F.regexp_replace(name_col, r"\.VAL$", "").alias("base")
    )
    fields = F.array(*[F.lit(s) for s in MOTOR_FIELDS])
    return vals.select(
        "base", F.explode(fields).alias("_suffix")
    ).select(F.concat(F.col("base"), F.col("_suffix")).alias("pvname"), "base")


def _lines(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.text(path)
    cleaned = F.trim(F.regexp_replace(F.col("value"), "#.*$", ""))
    return (
        raw.select(cleaned.alias("line"))
        .filter(F.col("line") != "")
        .select(
            F.filter(F.split("line", r"[\s,]+"), lambda t: t != "").alias("names")
        )
    )


def read_pvlist(spark: SparkSession, path: str) -> DataFrame:
    """→ (pvname) frame, normalized (`.VAL` appended when no field),
    deduped, input order not guaranteed (set semantics, as the reference
    inserts into a keyed table)."""
    return (
        _lines(spark, path)
        .select(F.explode("names").alias("raw_name"))
        .select(normalize_pvname(F.col("raw_name")).alias("pvname"))
        .distinct()
    )


def pvlist_pairs(spark: SparkSession, path: str) -> DataFrame:
    """→ (pv1, pv2, score) edges for names sharing a line
    (ref cache.py:584-587: set_pair_score(p1, p2, score=10) for all
    same-line combinations), canonicalized pv1 < pv2."""
    lines = _lines(spark, path).filter(F.size("names") >= 2)
    norm = lines.select(
        F.transform("names", lambda n: normalize_pvname(n)).alias("names")
    )
    a = norm.select(F.posexplode("names").alias("i", "pv1"), F.col("names"))
    pairs = a.select(
        "pv1", F.explode(F.slice("names", F.col("i") + 2, F.size("names"))).alias("pv2")
    )
    return (
        pairs.select(
            F.least("pv1", "pv2").alias("pv1"),
            F.greatest("pv1", "pv2").alias("pv2"),
        )
        .filter(F.col("pv1") != F.col("pv2"))
        .distinct()
        .withColumn("score", F.lit(PAIR_SCORE))
    )
