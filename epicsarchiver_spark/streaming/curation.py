"""Streaming document intake — the curation chain as a live pipeline.

A crawl/firehose lands documents continuously; the same gates the batch
``operators.curation`` chain certifies must run on the stream so junk
never reaches the training store. Stages, in order:

1. heuristic gate — Gopher rules + quality score, pure expressions on
   the micro-batch (stateless, identical columns to the batch twin);
2. in-stream exact dedup — first document per text fingerprint wins,
   later copies drop (``dropDuplicates`` keyed state; pass a watermark
   column to bound state in production — without it state grows with
   the distinct-fingerprint count, exactly like the batch distinct);
3. standing-corpus dedup — stream-static LEFT ANTI join against the
   fingerprint table of everything already archived. NOTE: Spark
   snapshots the static side's FILE LISTING when the read is planned,
   so a compaction/append of the corpus table requires a stream
   restart to be seen — the cron'd availableNow drain (the default
   ``pvarch land`` shape) re-plans every run and gets this for free.

The heavy fuzzy/semantic stages (MinHash bands, SemDeDup) are
deliberately NOT in-stream: they need corpus-wide context and run as
the batch operators over the landed output — the standard lambda split
for dedup at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epicsarchiver_spark.functions.text import fingerprint64
from epicsarchiver_spark.operators.text_ops import gopher_rules, mojibake_stats


def curated_doc_stream(
    docs: DataFrame,
    corpus_fingerprints: DataFrame | None = None,
    text: str = "text",
    id_col: str = "doc_id",
    watermark: tuple[str, str] | None = None,
    max_mojibake_ppm: int | None = None,
) -> DataFrame:
    """Gate a streaming documents frame: rows that fail the Gopher gate,
    exceed ``max_mojibake_ppm`` encoding damage (when set), duplicate an
    earlier in-stream fingerprint, or match the standing
    ``corpus_fingerprints`` (a static frame with an ``fp`` column) never
    appear. Output = every input column plus ``(n_words, fp)``.
    ``watermark=(col, delay)`` bounds the dedup state via
    ``dropDuplicatesWithinWatermark`` — the key stays ``fp`` ALONE
    (first fingerprint wins; keying on (fp, event-time) would wave the
    same fingerprint through at a different timestamp), the watermark
    only bounds how long a fingerprint is remembered. Omit it only for
    bounded (availableNow) replays, where plain ``dropDuplicates``
    state lives for the run.

    The Gopher signals are the SAME expression columns as the certified
    batch operator (one projection, no state); the only stateful piece
    is the fingerprint dedup."""
    if watermark is not None:
        docs = docs.withWatermark(*watermark)
    # passthrough keeps the full row through the (stateless) gate
    # projection — joining the signals back would be a stream-stream join
    thru = tuple(c for c in docs.columns if c != id_col)
    if max_mojibake_ppm is not None:
        # encoding-damage screen ahead of the Gopher gate — the SAME
        # certified expressions as the doc_mojibake batch gate (a
        # stateless projection, r11 plan audit: zero shuffle)
        moji = mojibake_stats(docs, text=text, id_col=id_col, passthrough=thru)
        docs = moji.filter(
            F.coalesce(F.col("mojibake_ppm"), F.lit(0)) <= int(max_mojibake_ppm)
        ).select(F.col(id_col), *[F.col(c) for c in thru])
    sig = gopher_rules(docs, text=text, id_col=id_col, passthrough=thru)
    base = sig.filter(F.col("keep")).select(
        F.col(id_col), *[F.col(c) for c in thru], F.col("n_words")
    )
    fp = base.withColumn("fp", fingerprint64(F.col(text)))
    if watermark is not None:
        survivors = fp.dropDuplicatesWithinWatermark(["fp"])
    else:
        survivors = fp.dropDuplicates(["fp"])
    if corpus_fingerprints is not None:
        survivors = survivors.join(
            F.broadcast(corpus_fingerprints.select("fp")), "fp", "left_anti"
        )
    return survivors


def landing_query(
    survivors: DataFrame,
    out_path: str,
    checkpoint: str,
    partition_by: str = "source",
):
    """Write the curated stream to the landing store: parquet append
    partitioned by ``partition_by`` (source-partitioned layout keeps the
    downstream per-source batch jobs — mixture planning, per-source
    reports — pruning at the directory level)."""
    return (
        survivors.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(partition_by)
        .outputMode("append")
    )
