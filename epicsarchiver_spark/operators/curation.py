"""End-to-end corpus-curation composition: the RefinedWeb/FineWeb-style
stage chain (heuristic filter → exact dedup → fuzzy dedup → benchmark
decontamination) expressed as ONE declarative plan that emits a
first-failing-stage verdict per document.

The per-stage operators live in ``text_ops`` / ``dedup``; this module is
the audit view a pipeline owner actually reads: where did each document
die, and what survived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epicsarchiver_spark.functions.text import fingerprint64
from epicsarchiver_spark.operators import dedup
from epicsarchiver_spark.operators.text_ops import contamination_overlap, gopher_rules

# stage priorities: lower = earlier in the chain = wins the verdict
_STAGES = [(2, "gopher"), (3, "exact_dup"), (4, "near_dup"), (5, "contaminated")]


def pipeline_verdicts(
    docs: DataFrame,
    bench_mod: int = 97,
    jaccard_threshold: float = 0.05,
    shingle_k: int = 2,
    contamination_n: int = 3,
    contamination_threshold: float = 0.05,
    text: str = "text",
    id_col: str = "doc_id",
    near_dup: str = "jaccard",
    near_dup_kw: dict | None = None,
) -> DataFrame:
    """Per-document curation verdict ``(doc_id, stage, kept)`` where
    ``stage`` is the FIRST stage that would remove the doc, in pipeline
    order: ``benchmark`` (the held-out eval split, id % bench_mod == 0 —
    never trained on), ``gopher`` (Rae et al. 2021 heuristic rules),
    ``exact_dup`` (a smaller-id byte-identical copy exists),
    ``near_dup`` (a smaller-id fuzzy duplicate at/above the Jaccard
    threshold exists), ``contaminated`` (distinct-n-gram overlap with
    the benchmark split at/above ``contamination_threshold``), else
    ``kept``.

    Stage signals are computed CORPUS-WIDE and composed by priority —
    this is the audit view (each per-stage operator is independently
    certified); a production run that wants dedup evaluated on the
    post-filter survivor set chains the underlying operators instead.
    The near-dup stage inherits ``jaccard_pairs_blocked``'s default
    blocking key: ``docs`` must carry ``lang`` and ``n_chars`` columns
    (the driver documents schema has both).

    ``near_dup``: ``"jaccard"`` (default) is the EXACT blocked set-
    similarity join — oracle-certified, but Σ block² work: the ×10
    scale probe measured 78 s where banded MinHash took 6.7 s, because
    blocks densify with the corpus. ``"minhash"`` switches the stage to
    ``minhash_near_duplicates`` (banded signatures, candidates-only
    verification — the 100 TB shape); its estimated-Jaccard threshold
    reuses ``jaccard_threshold``. ``near_dup_kw`` forwards extra lane
    parameters (minhash: ``num_hashes``/``bands``/``seed``/``basis``;
    jaccard: ``band_width``-style blocking knobs) so a deployment can
    tune the LSH S-curve without bypassing the composite.

    Scale shape: every drop-list reduces to bare (id, priority) rows
    before anything joins — gopher is a narrow scan, exact-dup a
    fingerprint aggregate, near-dup the blocked shingle join (ids out),
    contamination a broadcast n-gram probe — then ONE union → min(pri)
    per id → one left join against the id spine. Text is scanned by
    each signal but never shuffled; the only doc-keyed exchange is the
    final priority merge."""
    spine = docs.select(F.col(id_col))

    g = (
        gopher_rules(docs, text=text, id_col=id_col)
        .filter(~F.col("keep"))
        .select(F.col(id_col), F.lit(2).alias("_pri"))
    )

    # (id, fp) feeds both the min-id aggregate and the copy join. A
    # persist was tried here (r13, kept on a neutral measurement) and
    # REVERTED in r14: the driver measured the gate −10% with it, and a
    # fresh same-JVM interleaved A/B confirms (persist 3.90 s / plain
    # 3.33 s median of 6 at sf0.1) — the join needs hash(_fp) on both
    # sides and keep_fp derives from the same exchange, so ReuseExchange
    # already computes the fingerprint scan once; the cache
    # materialization was pure overhead (the r13 ReuseExchange lesson).
    fps = docs.select(F.col(id_col), fingerprint64(F.col(text)).alias("_fp"))
    keep_fp = fps.groupBy("_fp").agg(F.min(id_col).alias("_kid"))
    e = (
        fps.join(keep_fp, "_fp")
        .filter(F.col(id_col) != F.col("_kid"))
        .select(F.col(id_col), F.lit(3).alias("_pri"))
    )

    if near_dup == "minhash":
        nd_pairs = dedup.minhash_near_duplicates(
            docs,
            threshold=jaccard_threshold,
            text=text,
            id_col=id_col,
            shingle_k=shingle_k,
            **(near_dup_kw or {}),
        )
    elif near_dup == "jaccard":
        nd_pairs = dedup.jaccard_pairs_blocked(
            docs,
            text=text,
            id_col=id_col,
            shingle_k=shingle_k,
            threshold=jaccard_threshold,
            **(near_dup_kw or {}),
        )
    else:
        raise ValueError(f"near_dup must be 'jaccard' or 'minhash': {near_dup!r}")
    nd = (
        nd_pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .select(F.col(id_col), F.lit(4).alias("_pri"))
    )

    cont = (
        contamination_overlap(
            docs.filter(F.col(id_col) % bench_mod != 0),
            docs.filter(F.col(id_col) % bench_mod == 0),
            n=contamination_n,
            text=text,
            id_col=id_col,
        )
        .filter(F.col("contaminated_frac") >= F.lit(contamination_threshold))
        .select(F.col(id_col), F.lit(5).alias("_pri"))
    )

    drops = g.unionByName(e).unionByName(nd).unionByName(cont)
    first = drops.groupBy(id_col).agg(F.min("_pri").alias("_pri"))

    stage = (
        F.when(F.col(id_col) % bench_mod == 0, F.lit("benchmark"))
        .when(F.col("_pri") == 2, F.lit("gopher"))
        .when(F.col("_pri") == 3, F.lit("exact_dup"))
        .when(F.col("_pri") == 4, F.lit("near_dup"))
        .when(F.col("_pri") == 5, F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return (
        spine.join(first, id_col, "left")
        .select(F.col(id_col), stage.alias("stage"))
        .withColumn("kept", F.col("stage") == "kept")
    )


def pipeline_funnel(verdicts: DataFrame) -> DataFrame:
    """Stage-level rollup of ``pipeline_verdicts``: docs per verdict
    stage plus the share of the corpus — the one-glance funnel chart
    behind every curation report. Input-agnostic: any frame with a
    ``stage`` column works."""
    totals = verdicts.agg(F.count(F.lit(1)).alias("_n"))
    return (
        verdicts.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(totals))
        .select(
            "stage",
            "n_docs",
            F.round(F.col("n_docs") / F.col("_n"), 6).alias("share"),
        )
    )


def write_components(components: DataFrame, path: str) -> None:
    """Persist a ``(id, component)`` frame from
    ``dedup.connected_components`` as the corpus's DEPLOYMENT artifact.
    The connected-components iteration is the expensive step of a dedup
    pipeline (checkpointed rounds over the candidate-pair graph); every
    downstream consumer — shard layout, survivor selection, leakage
    audits — only needs the resolved labels. Writing them once per
    corpus release and reading them back (mirror of the persisted
    IVF-PQ index in ``similarity.ivfpq_topk(index=...)``) turns those
    consumers from "rebuild the graph" into a 16-byte-per-doc parquet
    scan. Repartitioned by id so a later id-keyed join can prune files."""
    components.select("id", "component").repartition("id").write.mode(
        "overwrite"
    ).parquet(path)


def shard_by_component(
    docs: DataFrame,
    components: DataFrame | str,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup-aware shard layout: route every document to the shard of
    its near-dup GROUP ROOT (hash of the component representative), so
    all copies of a duplicate cluster land in the same output shard —
    the property that lets a later per-shard dedup pass run with no
    cross-shard traffic, and that keeps eval-split leakage checks local.
    Returns per-shard stats ``(shard, n_docs, n_groups,
    max_group_size)``.

    ``components`` is the ``(id, component)`` frame from
    ``dedup.connected_components``, or a path to the parquet artifact
    written by ``write_components`` — the production shape, where the
    CC iteration ran once at corpus-release time and sharding is a
    join against 16-byte rows. Documents absent from it (never in
    any candidate pair) are their own singleton root via the left join.
    The shard hash is the oracle-portable 60-bit md5 (any engine
    reproduces the layout — shard assignment must be stable across the
    engines that read the corpus). Shapes: one id-keyed left join, two
    bounded aggregates (groups, then shards)."""
    from epicsarchiver_spark.functions.hashing import md5_hash60

    if isinstance(components, str):
        components = docs.sparkSession.read.parquet(components)
    comp = components.select(
        F.col("id").alias(id_col), F.col("component").alias("_root")
    )
    rooted = (
        docs.select(F.col(id_col))
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_root"), F.col(id_col)).alias("root"),
        )
    )
    sharded = rooted.withColumn(
        "shard",
        F.pmod(md5_hash60(F.col("root").cast("string")), F.lit(n_shards)).cast("int"),
    )
    groups = sharded.groupBy("shard", "root").agg(F.count(F.lit(1)).alias("_gsz"))
    return groups.groupBy("shard").agg(
        F.sum("_gsz").alias("n_docs"),
        F.count(F.lit(1)).alias("n_groups"),
        F.max("_gsz").alias("max_group_size"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Corpus changelog between two snapshots: per source, how many
    documents were added, removed, and carried over — by exact text
    fingerprint, so a re-crawled page with identical content counts as
    unchanged regardless of its id. The review artifact every corpus
    release ships (and the sanity gate before a retrain: a source whose
    removed-count spikes usually lost a crawler, not its content).

    Both sides reduce to DISTINCT (source, fp) pairs map-side before the
    full outer join — 16-byte keys, text never shuffles; the rollup is a
    source-keyed aggregate of three conditional counts in one pass."""
    o = old.select(
        F.col(source_col).alias("source"), fingerprint64(F.col(text)).alias("fp")
    ).distinct().withColumn("_o", F.lit(1))
    n = new.select(
        F.col(source_col).alias("source"), fingerprint64(F.col(text)).alias("fp")
    ).distinct().withColumn("_n", F.lit(1))
    j = o.join(n, ["source", "fp"], "full_outer")
    return j.groupBy("source").agg(
        F.sum(F.when(F.col("_o").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("_n").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(
            F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), 1).otherwise(0)
        ).alias("n_unchanged"),
    )


def split_leakage(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    assignment: DataFrame | None = None,
) -> DataFrame:
    """Cross-split contamination audit: near-dup pairs that STRADDLE the
    deterministic train/val/test boundaries — the leakage every eval
    suite silently suffers when dedup runs before splitting but not
    ACROSS splits (a test doc whose near-twin sits in train is a free
    answer). ``pairs`` is any certified candidate-pair frame
    (``jaccard_pairs_blocked``, ``minhash_near_duplicates``,
    ``winnow_matches`` — the audit is lane-agnostic). Returns one row
    per unordered split pair ``(split_a, split_b, n_pairs)``; an empty
    result is the state a leakage-free release requires.

    Scale shape: the split dimension is a pure expression over the id
    spine (``assign_splits`` — no shuffle to build); the pair frame
    carries bare ids, so both attach joins move 8-byte keys and AQE
    broadcasts the spine side when it fits. The rollup is at most
    |splits|²/2 rows.

    ``assignment`` audits an EXPLICIT ``(id_col, split)`` frame instead
    of the default id-hash assignment — pass the same frame the release
    ships (e.g. ``component_splits``' output) so the gate audits the
    assignment actually used, not a parallel one (ADVICE r7: the
    component-rooted ``splits()`` is leakage-free by construction, but
    the gate could only audit the plain hash)."""
    from epicsarchiver_spark.operators.text_ops import assign_splits

    if assignment is not None:
        s = assignment.select(F.col(id_col), "split")
    else:
        s = assign_splits(docs.select(F.col(id_col)), key_col=id_col, splits=splits)
    sa = s.select(F.col(id_col).alias("id_a"), F.col("split").alias("_sa"))
    sb = s.select(F.col(id_col).alias("id_b"), F.col("split").alias("_sb"))
    straddle = (
        pairs.select("id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("_sa") != F.col("_sb"))
    )
    return straddle.groupBy(
        F.least("_sa", "_sb").alias("split_a"),
        F.greatest("_sa", "_sb").alias("split_b"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


def component_splits(
    docs: DataFrame,
    components: DataFrame | str,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    buckets: int = 10_000,
) -> DataFrame:
    """Leakage-free train/val/test assignment: hash the near-dup GROUP
    ROOT, not the document id, so every member of a duplicate cluster
    lands in the same split — the constructive fix for exactly what
    ``split_leakage`` audits (a test doc whose near-twin sits in train
    is a free answer; rooting the split hash makes that structurally
    impossible for any pair the dedup lane caught). Returns
    ``(doc_id, root, split)``.

    ``components`` is the ``(id, component)`` frame from
    ``dedup.connected_components`` or the parquet artifact path from
    ``write_components`` — the per-release cadence: resolve groups
    once, then every split/shard/leakage consumer is an id-keyed join
    against 16-byte rows. Docs in no candidate pair are their own
    singleton root (left join + coalesce), reproducing the plain
    ``assign_splits`` assignment for them. The split itself is the same
    oracle-portable md5-bucket range map as ``assign_splits`` — pure
    expressions on the joined frame, no extra shuffle beyond the one
    id-keyed join (AQE broadcasts the label side when it fits)."""
    from epicsarchiver_spark.operators.text_ops import assign_splits

    if isinstance(components, str):
        components = docs.sparkSession.read.parquet(components)
    comp = components.select(
        F.col("id").alias(id_col), F.col("component").alias("_root")
    )
    rooted = (
        docs.select(F.col(id_col))
        .join(comp, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("_root"), F.col(id_col)).alias("root"))
    )
    return assign_splits(rooted, key_col="root", splits=splits, buckets=buckets).select(
        id_col, "root", "split"
    )


def soft_dedup(
    docs: DataFrame,
    components: DataFrame | str,
    max_per_group: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap-m dedup — keep UP TO ``max_per_group`` members of every
    duplicate cluster instead of exactly one: the distribution-
    preserving knob real pretraining mixes use when hard dedup would
    flatten naturally-frequent content (boilerplate-adjacent but
    legitimate pages, popular quotes) to a single exemplar.
    ``max_per_group=1`` degenerates to hard dedup's keep-min-id rule.
    Returns the full id spine ``(doc_id, group_root, rank_in_group,
    kept)``; singletons rank 1 and are always kept.

    ``components`` is the ``(id, component)`` frame or the
    ``write_components`` parquet artifact path — the same persisted
    base every other release-cadence consumer reads, so the call is one
    id-keyed join + one group-keyed rank window over 16-byte rows
    (duplicate-cluster members only carry non-trivial groups; the
    window never sees text)."""
    if isinstance(components, str):
        components = docs.sparkSession.read.parquet(components)
    comp = components.select(
        F.col("id").alias(id_col), F.col("component")
    )
    rooted = (
        docs.select(F.col(id_col))
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("group_root"),
        )
    )
    w = Window.partitionBy("group_root").orderBy(id_col)
    return rooted.select(
        F.col(id_col),
        "group_root",
        F.row_number().over(w).cast("long").alias("rank_in_group"),
        (F.row_number().over(w) <= int(max_per_group)).alias("kept"),
    )


def quality_survivors(
    docs: DataFrame,
    vectors: DataFrame | None = None,
    threshold: float = 0.8,
    n_cells: int = 16,
    dim: int | None = None,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text: str = "text",
    components: DataFrame | str | None = None,
) -> DataFrame:
    """Quality-aware semantic dedup — the cross-modal survivor rule:
    the EMBEDDING side decides what is a duplicate (SemDeDup's
    within-cell cosine evidence), the TEXT side decides what survives
    (the logistic quality score, not the arbitrary lowest id the plain
    drop list implies). Returns the full id spine: ``(doc_id,
    group_root, quality_prob, survivor_id, kept)`` — docs in no
    semantic group are their own singleton survivor.

    Cosine is not transitive, so the drop list's keep pointers CHAIN
    (A~B~C with A≁C); the ``(vec_id, keep_id)`` evidence edges resolve
    into groups via ``dedup.connected_components_star`` first — the same
    root-resolution step the exact-dedup pipeline uses — and the
    argmax-quality pick then runs per GROUP, not per pointer.

    Scale shape: semantic_dedup is the certified per-cell blocked GEMM
    (pair work fenced at Σ cell², never n²); the component build runs
    on DROP-LIST edges — duplicates only, orders of magnitude below
    corpus size — so its checkpointed rounds are cheap; quality is a
    zero-shuffle scan; the winner pick is one max_by hash aggregate on
    the root key (no window sort) and the verdict join brings the
    |groups|-sized winner frame back against the spine (AQE broadcasts
    it when it fits).

    ``components`` short-circuits the expensive half for the release
    cadence: pass the ``(id, component)`` frame (or the parquet artifact
    path from ``write_components``) built ONCE from the semantic drop
    edges, and the call becomes quality scan + two hash joins — the same
    read-back twin pattern as ``dedup_shards(components=)`` /
    ``component_splits(components=)``. ``vectors`` is then unused and
    may be None."""
    from epicsarchiver_spark.operators import dedup, similarity, text_ops

    if components is None:
        if vectors is None:
            raise ValueError("quality_survivors needs vectors or components")
        drops = similarity.semantic_dedup(
            vectors, threshold=threshold, n_cells=n_cells, dim=dim, id_col=vec_id_col
        )
        comp = dedup.connected_components_star(
            drops.select(
                F.col(vec_id_col).alias("id_a"), F.col("keep_id").alias("id_b")
            )
        )
    else:
        if isinstance(components, str):
            components = docs.sparkSession.read.parquet(components)
        comp = components.select("id", "component")
    quality = text_ops.quality_classifier(docs, text=text, id_col=id_col).select(
        F.col(id_col), "quality_prob"
    )
    # r13: a members persist here measured 2× SLOWER (5.0 → 10.3 s) —
    # ReuseExchange already shares the subtree between the winner
    # aggregate and the verdict join; the cache only blocked pipelining
    members = (
        quality.join(
            comp.select(F.col("id").alias(id_col), "component"), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("group_root"),
            "quality_prob",
        )
    )
    winners = members.groupBy("group_root").agg(
        F.max_by(
            F.col(id_col), F.struct(F.col("quality_prob"), (-F.col(id_col)).alias("_t"))
        ).alias("survivor_id")
    )
    return members.join(winners, "group_root").select(
        F.col(id_col),
        "group_root",
        "quality_prob",
        "survivor_id",
        (F.col(id_col) == F.col("survivor_id")).alias("kept"),
    )
