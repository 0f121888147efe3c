"""Document deduplication operators for the training-data pipeline surface.

Exact (hash-groupBy), MinHash+LSH, SimHash, and blocked n-gram Jaccard —
each expressed as a shuffle-conscious DataFrame plan over a ``documents``
frame ``(doc_id, text, ...)``.

Scale notes (100 TB posture):
- Exact dedup: one hash aggregate on a 16-byte fingerprint — map-side
  partial, no wide rows move.
- MinHash+LSH: candidate generation explodes (band, bucket) keys and
  self-joins *within buckets only* — the classic way to avoid the O(n²)
  similarity join; signatures (64 longs) travel, texts do not. Verification
  re-joins texts only for the candidate pairs.
- SimHash: signature is a single long; near-dup = hamming ≤ r within
  LSH-style bit-block buckets.
- Blocked Jaccard: deterministic cheap blocking key (lang, length band)
  bounds the pair blow-up; exact Jaccard verified on shingle sets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from epicsarchiver_spark.functions.hashing import (
    hamming64,
    lsh_bands,
    minhash_signature_udf,
    shingle_hashes,
    shingle_hashes_md5,
    simhash64_udf,
)
from epicsarchiver_spark.functions.text import fingerprint64, tokens


def _shingle_basis(text_col, shingle_k: int, basis: str):
    """array<long> distinct shingle hashes under the chosen basis, as a
    SINGLE expression.

    "xxhash" (default): string-free sliding xxhash64 combine — fastest,
    JVM-only, NOT reproducible outside Spark. "md5": per-token md5
    hashes combined by the two-lane mod-p sliding fold — bit-for-bit
    reproducible in any SQL engine with md5(), so MinHash/SimHash
    results can be certified against an independent oracle. Both are
    engine-native (no Python, no shingle-string materialization).

    PERF: the k-window fold references the per-token hash array k+1
    times, and in this inline form each reference re-evaluates the whole
    tokenize+hash pipeline (no CSE across expression-tree references) —
    measured ~4× the layered cost at sf0.1 even for k=2. Operators
    should use ``_shingle_basis_frame`` (layered projections) instead;
    this form remains for contexts that need one Column."""
    if basis == "xxhash":
        return shingle_hashes(tokens(text_col), shingle_k)
    if basis == "md5":
        return shingle_hashes_md5(tokens(text_col), shingle_k)
    raise ValueError(f"unknown shingle basis: {basis!r}")


def _shingle_basis_frame(
    docs: DataFrame,
    text: str,
    id_col: str,
    shingle_k: int,
    basis: str,
    extra: tuple = (),
) -> DataFrame:
    """``(id_col, *extra, bh)`` frame of distinct shingle hashes via
    LAYERED projections (the ``window_fold`` contract, same shape as
    winnow_fingerprints): the per-token hash array and the two md5 lanes
    each materialize once as child-projection attributes before the fold
    references them k times — CollapseProject keeps non-cheap
    multi-referenced projections as real attributes instead of cloning
    the tokenize+hash pipeline into every reference. Measured at sf0.1,
    k=2: md5 basis 1.7 s → 0.4 s per evaluation; the xxhash lane gains
    the same shape. ``extra`` columns (blocking keys etc.) pass through.
    """
    from epicsarchiver_spark.functions.hashing import (
        lane_hi,
        lane_lo,
        md5_hash60,
        shingle_fold_xx,
        window_fold,
    )

    keep = [F.col(id_col), *extra]
    if basis == "md5":
        th = docs.select(
            *keep, F.transform(tokens(F.col(text)), md5_hash60).alias("_th")
        )
        lanes = th.select(
            *[F.col(c) for c in th.columns if c != "_th"],
            lane_lo(F.col("_th")).alias("_lo"),
            lane_hi(F.col("_th")).alias("_hi"),
        )
        return lanes.select(
            *[F.col(c) for c in lanes.columns if c not in ("_lo", "_hi")],
            F.array_distinct(
                window_fold(F.col("_lo"), F.col("_hi"), shingle_k)
            ).alias("bh"),
        )
    if basis == "xxhash":
        th = docs.select(
            *keep, F.transform(tokens(F.col(text)), lambda t: F.xxhash64(t)).alias("_th")
        )
        return th.select(
            *[F.col(c) for c in th.columns if c != "_th"],
            F.array_distinct(shingle_fold_xx(F.col("_th"), shingle_k)).alias("bh"),
        )
    raise ValueError(f"unknown shingle basis: {basis!r}")


def _sig_family(basis: str) -> str:
    return "affine31" if basis == "md5" else "xorshift"


def exact_duplicates(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: fingerprint → (canonical keeper, dup count).
    Returns one row per duplicated fingerprint (n_docs >= 2)."""
    return (
        docs.select(F.col(id_col), fingerprint64(F.col(text)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


def dedup_exact(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one doc (min id) per distinct text fingerprint."""
    keep = (
        docs.select(F.col(id_col), fingerprint64(F.col(text)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")


def minhash_signatures(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    basis: str = "xxhash",
) -> DataFrame:
    """The MinHash signature table ``(id, sig: array<long>)`` — the
    artifact a production pipeline writes out ONCE per corpus and reads
    back for every candidate join (self-join and incremental between-
    crawls alike). Pass the persisted frame to ``minhash_candidates(...,
    signatures=)`` / ``minhash_candidates_between(...,
    corpus_signatures=)`` so signatures never recompute per call."""
    # layered-projection layout: tokenize+hash once, THEN the 64-fn
    # family over the materialized array (see functions/hashing.py
    # module note and _shingle_basis_frame)
    base = _shingle_basis_frame(docs, text, id_col, shingle_k, basis)
    return base.select(
        F.col(id_col),
        minhash_signature_udf(num_hashes, seed, _sig_family(basis))(F.col("bh")).alias("sig"),
    )


def minhash_candidates(
    docs: DataFrame | None,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    basis: str = "xxhash",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH candidate pairs with estimated Jaccard from signature
    agreement. Pipeline: shingle → signature → explode band buckets →
    bucket self-join (a.id < b.id) → distinct pair → signature-agreement
    estimate. Only ids+signatures shuffle; bucket join is an equi-join
    Catalyst plans as a shuffled hash join on (band, bucket).

    ``signatures``: a precomputed ``(id, sig)`` frame (from
    ``minhash_signatures``, typically read back from a persisted table).
    When given, ``docs`` may be None and NO caching happens here — the
    caller owns the signature storage, which is the production shape.
    When absent, signatures are derived from ``docs`` and persisted
    lazily for the three consumers in this plan; the caller may
    ``unpersist`` the returned frame's cached ancestor via
    ``spark.catalog.clearCache()`` or simply prefer the signatures= path."""
    rows_per_band = num_hashes // bands
    if signatures is not None:
        sigs = signatures.select(F.col(id_col), "sig")
    else:
        sigs = minhash_signatures(
            docs, text=text, id_col=id_col, shingle_k=shingle_k,
            num_hashes=num_hashes, seed=seed, basis=basis,
        )
        # the signature subplan feeds candidate generation AND two
        # pair-side re-joins — persist (lazily: the first job fills the
        # cache, later consumers in the same action reuse it) so the
        # expensive signatures compute once. Private: docs is typically
        # a parquet read, and a session-global cache entry for it would
        # be served to ANY later same-path plan — even after the files
        # changed (the r13 stale-read class; r14 converts every
        # pre-r13 plain persist of a path-derived frame).
        from pyspark import StorageLevel

        sigs = private_persist(sigs, StorageLevel.MEMORY_AND_DISK)
    # candidate generation moves only (id, band, bucket) — signatures
    # (64×8 B each) stay out of the explode/join/dedup shuffles and are
    # re-attached once per surviving pair
    bucketed = sigs.select(
        id_col,
        F.explode(lsh_bands(F.col("sig"), bands, rows_per_band)).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = bucketed.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = bucketed.select(F.col(id_col).alias("id_b"), "band", "bucket")
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = pairs.join(
        sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return pairs.select(
        "id_a",
        "id_b",
        (agree.cast("double") / F.size("sig_a")).alias("est_jaccard"),
    )


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.7, **kw) -> DataFrame:
    """Near-dup pairs with estimated Jaccard ≥ threshold. Unordered —
    the CC/curation consumers re-shuffle anyway (r14, guide §2.4; the
    jaccard_pairs_blocked note); direct gates sort at the gate."""
    return minhash_candidates(docs, **kw).filter(F.col("est_jaccard") >= threshold)


def dedup_against_corpus(
    new_docs: DataFrame, corpus: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Incremental EXACT dedup — the continuous-crawl shape: drop rows of
    a NEW batch whose text fingerprint already exists in the standing
    corpus. Only 16-byte fingerprints move (the corpus side reduces to
    distinct fps map-side; its text never shuffles); the anti-join is an
    equi-join on fp, and with a small batch AQE broadcasts the batch
    side. Compose with ``dedup_exact(new_docs)`` first to also collapse
    duplicates WITHIN the batch."""
    corpus_fps = corpus.select(fingerprint64(F.col(text)).alias("fp")).distinct()
    return (
        new_docs.withColumn("fp", fingerprint64(F.col(text)))
        .join(corpus_fps, "fp", "left_anti")
        .drop("fp")
    )


def minhash_candidates_between(
    new_docs: DataFrame,
    corpus: DataFrame | None,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    basis: str = "xxhash",
    corpus_signatures: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus MinHash+LSH candidates: (new_id, corpus_id,
    est_jaccard) for pairs sharing ≥1 band bucket — the near-dup analog
    of ``dedup_against_corpus`` for incremental ingest. Same shuffle
    discipline as the self-join variant: only (id, band, bucket) moves
    through candidate generation; signatures re-attach per surviving
    pair.

    ``corpus_signatures``: the persisted corpus signature table (from
    ``minhash_signatures``) — the thing a real pipeline writes once and
    reads back every batch; when given, ``corpus`` may be None and the
    corpus text is never touched, and nothing is cached on the session.
    When absent, both signature frames are derived here and persisted
    MEMORY_AND_DISK; in a per-batch ingest LOOP that cache accumulates
    for the life of the session — callers running this repeatedly MUST
    either pass ``corpus_signatures=`` (preferred) or clear the cache
    between batches (``spark.catalog.clearCache()``)."""
    rows_per_band = num_hashes // bands

    def bucketed_from(sigs: DataFrame, out_id: str):
        bb = sigs.select(
            out_id, F.explode(lsh_bands(F.col("sig"), bands, rows_per_band)).alias("bb")
        ).select(out_id, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        return sigs, bb

    def bucketed(df: DataFrame, out_id: str):
        sigs = minhash_signatures(
            df, text=text, id_col=id_col, shingle_k=shingle_k,
            num_hashes=num_hashes, seed=seed, basis=basis,
        ).select(F.col(id_col).alias(out_id), "sig")
        from pyspark import StorageLevel

        # private: path-derived frame (see minhash_candidates)
        sigs = private_persist(sigs, StorageLevel.MEMORY_AND_DISK)
        return bucketed_from(sigs, out_id)

    new_sigs, new_bb = bucketed(new_docs, "new_id")
    if corpus_signatures is not None:
        cor_sigs, cor_bb = bucketed_from(
            corpus_signatures.select(F.col(id_col).alias("corpus_id"), "sig"), "corpus_id"
        )
    else:
        cor_sigs, cor_bb = bucketed(corpus, "corpus_id")
    pairs = (
        new_bb.join(cor_bb, ["band", "bucket"])
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    pairs = pairs.join(
        new_sigs.select("new_id", F.col("sig").alias("sig_a")), "new_id"
    ).join(cor_sigs.select("corpus_id", F.col("sig").alias("sig_b")), "corpus_id")
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return pairs.select(
        "new_id", "corpus_id", (agree.cast("double") / F.size("sig_a")).alias("est_jaccard")
    )


def dedup_against_corpus_near(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Drop new-batch docs with an estimated-Jaccard ≥ threshold match
    anywhere in the corpus (near-dup incremental dedup)."""
    matches = (
        minhash_candidates_between(new_docs, corpus, id_col=id_col, **kw)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_docs.join(matches, id_col, "left_anti")


def simhash_near_duplicates(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    max_hamming: int = 3,
    blocks: int = 4,
    basis: str = "xxhash",
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signatures, candidates share at least
    one of `blocks` 16-bit blocks (pigeonhole: any pair within hamming r <
    blocks shares a block), verified by exact hamming distance.

    ``basis="md5"`` swaps the shingle hashes for the SQL-portable 60-bit
    md5 basis (see ``_shingle_basis``) — signature bits 60–63 are then
    always 0, shrinking the top block's entropy to 12 bits but making the
    whole pipeline reproducible in an independent SQL engine."""
    base = _shingle_basis_frame(docs, text, id_col, shingle_k, basis)
    sigs = base.select(F.col(id_col), simhash64_udf()(F.col("bh")).alias("sh"))
    # the signature subplan (shingle hashing + the Arrow UDF) feeds BOTH
    # sides of the block self-join — persist lazily so it computes once,
    # not twice (one long per doc; same discipline as minhash_candidates,
    # including the private-entry requirement for path-derived frames)
    from pyspark import StorageLevel

    sigs = private_persist(sigs, StorageLevel.MEMORY_AND_DISK)
    block_width = 64 // blocks
    mask = (1 << block_width) - 1
    blocked = sigs.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sh", i * block_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sh", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"))
    left = blocked.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "blk", "val")
    right = blocked.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "blk", "val")
    return (
        left.join(right, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        # unordered (r14, guide §2.4 — see jaccard_pairs_blocked)
        .select("id_a", "id_b", "hamming")
    )


def jaccard_pairs_blocked(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang",),
    length_band: int = 100,
    new_ids: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within deterministic blocks
    (same block_cols + n_chars//length_band). The blocking key is part of
    the operator spec — reproducible in the SQL oracle — and bounds the
    candidate pair count so the plan scales as Σ block².

    ``new_ids`` (a 1-column frame of ``id_col`` values) switches to the
    INCREMENTAL shape: only pairs touching at least one new id are
    produced — same rows a full run would emit for those pairs, but the
    left join side is pruned to the new docs BEFORE the shuffle, so the
    per-batch cost scales with |batch|·corpus-within-block instead of
    corpus². The nightly feed for :func:`merge_components`; probed in
    SCALE.md r10d."""
    # Inverted-index (explode-join-aggregate) formulation: explode each
    # doc's distinct 64-bit shingle hashes, equi-join within blocks on
    # the hash, and COUNT co-occurrences per (id_a, id_b) — |A∩B| without
    # per-pair array intersects (which measured 34 s at 5 000 docs as an
    # O(|A|+|B|)-per-pair interpreted loop). All hash joins + partial
    # aggregates; shuffle volume = Σ_shingle df(s)² within blocks, the
    # standard cost model for set-similarity joins. Docs sharing NO
    # shingle never meet (J=0 < threshold, correctly absent).
    sh = _shingle_basis_frame(
        docs,
        text,
        id_col,
        shingle_k,
        "xxhash",
        extra=(
            *[F.col(c) for c in block_cols],
            (F.floor(F.length(text) / length_band)).alias("_lb"),
        ),
    ).withColumnRenamed("bh", "sh")
    # explode_OUTER, then drop null h: a plain explode lets the optimizer
    # infer `size(sh) > 0 AND isnotnull(sh)` filters BELOW the projection
    # (InferFiltersFromGenerate), duplicating the whole shingle pipeline
    # into the filter condition — the scan was evaluating it ~3× per row
    # per join side (visible in the formatted plan). Outer explode infers
    # nothing; h is null exactly for empty shingle sets, which the
    # post-filter drops — identical rows, shingles computed once.
    flat = sh.select(
        *block_cols,
        "_lb",
        F.col(id_col).alias("id"),
        F.size("sh").alias("n"),
        F.explode_outer("sh").alias("h"),
    ).filter(F.col("h").isNotNull())
    join_keys = [*block_cols, "_lb", "h"]
    left = flat.select(*join_keys, F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    if new_ids is not None:
        # incremental: the left side carries ONLY the batch's shingles
        # (broadcast semi — new_ids is batch-sized); a new-old pair then
        # appears exactly once (old ids never sit left), a new-new pair
        # twice — the orientation filter below dedups it
        newf = F.broadcast(new_ids.select(F.col(id_col).alias("id_a")).distinct())
        left = left.join(newf, "id_a", "left_semi")
    # SHUFFLE_HASH: without the hint AQE broadcasts the exploded shingle
    # side (fine at gate scale, a non-starter at corpus scale where the
    # build side is the whole exploded corpus), and the broadcast build
    # re-evaluates the shingle pipeline for its copy — the hinted
    # shuffle join both matches the 100 TB shape and measured ~40%
    # faster at sf0.1. AQE skew handling still applies to shuffle joins.
    right = flat.select(
        *join_keys, F.col("id").alias("id_b"), F.col("n").alias("n_b")
    ).hint("shuffle_hash")
    if new_ids is None:
        orient = F.col("id_a") < F.col("id_b")
    else:
        # keep new-old rows in either orientation, new-new rows once
        newb = F.broadcast(
            new_ids.select(F.col(id_col).alias("id_b"), F.lit(True).alias("_fb"))
            .distinct()
        )
        right = right.join(newb, "id_b", "left").withColumn(
            "_fb", F.coalesce("_fb", F.lit(False))
        )
        orient = (F.col("id_a") != F.col("id_b")) & (
            ~F.col("_fb") | (F.col("id_a") < F.col("id_b"))
        )
    inter = (
        left.join(right, join_keys)
        .filter(orient)
        # size-ratio prefilter (sound): J = i/(na+nb−i) ≤ min/max, so a
        # pair with min < t·max can never reach the threshold — its
        # co-occurrence rows are dropped BEFORE the pair aggregate,
        # shrinking the hash map the classic set-similarity way
        .filter(
            F.least("n_a", "n_b").cast("double")
            >= F.lit(threshold) * F.greatest("n_a", "n_b")
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    union = (F.col("n_a") + F.col("n_b") - F.col("_i")).cast("double")
    out = inter.withColumn(
        "jaccard", F.when(union > 0, F.col("_i").cast("double") / union).otherwise(F.lit(0.0))
    ).filter(F.col("jaccard") >= threshold)
    if new_ids is not None:
        # new-old rows may carry the new id on either seat — canonicalize
        # so the incremental pair set is orientation-identical to the
        # full run's rows for those pairs
        out = out.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "jaccard",
        )
    # No trailing orderBy (r14, guide §2.4: a global sort used only for
    # presentation): the graph consumers (CC loops, merge_components,
    # graph_profile, triangle_stats, write_edges) either persist or
    # re-shuffle this frame, and a sort below a projection/persist is
    # NOT eliminated by EliminateSorts — graph_profile's plan carried
    # two rangepartitioning exchanges purely to materialize an order
    # nobody consumed. Gates that RETURN pairs directly sort at the
    # gate (same visible order as before; the row set is unchanged).
    return out.select("id_a", "id_b", "jaccard")


def fuzzy_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column | None = None,
    max_distance: int = 2,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Blocked edit-distance entity matching — the approximate STRING
    join the near-dup family lacked (shingle/minhash lanes need enough
    text to shingle; names, titles, and short identifiers mismatch by
    a typo or one digit). Returns ``(id_a, id_b, name_a, name_b,
    distance)`` with ``id_a < id_b`` and Levenshtein distance ≤
    ``max_distance`` (0 = exact duplicate name).

    ``block`` is the blocking expression (default: the first whitespace
    token, lowercased — the classic first-word block). The block key is
    part of the operator spec, reproducible in a SQL oracle, and bounds
    the candidate pairs at Σ block² exactly like
    ``jaccard_pairs_blocked``; records in different blocks never meet,
    which is the documented recall trade every blocking scheme makes
    (a typo INSIDE the block key escapes the match — pick the key so
    expected errors fall outside it, e.g. prefix-block serial names to
    scope typos to the suffix).

    Plan shape: one self equi-join on the block key (hash join — never
    a theta join), the Levenshtein evaluated only on within-block pairs
    with Spark's threshold-bounded kernel (``levenshtein(l, r, t)``
    runs the banded O(t·min(m,n)) DP and returns -1 past the bound,
    not the full O(m·n) table).

    ``max_block`` is the hot-block fence: a block holding more than
    ``max_block`` records contributes NO pairs (dropped whole — the
    same ``max_df`` discipline as ``winnow_matches``; truncating a
    block instead would make results row-order-dependent). Natural-name
    corpora skew hard on first-token blocks ("maria", "the"), and one
    10⁵-row block alone is 10¹⁰ candidate pairs — without the fence a
    single hot key owns the job. The per-block count costs one window
    over the SAME key the self-join shuffles on, so the fence adds no
    extra exchange pattern at scale. Blocks a fence drops are exactly
    ``fuzzy_blocks_oversize(...)`` — run it to see what was excluded,
    then either raise ``max_block`` deliberately or pass a finer
    ``block`` expression (e.g. first token + next initial) to split the
    hot keys. ``max_block=None`` disables the fence (calibration use
    only)."""
    from pyspark.sql import Window

    if block is None:
        block = F.lower(F.element_at(F.split(F.col(name_col), r"\s+"), 1))
    side = df.select(
        F.col(id_col), F.col(name_col), block.alias("_blk")
    )
    if max_block is not None:
        wblk = Window.partitionBy("_blk")
        side = (
            side.withColumn("_bn", F.count(F.lit(1)).over(wblk))
            .filter(F.col("_bn") <= int(max_block))
            .drop("_bn")
        )
    # the fenced side frame feeds both halves of the self-join —
    # persist so the block census window runs once, not twice (r13, §5;
    # private: the entry must not be matchable by other queries)
    side = private_persist(side)
    a = side.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a"), "_blk"
    )
    b = side.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b"), "_blk"
    )
    d = F.levenshtein(F.col("name_a"), F.col("name_b"), int(max_distance))
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", d)
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def resolve_entities(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block: Column | str,
    max_distance: int = 1,
    max_block: int | None = 10_000,
    components: DataFrame | None = None,
) -> DataFrame:
    """End-to-end entity resolution — the master-data flow every
    dedup-by-name deployment runs: blocked edit-distance pair
    generation (:func:`fuzzy_matches`, hot-block fence included) →
    connected components over the match graph (star algorithm — name
    chains A~B~C resolve transitively even when A~C exceeds the
    distance bound) → one canonical id per cluster (min member id,
    singletons canonicalize to themselves). Returns the FULL id spine:
    ``(id, name, canonical_id, cluster_size)``.

    Scale shape: pairs are block-bounded, CC shuffles only the
    duplicate-edge graph (16 B/row), the spine attach is one id-keyed
    left join, and cluster_size is a window over the same canonical key
    the join already distributed. Steady state: persist the CC labels
    once per release and pass them back via ``components=`` (an
    ``(id, component)`` frame) — the spine resolves from the artifact
    with no pair generation or CC build at all (the components-artifact
    cadence; gate ``rel_entity_resolution_indexed``)."""
    from pyspark.sql import Window

    if components is not None:
        comp = components
    else:
        pairs = fuzzy_matches(
            records,
            id_col=id_col,
            name_col=name_col,
            block=block,
            max_distance=max_distance,
            max_block=max_block,
        )
        comp = connected_components_star(pairs.select("id_a", "id_b"))
    joined = records.select(F.col(id_col), F.col(name_col)).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    out = joined.select(
        F.col(id_col),
        F.col(name_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
    )
    w = Window.partitionBy("canonical_id")
    return out.withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))


def fuzzy_blocks_oversize(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column | None = None,
    max_block: int = 10_000,
) -> DataFrame:
    """The drop report for ``fuzzy_matches``'s hot-block fence: the
    blocks (``block_key, n_records``) that exceed ``max_block`` and
    therefore contribute no pairs, largest first. Run with the SAME
    ``block``/``max_block`` arguments as the match call — together they
    partition the corpus exactly (every record is either matchable or
    in a reported block), so a silent-truncation audit is one query.
    One groupBy on the block key; output is at most one row per hot key."""
    if block is None:
        block = F.lower(F.element_at(F.split(F.col(name_col), r"\s+"), 1))
    return (
        df.select(block.alias("block_key"))
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > int(max_block))
        .orderBy(F.col("n_records").desc(), "block_key")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS algorithm): from each sliding window of ``w`` consecutive
    k-gram hashes keep the window minimum, then the distinct selected
    hashes form the document's fingerprint set. Guarantees every shared
    substring of length ≥ k+w−1 yields at least one shared fingerprint,
    at ~2/(w+1) the density of the full hash set — the classic
    local-sampling dedup basis between "hash everything" (ExactSubstr)
    and "one signature per doc" (MinHash). Returns ``(id, fp)`` rows.

    Array-local per doc (two-lane md5 positional fold, O(n·w) BIGINT
    mins, zero shuffle) on the SQL-portable basis, so the selection is
    engine-reproducible. The fold-explode stage is the shared
    ``_window_hash_positions`` pipeline (layered projections +
    posexplode_outer; see its docstring for the two CollapseProject /
    InferFiltersFromGenerate pitfalls it guards, each ~10× here).
    The window-min selection then runs over the EXPLODED positions with
    a sliding frame, NOT as transform(sequence, i ->
    array_min(slice(wh, i, w))): the nested higher-order form
    re-evaluates the whole k-gram fold per position — measured 310 s
    for 5 000 docs vs ~2 s for this shape. One doc-keyed window
    exchange; identical selected set."""
    from pyspark.sql import Window

    pos = _window_hash_positions(docs, k, text, id_col).select(
        F.col(id_col), F.col("pos").alias("_p"), F.col("h").alias("_h")
    )
    wnd = Window.partitionBy(id_col).orderBy("_p").rowsBetween(0, w - 1)
    full = Window.partitionBy(id_col)
    sel = pos.select(
        F.col(id_col),
        F.col("_p"),
        F.min("_h").over(wnd).alias("fp"),
        F.count(F.lit(1)).over(full).alias("_n"),
    ).filter(F.col("_p") <= F.col("_n") - w)
    return sel.select(id_col, "fp").distinct()


def winnow_matches(
    docs: DataFrame | None,
    min_shared: int = 2,
    k: int = 5,
    w: int = 4,
    text: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    MOSS-style similarity candidates with the substring-match guarantee.
    Inverted-index equi-join on the fingerprint (ids + 8-byte hashes
    shuffle, text never moves), count shared per pair map-side — the
    same Σ df(fp)² cost model as the blocked Jaccard join.

    ``max_df`` drops fingerprints present in more than that many docs
    BEFORE the join — exactly what MOSS does with boilerplate (a
    fingerprint shared by thousands of documents identifies nothing and
    costs df² join rows; a repetitive corpus measured 600 s without the
    cap, 2 s with it). The substring guarantee then applies to material
    shared by ≤ max_df documents — the matches one actually wants.

    ``fingerprints``: a precomputed ``(id, fp)`` frame (from
    ``winnow_fingerprints``, typically read back from a persisted
    table). When given, ``docs`` may be None and NO caching happens
    here — the caller owns fingerprint storage, the production shape
    (same contract as the MinHash ``signatures=`` path). When absent,
    the fingerprint build materializes on first action (~8–10 s at
    sf0.1 before the ~1 s steady state — the cold-start cost noted in
    SCALE.md; one-shot callers should budget for it or persist the
    fingerprint table themselves)."""
    if fingerprints is not None:
        # k/w/text describe how fingerprints are BUILT; they are unused
        # on this path — the caller's winnow_fingerprints call fixed them.
        fp = fingerprints.select(F.col(id_col), "fp")
    elif docs is None:
        raise ValueError("winnow_matches requires either docs or fingerprints")
    else:
        fp = winnow_fingerprints(docs, k=k, w=w, text=text, id_col=id_col)
        # the fingerprint subplan (md5 fold + window-min) feeds the df
        # cap and BOTH join sides — persist lazily so it computes once
        # (same discipline as the MinHash/SimHash signature subplans,
        # private because docs is typically a parquet read)
        from pyspark import StorageLevel

        fp = private_persist(fp, StorageLevel.MEMORY_AND_DISK)
    if max_df is not None:
        common = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("fp")
        )
        fp = fp.join(common, "fp", "left_anti")
    a = fp.select(F.col(id_col).alias("id_a"), "fp")
    b = fp.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Checkpoint a per-round frame so the logical plan does not embed
    every previous round (analysis cost doubles per round otherwise).
    Reliable checkpoint when the session has a checkpoint dir
    (production: survives executor loss); localCheckpoint otherwise."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def private_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist for an operator-INTERNAL diamond (one frame feeding
    several consumers of the SAME query) without exposing the entry to
    any other query. Spark's cache matches canonicalized plans, and
    file relations canonicalize by PATH — so a plain persist of (say)
    an artifact read or an inline build is silently served to every
    later same-shaped plan in the session, even after the files under
    the path changed (an in-place artifact swap, an appended run): the
    later query gets the stale rows with no error. A per-call unique
    no-op predicate (`lit(token) == lit(token)`) keeps the entry
    matchable only by the consumers holding THIS frame; the optimizer
    constant-folds the predicate away, so the executed plan and every
    plan pin are unchanged. The entry still lives until the session's
    next clearCache — callers that need the memory back sooner can
    unpersist the returned frame after their action."""
    from uuid import uuid4

    tok = F.lit(uuid4().hex)
    out = df.filter(tok == tok)
    return out.persist(level) if level is not None else out.persist()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-duplicate *pairs* into duplicate *groups*:
    ``(id, component)`` where component is the minimum id reachable in the
    undirected pair graph — the step every dedup pipeline needs between
    "these two match" and "keep one per cluster".

    Min-label propagation WITH pointer doubling: each round every
    vertex takes the min of its own label and its neighbors' labels
    (one edge-sized equi-join + one partial-agg shuffle per round),
    then shortcuts label ← label(label) (a labels-sized self-join —
    sound because a label is always the id of a vertex in the same
    component and labels only decrease, so the composed value never
    undershoots the component min). Doubling collapses the chain that
    plain propagation walks one hop per round: measured at sf0.1 the
    0.05-threshold jaccard graph took 14 propagation-only rounds and
    takes 8 with doubling — and the round count grows with log(chain
    length) instead of chain length, which is what matters when a
    100 TB near-dup graph turns out chainy rather than clique-like.
    ``connected_components_star`` (same contract, ~log² n rounds via
    large/small-star) measured FASTER on both probe regimes (sf0.1
    chainy: 4.3 s vs 5.7 s warm; ×10 dense: CC stage ~21 s vs ~34 s) —
    the corpus near-dup gates and artifact builders default to it; this
    propagation loop remains the cheaper-per-round choice when the
    graph is KNOWN clique-like and small-diameter. Every round's
    labels are CHECKPOINTED, not merely persisted: persist caches the data
    but leaves the logical plan growing (round N's plan embeds rounds
    1..N-1 — analysis cost doubles per round and OOMs the driver by ~10
    rounds). Reliable checkpoint when the session has a checkpoint dir
    (production: survives executor loss); localCheckpoint otherwise.
    """
    _truncate = _truncate_lineage

    # materialize the edge list ONCE: pair generation is often the most
    # expensive plan in the pipeline (O(n²) cosine, minhash banding) and
    # each round joins against edges — without truncation every round
    # re-executes that upstream plan from scratch
    edges = _truncate(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
    )

    labels = _truncate(
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("_cand"))
        )
        prop = labels.join(nbr, "id", "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least("label", "_cand").alias("label"),
        )
        # pointer doubling: label ← label(label). Label values are
        # vertex ids, so the mapping self-join resolves every one; the
        # left join + coalesce is belt-and-braces. Combined fixpoint
        # (neither hop nor shortcut changed anything) implies the
        # propagation fixpoint, i.e. label = component min.
        lmap = prop.select(F.col("id").alias("_lid"), F.col("label").alias("_llab"))
        # the convergence sum is OBSERVED during the round's checkpoint
        # job (Dataset.observe — accumulator-collected), not a second
        # per-round action: each round is ONE job instead of two (r14,
        # guide §2.5/§2.6 — job barriers are the iterative lanes' tail)
        obs = Observation()
        upd = _truncate(
            prop.join(lmap, prop["label"] == lmap["_lid"], "left")
            .select(
                "id",
                F.coalesce("_llab", "label").alias("label"),
                (F.coalesce("_llab", "label") < F.col("_old")).cast("int").alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("c"))
        )
        changed = obs.get["c"] or 0
        labels = upd.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round guard for ADVERSARIAL graphs. Same contract as
    ``connected_components``: ``(id, component)``, component = min
    reachable id. Min-label propagation needs diameter rounds (a
    10³-node path = 10³ rounds); this converges on the same path in
    ~log² n rounds, so it is the correct default when the pair graph is
    not known to be clique-like (at true 100 TB assume it isn't).

    Per round, on canonically-oriented edges (u > v):

    - large-star: every center connects its LARGER neighbors to the min
      of its closed neighborhood (keeps connectivity, shrinks tall
      chains exponentially);
    - small-star: every center folds itself and its smaller neighbors
      onto its min neighbor (forms the stars).

    Both are one groupBy-min + one equi-join — no global sort. The fixed
    point is a forest of stars rooted at component minima, detected with
    a count+hash fingerprint (two scalars per round; same action budget
    as the propagation loop's convergence count). Rounds checkpoint via
    the shared lineage truncation."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )
    edges = _truncate_lineage(edges)
    prev_fp = None
    for _ in range(max_iter):
        # large-star: undirected view, m(center) = min(closed nbhd)
        both = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            both.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m"))
        )
        large = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: edges are (u > v); fold u and its smaller
        # neighbors onto min(Γ(u))
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
        )
        # order-independent, overflow-free fingerprint (ANSI sum() on
        # xxhash64 values overflows long), OBSERVED during the round's
        # checkpoint materialization instead of a second per-round
        # action — each round is ONE job instead of two (r14, guide
        # §2.5/§2.6: the per-round job barrier was the 32-core wall on
        # doc_dedup_shards; the fingerprint rides the checkpoint's
        # accumulators for free)
        obs = Observation()
        edges = _truncate_lineage(
            small.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("x"),
            )
        )
        m = obs.get
        fp = (m["n"], m["x"])
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged: every non-root points straight at its component min
    roots = edges.select(F.col("v").alias("id")).distinct().join(
        edges.select(F.col("u").alias("id")).distinct(), "id", "left_anti"
    )
    return edges.select(F.col("u").alias("id"), F.col("v").alias("component")).unionByName(
        roots.select("id", F.col("id").alias("component"))
    )


def dedup_near(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one doc (the min-id component representative) per near-dup
    group; docs in no pair survive untouched. Only the non-canonical
    member ids — a frame far smaller than the corpus — drive the anti-join."""
    comp = connected_components_star(pairs, id_a=id_a, id_b=id_b)
    losers = comp.filter(F.col("id") != F.col("component")).select(F.col("id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


def _window_hash_positions(
    docs: "DataFrame", window: int, text: str, id_col: str
) -> "DataFrame":
    """``(id, pos, h)`` rows: the positional two-lane md5 window fold,
    layered projections (per-token pipeline evaluated exactly once —
    the ``hashing.window_fold`` contract), posexplode_OUTER + pos filter
    (a plain posexplode lets InferFiltersFromGenerate clone the fold
    into an inferred filter below the projection — measured ~12× on
    this stage). Shared by ExactSubstr spans, CDC chunking and the
    chunk-text materializer."""
    from epicsarchiver_spark.functions.hashing import (
        lane_hi,
        lane_lo,
        md5_hash60,
        window_fold,
    )

    th = docs.select(
        F.col(id_col), F.transform(tokens(F.col(text)), md5_hash60).alias("th")
    )
    lanes = th.select(
        F.col(id_col),
        lane_lo(F.col("th")).alias("lo"),
        lane_hi(F.col("th")).alias("hi"),
    )
    return lanes.select(
        F.col(id_col),
        F.posexplode_outer(window_fold(F.col("lo"), F.col("hi"), window)).alias(
            "pos", "h"
        ),
    ).filter(F.col("pos").isNotNull())


def duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated token-window positions — the discovery half
    of exact-substring dedup (the ExactSubstr procedure of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    re-expressed relationally instead of via a monolithic suffix array):
    a length-``window`` token span is duplicated when its rolling hash
    occurs ``min_count``+ times across the corpus (within- and cross-doc
    occurrences both count, as in the paper).

    Returns ``(id, pos, h)`` rows for DUPLICATED window starts only
    (``pos`` 0-based token index).

    Scale shape: the positional two-lane window fold is array-local
    (O(n·k) BIGINT ops per doc, no shingle strings); the explode emits
    (id, pos, h) — ~24 B per corpus token, the relational analog of the
    ~8 B/token suffix array — aggregated on ``h`` with map-side partials;
    the semi-join back is hash-keyed and ids-only. Document text never
    shuffles here. Layered projections keep the per-token md5 pipeline
    evaluated exactly once (see ``hashing.window_fold``).
    """
    pos = _window_hash_positions(docs, window, text, id_col)
    # occurrence count as a WINDOW over h, not groupBy(h) + semi-join
    # back: the join formulation evaluates the whole fold+explode subplan
    # twice (once per join side — Catalyst has no subtree reuse across
    # the agg/probe branches, and the exchanges diverge under column
    # pruning so ReuseExchange never fires; measured 1.5 s vs 0.8 s at
    # sf0.1). The window ships the triples through ONE exchange on h.
    # Skew: a boilerplate span with huge df puts all copies in one
    # window group — WindowExec buffers per-group with disk spill
    # (ExternalAppendOnlyUnsafeRowArray), so mega-skew degrades to
    # spill, not OOM; the equally-skewed join probe shuffle had the
    # same per-key placement without even the spillable buffer.
    from pyspark.sql import Window

    wnd = Window.partitionBy("h")
    return (
        pos.withColumn("_n", F.count(F.lit(1)).over(wnd))
        .filter(F.col("_n") >= min_count)
        .drop("_n")
    )


def dedup_substrings(
    docs: DataFrame,
    window: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring span dedup (ExactSubstr, Lee et al. 2022): remove
    every token covered by a duplicated length-``window`` span anywhere
    in the corpus, keeping the rest of each document intact. Unlike
    document-level dedup this excises boilerplate *inside* otherwise
    unique documents (licence blocks, navigation chrome, quoted reposts).

    Returns ``(id, n_tokens, n_dup_windows, n_dup_tokens, text_clean)``
    — text_clean is the source tokens minus covered positions, space-
    joined (tokenization is whitespace-normalizing by design).

    Scale shape: `duplicated_spans` shuffles only (id, pos, hash)
    triples; the per-doc duplicated-start lists (skewed tiny — most docs
    have none) come back via one doc_id-keyed join that AQE broadcasts
    when small; the span-coverage test is an array-local exists() over
    the start list, O(n·d) per doc. Nothing quadratic in the corpus.
    """
    flagged = duplicated_spans(docs, window, text, id_col, min_count)
    return _excise_spans(docs, flagged, window, text, id_col)


def _excise_spans(
    docs: DataFrame, flagged: DataFrame, window: int, text: str, id_col: str
) -> DataFrame:
    """Remove every token covered by a flagged (id, pos) window start —
    the shared excision tail of ExactSubstr dedup and benchmark span
    decontamination. Layered projections: toks / starts / kept are each
    referenced more than once downstream — materialize them as
    attributes (the join is the collapse barrier) so the split and the
    nested exists() evaluate once per doc, not per reference."""
    span_pos = flagged.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )
    base = docs.join(span_pos, id_col, "left").select(
        F.col(id_col),
        tokens(F.col(text)).alias("toks"),
        F.coalesce(F.col("starts"), F.array().cast("array<integer>")).alias("st"),
    )
    kept = base.select(
        F.col(id_col),
        F.col("toks"),
        F.col("st"),
        F.filter(
            F.col("toks"),
            lambda x, j: ~F.exists(
                F.col("st"), lambda s: (s <= j) & (j < s + F.lit(window))
            ),
        ).alias("kept"),
    )
    return kept.select(
        F.col(id_col),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size("st").cast("long").alias("n_dup_windows"),
        (F.size("toks") - F.size("kept")).cast("long").alias("n_dup_tokens"),
        F.array_join("kept", " ").alias("text_clean"),
    )


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    window: int = 13,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SPAN-level benchmark decontamination (the GPT-3/PaLM procedure:
    excise any length-``window`` token span that collides with the
    evaluation benchmark, rather than dropping whole documents): every
    token covered by a window whose rolling hash appears anywhere in
    ``benchmark`` is removed; the rest of the document survives. The
    surgical counterpart of ``text_ops`` document-level contamination
    REPORTING — training data keeps its clean remainder.

    Scale shape: the benchmark side reduces to its DISTINCT window-hash
    set (tiny — benchmarks are MBs against a TB corpus; Catalyst
    broadcasts the semi-join), corpus text never shuffles, and the
    excision is the shared array-local ``_excise_spans`` tail. Returns
    ``(id, n_tokens, n_dup_windows, n_dup_tokens, text_clean)`` with
    the same column contract as ``dedup_substrings``."""
    bench_h = (
        _window_hash_positions(benchmark, window, text, id_col).select("h").distinct()
    )
    hits = _window_hash_positions(docs, window, text, id_col).join(
        bench_h, "h", "left_semi"
    )
    return _excise_spans(docs, hits, window, text, id_col)


def cdc_chunk_signatures(
    docs: DataFrame,
    window: int = 4,
    boundary_bits: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (CDC): cut each document into
    variable-size chunks at positions where the ``window``-token rolling
    hash ≡ 0 (mod 2^``boundary_bits``) — the Rabin-style gear/content
    boundary rule used by dedup stores and incremental-crawl pipelines.
    Expected chunk length is 2^boundary_bits windows, and an edit only
    redraws boundaries within one window of the change, so chunk
    identities are STABLE under insertions — the property fixed-width
    chunking (``chunk_documents``) lacks and the reason CDC chunk dedup
    survives page re-crawls with small diffs.

    Returns ``(id, chunk_idx, n_windows, sig_sum, sig_min, sig_max)``
    — an order-insensitive signature per chunk (window-hash sum mod
    2³¹−1, min, max, count) for corpus-level chunk dedup. Text never
    leaves the document row; only (id, pos, hash) triples shuffle, once,
    keyed by doc (the running boundary count), and the per-chunk
    aggregate reuses that partitioning (group keys ⊇ partition key ⇒ no
    second exchange). The two-lane md5 fold makes every value
    bit-reproducible in an independent SQL engine (same basis as
    ``duplicated_spans``/``winnow_fingerprints``)."""
    from pyspark.sql import Window

    from epicsarchiver_spark.functions.hashing import MERSENNE31

    pos = _window_hash_positions(docs, window, text, id_col)
    flag = F.when(F.pmod(F.col("h"), F.lit(1 << boundary_bits)) == 0, 1).otherwise(0)
    wnd = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = pos.select(
        F.col(id_col),
        F.col("h"),
        F.sum(flag).over(wnd).alias("chunk_idx"),
    )
    return chunked.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.pmod(F.sum(F.pmod(F.col("h"), F.lit(MERSENNE31))), F.lit(MERSENNE31)).alias(
            "sig_sum"
        ),
        F.min("h").alias("sig_min"),
        F.max("h").alias("sig_max"),
    )


def cdc_duplicate_chunks(
    docs: DataFrame,
    window: int = 4,
    boundary_bits: int = 5,
    min_count: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level CDC chunk dedup: chunk signatures occurring
    ``min_count``+ times across the corpus — shared boilerplate found at
    CHUNK granularity, robust to edits elsewhere in the page (compare
    ``duplicated_spans``: fixed window granularity; ``segment_dedup``:
    within-doc only). Returns one row per duplicated signature with its
    occurrence count; signature shuffle volume is #chunks ≈ #windows /
    2^boundary_bits rows, far below the span table."""
    sigs = cdc_chunk_signatures(
        docs, window=window, boundary_bits=boundary_bits, text=text, id_col=id_col
    )
    return (
        sigs.groupBy("n_windows", "sig_sum", "sig_min", "sig_max")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .filter(F.col("n_chunks") >= min_count)
    )


def cdc_chunk_texts(
    docs: DataFrame,
    window: int = 4,
    boundary_bits: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CDC chunks THEMSELVES — ``(id, chunk_idx, chunk_text,
    n_tokens)`` with chunk_idx numbered exactly as in
    ``cdc_chunk_signatures`` (token j belongs to chunk = count of
    boundary windows at positions ≤ j; tokens past the last window stay
    in the final chunk). This is the materialization step a training
    pipeline runs AFTER chunk-level dedup decided what to keep —
    variable-size, edit-stable training units, the CDC counterpart of
    fixed-width ``text_ops.chunk_documents``.

    Shape: token rows left-join the boundary rows on (id, position) —
    a join, not an array lambda, because slicing the token array per
    chunk inside a higher-order lambda re-evaluates the tokenizer per
    reference (the CollapseProject pitfall measured at 30+ s; a join is
    a collapse barrier). One running-count window + one grouped
    reassembly, both keyed by doc — the second reuses the first's
    partitioning."""
    from pyspark.sql import Window

    bounds = (
        _window_hash_positions(docs, window, text, id_col)
        .filter(F.pmod(F.col("h"), F.lit(1 << boundary_bits)) == 0)
        .select(id_col, "pos", F.lit(1).alias("_cut"))
    )
    toks = docs.select(
        F.col(id_col), F.posexplode_outer(tokens(F.col(text))).alias("pos", "tok")
    ).filter(F.col("pos").isNotNull())
    wnd = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = toks.join(bounds, [id_col, "pos"], "left").select(
        F.col(id_col),
        "pos",
        "tok",
        F.sum(F.coalesce(F.col("_cut"), F.lit(0))).over(wnd).alias("chunk_idx"),
    )
    return marked.groupBy(id_col, "chunk_idx").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("chunk_text"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


_CDC_KEY = ("n_windows", "sig_sum", "sig_min", "sig_max")


def cdc_dedup_report(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    corpus_chunks: DataFrame | None = None,
    window: int = 4,
    boundary_bits: int = 5,
    drop_frac: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental CDC dedup report — the chunk-level analog of
    ``dedup_against_corpus``: for each batch document, how many of its
    CDC chunks already exist anywhere in the standing corpus, and
    whether the share reaches ``drop_frac`` (a re-crawled page with a
    small edit shares all but ~one chunk, so it is caught here even
    though its exact fingerprint is new — the gap exact dedup leaves).
    Returns ``(id, n_chunks, n_matched, dropped)``.

    ``corpus_chunks``: a precomputed chunk-signature table (from
    ``cdc_chunk_signatures``, persisted once per corpus) — the
    production shape; ``corpus`` docs are only chunked here when it is
    absent. Join moves signature 4-tuples, never text; the corpus side
    reduces to its DISTINCT signature set first."""
    bsig = cdc_chunk_signatures(
        batch, window=window, boundary_bits=boundary_bits, text=text, id_col=id_col
    )
    if corpus_chunks is None:
        if corpus is None:
            raise ValueError("cdc_dedup_report requires corpus or corpus_chunks")
        corpus_chunks = cdc_chunk_signatures(
            corpus, window=window, boundary_bits=boundary_bits, text=text, id_col=id_col
        )
    key = list(_CDC_KEY)
    # one left join with a hit marker + ONE id-keyed aggregate (the
    # oracle's own shape): the former semi-join + two groupBys + rejoin
    # shuffled the batch signatures on doc_id three times for the same
    # two counts
    cset = corpus_chunks.select(*key).distinct().withColumn("_hit", F.lit(1))
    return (
        bsig.join(cset, key, "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count("_hit").alias("n_matched"),
        )
        .withColumn(
            "dropped", F.col("n_matched") >= F.lit(drop_frac) * F.col("n_chunks")
        )
    )


def cdc_dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    corpus_chunks: DataFrame | None = None,
    window: int = 4,
    boundary_bits: int = 5,
    drop_frac: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch rows surviving incremental CDC dedup (see
    ``cdc_dedup_report``); documents too short to produce a chunk are
    novel by definition and survive."""
    rep = cdc_dedup_report(
        batch,
        corpus=corpus,
        corpus_chunks=corpus_chunks,
        window=window,
        boundary_bits=boundary_bits,
        drop_frac=drop_frac,
        text=text,
        id_col=id_col,
    )
    dropped = rep.filter(F.col("dropped")).select(id_col)
    return batch.join(dropped, id_col, "left_anti")


class FingerprintBloom:
    """A corpus-fingerprint Bloom filter — the classic streaming-ingest
    artifact for incremental exact dedup: membership "no" is definitive
    (no false negatives), so the standing corpus only has to be consulted
    for the tiny maybe-duplicate slice of each new batch.

    ``bits`` is a numpy uint64 bitmap (m/64 words); k double-hashed
    probes g_i = h1 + i·h2 (mod m) over the two 64-bit fingerprint hashes
    computed JVM-side. The object is a few MB for ~10⁶ docs at 1% fpp and
    ships to executors in the UDF closure; for blooms past ~100 MB pass
    it through ``SparkContext.broadcast`` and hand ``bloom.value`` to the
    filter instead. Beyond the single-bitmap tier (~10⁹ docs), shard by
    fp prefix and use the plain fp anti-join — the bloom is an
    accelerator, not the source of truth."""

    def __init__(self, bits, m_bits: int, k: int, n_items: int):
        self.bits = bits
        self.m_bits = m_bits
        self.k = k
        self.n_items = n_items

    def contains_udf(self):
        """pandas_udf (h1 long, h2 long) → boolean: all k probe bits set."""
        import numpy as np
        from pyspark.sql.types import BooleanType

        bits, m, k = self.bits, np.uint64(self.m_bits), self.k

        @F.pandas_udf(BooleanType())
        def fn(h1: pd.Series, h2: pd.Series) -> pd.Series:
            a = h1.to_numpy(dtype=np.int64).view(np.uint64)
            b = h2.to_numpy(dtype=np.int64).view(np.uint64)
            hit = np.ones(len(a), dtype=bool)
            for i in range(k):
                idx = (a + np.uint64(i) * b) % m
                word = bits[(idx >> np.uint64(6)).astype(np.int64)]
                hit &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
            return pd.Series(hit)

        return fn


def _bloom_hashes(text_col):
    """The two JVM-side 64-bit hashes of the canonical text fingerprint
    that every bloom probe derives from."""
    fp = fingerprint64(text_col)
    return F.xxhash64(fp), F.xxhash64(fp, F.lit(1))


def build_fingerprint_bloom(
    corpus: DataFrame,
    text: str = "text",
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> FingerprintBloom:
    """Build the corpus fingerprint bloom ONCE per corpus (like writing
    the MinHash signature table): a deliberate build job, reused across
    every subsequent batch. Fully distributed — each input partition
    emits its local bitmap as (seg, word) rows via an Arrow-batched
    mapInPandas, Spark OR-reduces them with ``bit_or`` (map-side
    partials), and only m/64 words are collected. Corpus text never
    leaves its partition; only hashed fingerprints are read.

    ``expected_items=None`` counts the corpus first (one extra job —
    pass the known corpus size to skip it)."""
    import math

    import numpy as np
    import pandas as pd

    if expected_items is None:
        expected_items = corpus.count()
    n = max(1, expected_items)
    ln2 = math.log(2.0)
    m_bits = max(64, int(math.ceil(-n * math.log(fpp) / (ln2 * ln2))))
    m_bits = ((m_bits + 63) // 64) * 64
    k = min(16, max(1, round(m_bits / n * ln2)))

    h1, h2 = _bloom_hashes(F.col(text))
    rows = corpus.select(h1.alias("h1"), h2.alias("h2"))

    def mk(batches):
        bits = np.zeros(m_bits // 64, dtype=np.uint64)
        m = np.uint64(m_bits)
        for pdf in batches:
            a = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            b = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(k):
                idx = (a + np.uint64(i) * b) % m
                np.bitwise_or.at(
                    bits,
                    (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )
        nz = np.nonzero(bits)[0]  # sparse partitions ship only set words
        yield pd.DataFrame({"seg": nz, "word": bits[nz].view(np.int64)})

    words = (
        rows.mapInPandas(mk, "seg long, word long")
        .groupBy("seg")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    )
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        bits[r.seg] = np.uint64(r.word % (1 << 64))  # signed long → uint64 word
    return FingerprintBloom(bits, m_bits, k, n)


def dedup_against_corpus_bloom(
    new_docs: DataFrame,
    corpus: DataFrame | None,
    bloom: FingerprintBloom,
    text: str = "text",
    id_col: str = "doc_id",
    corpus_fps: DataFrame | None = None,
) -> DataFrame:
    """Bloom-accelerated incremental exact dedup — same RESULT as
    ``dedup_against_corpus`` (the bloom has no false negatives, so rows
    it clears are definitively new and only possible duplicates reach the
    fp anti-join), but the join side of each batch shrinks from |batch|
    to |batch ∩ maybe| ≈ dup rate + fpp. The standing corpus is consulted
    only for that slice; pass ``corpus_fps=`` (the persisted distinct-fp
    table, ideally bucketed by fp) to skip touching corpus text entirely.

    Returns the surviving rows of ``new_docs`` with original columns."""
    h1, h2 = _bloom_hashes(F.col(text))
    tagged = new_docs.withColumn("_maybe", bloom.contains_udf()(h1, h2))
    fresh = tagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = tagged.filter(F.col("_maybe")).drop("_maybe")
    if corpus_fps is None:
        corpus_fps = corpus.select(fingerprint64(F.col(text)).alias("fp")).distinct()
    else:
        corpus_fps = corpus_fps.select("fp")
    confirmed = (
        maybe.withColumn("fp", fingerprint64(F.col(text)))
        .join(corpus_fps, "fp", "left_anti")
        .drop("fp")
    )
    return fresh.unionByName(confirmed)


def graph_profile(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Dup-graph shape dashboard — the degree and component-size
    distributions of a near-dup pair graph, long-form ``(metric, k,
    n)`` with metric ∈ {degree, component}: how many nodes have k
    neighbors, how many duplicate clusters have k members. This is the
    number that DECIDES the component-resolution lane (SCALE.md r7b:
    large/small-star wins on chainy graphs, plain propagation's cheaper
    rounds win on clique-like small-diameter ones — this op measures
    which one you have before you pay for the wrong loop), and the
    release-over-release monitor for "the crawl is collapsing into
    bigger and bigger dup clusters".

    Scale shape: degrees are one distinct + one node-keyed aggregate
    over the EDGE list (never the corpus); component sizes reuse the
    certified star-CC labels — pass the persisted ``components``
    artifact (``curation.write_components`` read-back) to skip the CC
    iteration entirely at release time — and reduce to a
    cluster-count-sized frame; both histograms are k-sized. Output is
    tiny at any corpus size."""
    if components is None:
        # the pair frame feeds both the degree lane and the CC build —
        # persist so an inline pair generation (the Σ block² jaccard
        # join in the gate) runs once, not twice (r13, guide §5;
        # private: the entry must not be matchable by other queries)
        pairs = private_persist(pairs)
    both = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
    deg = both.distinct().groupBy("a").agg(F.count(F.lit(1)).alias("k"))
    dh = deg.groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("degree").alias("metric"), F.col("k").cast("long").alias("k"), "n"
    )
    comp = (
        components
        if components is not None
        else connected_components_star(pairs, id_a, id_b)
    )
    cs = comp.groupBy("component").agg(F.count(F.lit(1)).alias("k"))
    ch = cs.groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("component").alias("metric"), F.col("k").cast("long").alias("k"), "n"
    )
    return dh.unionByName(ch)


def triangle_stats(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected pair graph — the quantitative form of graph_profile's
    "chainy vs clique-like" question (the measurement that picks the CC
    lane and flags template-spam dup clusters, whose coefficients sit
    near 1.0 while organic near-dup chains sit near 0). Returns
    ``(id, degree, n_triangles, clustering)`` for every node in the
    edge set; clustering = 2T/(d(d−1)), 0 when d < 2.

    The oriented 3-way self-join: edges canonicalize to u < v, a
    triangle x<y<z is found exactly once as (x,y)⋈(y,z)⋈(x,z) — no
    per-triangle dedup, no direction double-count. Scale shape: the
    join runs on the DUP-GRAPH edges (16 B/row — never documents), BUT
    the wedge volume is Σ_v deg(v)² — one 10⁵-degree super-node means
    10¹⁰ wedge rows (measured: the ×10 probe corpus filled 75 GB of
    shuffle before the fence existed, SCALE.md r9k). ``max_degree``
    is the fence: nodes above the cap leave the graph WITH their edges
    before the join (whole-node drop, row-order independent — the
    fuzzy_matches hot-block discipline) and all outputs are residual-
    graph stats; audit what dropped with :func:`triangle_supernodes`.
    Node rollups are two exploded aggregates. The canonical edge frame
    persists (16 B/row): up to six consumers (fence degree pass, three
    join sides, node rollups) would otherwise each re-derive the pair
    lane — measured ~6× the pair-build cost before this persist
    (SCALE.md r9k)."""
    e0 = private_persist(
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        ).distinct()
    )
    e = e0
    if max_degree is not None:
        hot = (
            e.select(F.explode(F.array("u", "v")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") > int(max_degree))
            .select("id")
        )
        e = e.join(
            hot.withColumnRenamed("id", "u"), "u", "left_anti"
        ).join(hot.withColumnRenamed("id", "v"), "v", "left_anti")
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    out = deg.join(nt, "id", "left").select(
        "id",
        F.col("degree").cast("long").alias("degree"),
        t.alias("n_triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                F.lit(2.0) * t / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )
    # node-sized (32 B/row, ≪ the edge frame it frees): eager-checkpoint
    # cuts lineage off the persisted edges so the cache releases HERE
    # (the cell_quality discipline) instead of accruing one edge frame
    # per call in a long-lived session
    out = out.localCheckpoint(eager=True)
    e0.unpersist()
    return out


def merge_components(
    components: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Incremental connected-components maintenance — fold a NEW batch
    of candidate pairs into a persisted ``(id, component)`` labeling
    WITHOUT re-running CC over the old edge set (the artifact-lane
    answer to "1% of the corpus landed tonight; don't rebuild the
    quadratic basis"). Precondition: ``components`` came from
    ``connected_components``/``_star`` (label = min reachable id,
    transitively closed); then the result is IDENTICAL to from-scratch
    CC over (old edges ∪ ``new_pairs``) — the property the
    ``doc_components_incremental`` gate certifies against the full
    recursive-CTE oracle.

    Mechanics: contract each old component to its label (sound because
    the labeling is transitively closed), map every new-edge endpoint
    through the labeling (ids the artifact has never seen — novel docs,
    or old docs with no prior pair — map to themselves), drop the
    self-loops (intra-component pairs change nothing), and run star-CC
    on this CONTRACTED graph — sized by the touched components and
    novel ids, never by the old edge set. Because every old label is
    the min id of its component, the contracted min IS the global min,
    so rewriting ``component → merged(component)`` (untouched labels
    keep themselves) reproduces from-scratch labels exactly.

    Scale shape: two id-keyed equi-joins of the (small) batch pair
    frame against the 16 B/row artifact, the star-CC loop on the
    batch-sized contracted graph, and one component-keyed relabel join
    — each a single minimal shuffle; nothing scales with the historic
    pair lane."""
    comp = components.select("id", "component")
    # the batch pair frame feeds the contraction AND the novel-endpoint
    # census (3 references) — persist so an inline incremental pair
    # generation (the new_ids-pruned jaccard join in the gate) runs
    # once, not three times (r13, guide §5: the gate measured 20.1 s
    # before, dominated by the triple batch-pair build; private: the
    # entry must not be matchable by other queries)
    new_pairs = private_persist(new_pairs.select(id_a, id_b))
    ca = comp.select(F.col("id").alias(id_a), F.col("component").alias("_ca"))
    cb = comp.select(F.col("id").alias(id_b), F.col("component").alias("_cb"))
    contracted = (
        new_pairs.select(id_a, id_b)
        .join(ca, id_a, "left")
        .join(cb, id_b, "left")
        .select(
            F.coalesce("_ca", F.col(id_a)).alias("id_a"),
            F.coalesce("_cb", F.col(id_b)).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    merged = connected_components_star(contracted, "id_a", "id_b", max_iter=max_iter)
    relabel = merged.select(
        F.col("id").alias("_lbl"), F.col("component").alias("_new")
    )
    out_old = comp.join(relabel, comp["component"] == F.col("_lbl"), "left").select(
        "id", F.coalesce("_new", "component").alias("component")
    )
    # endpoints the artifact has never labeled take their label straight
    # from the contracted CC (they mapped to themselves there). An old
    # LABEL id is in comp, so the anti-join keeps the union disjoint.
    ends = (
        new_pairs.select(F.col(id_a).alias("id"))
        .unionByName(new_pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .join(comp.select("id"), "id", "left_anti")
    )
    out_new = ends.join(merged, "id")
    return out_old.unionByName(out_new.select("id", "component"))


def write_edges(
    pairs: DataFrame, path: str, id_a: str = "id_a", id_b: str = "id_b"
) -> None:
    """Persist the CANONICAL dup-graph edge frame (u < v, distinct;
    16 B/row) as a corpus-release artifact — the
    ``curation.write_components`` cadence for edge-shaped consumers
    (``triangle_stats``, ``graph_profile`` degree lanes, future motif
    counts). Building the pair lane (shingle → block → exact Jaccard)
    is the expensive step — SCALE.md r9k measured the inline build
    dominating the fenced triangle pass at ×10 — so the steady state is
    write-once, read-back: every later graph query is a 2-column
    parquet scan instead of a corpus re-shingle. Repartitioned by ``u``
    so node-keyed joins can prune files."""
    (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .distinct()
        .repartition("u")
        .write.mode("overwrite")
        .parquet(path)
    )


def triangle_supernodes(
    pairs: DataFrame,
    max_degree: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The ``triangle_stats(max_degree=)`` drop report: ``(id, degree)``
    of every node the fence would exclude — silent truncation made
    auditable (the fuzzy_blocks_oversize twin)."""
    e = pairs.select(
        F.least(F.col(id_a), F.col(id_b)).alias("u"),
        F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
    ).distinct()
    return (
        e.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") > int(max_degree))
    )


def minhash_quality(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 2,
    basis: str = "md5",
    sample_frac: float | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    **kw,
) -> DataFrame:
    """In-engine precision/recall report for the MinHash lane against
    the exact blocked-Jaccard ground truth at the SAME threshold — the
    number a production dedup pipeline monitors to retune bands/rows
    (the text-side ``ann_recall``). One row:
    ``(n_candidates, n_true, n_hit, n_false, n_missed, precision,
    recall)`` where hits are candidate pairs whose EXACT Jaccard clears
    the threshold. Perfect recall is the banding guarantee to verify,
    precision < 1 is the signature-estimation cost you pay.

    Scale shape: both pair frames are blocked/banded (never all-pairs),
    but the exact-Jaccard truth set still grows block² with corpus size
    — so the cost is bounded BY CONTRACT, not caller discipline:
    ``sample_frac`` keeps each doc with probability ≈ ``sample_frac``
    by a deterministic content-independent hash draw (md5 of
    (seed, id) — the same device as ``text_ops.sample_stratified``; no
    RNG, no ordering dependence, a doc stays in/out of the sample
    across runs and engines). Both the candidate and truth lanes see
    the SAME sampled corpus, so precision/recall remain well-defined on
    the subsample — the metric is a calibration estimate either way.
    At 100 TB call with ``sample_frac`` set (e.g. 1e-3); ``None`` runs
    the full corpus (small-data calibration only)."""
    if sample_frac is not None:
        if not (0.0 < float(sample_frac) <= 1.0):
            raise ValueError("sample_frac must be in (0, 1]")
        # first 8 hex chars of md5 → uniform 32-bit draw; stable per id
        draw = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double") / F.lit(float(2**32))
        docs = docs.filter(draw < float(sample_frac))
    cand = minhash_near_duplicates(
        docs, threshold=threshold, shingle_k=shingle_k, basis=basis, **kw
    ).select("id_a", "id_b", F.lit(1).alias("_c"))
    truth = jaccard_pairs_blocked(
        docs, shingle_k=shingle_k, threshold=threshold
    ).select("id_a", "id_b", F.lit(1).alias("_t"))
    j = cand.join(truth, ["id_a", "id_b"], "full_outer")
    agg = j.agg(
        F.sum(F.coalesce("_c", F.lit(0))).alias("n_candidates"),
        F.sum(F.coalesce("_t", F.lit(0))).alias("n_true"),
        F.sum((F.col("_c").isNotNull() & F.col("_t").isNotNull()).cast("long")).alias(
            "n_hit"
        ),
    )
    return agg.select(
        "n_candidates",
        "n_true",
        "n_hit",
        (F.col("n_candidates") - F.col("n_hit")).alias("n_false"),
        (F.col("n_true") - F.col("n_hit")).alias("n_missed"),
        F.when(
            F.col("n_candidates") > 0,
            F.round(F.col("n_hit") / F.col("n_candidates"), 6),
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0, F.round(F.col("n_hit") / F.col("n_true"), 6)
        ).alias("recall"),
    )
