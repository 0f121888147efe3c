"""Text-analysis operators over the ``documents`` table — token counting,
quality scoring, language-ID, fingerprinting. Thin DataFrame wrappers over
the column functions in functions/text.py; everything JVM-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epicsarchiver_spark.functions import hashing
from epicsarchiver_spark.functions import text as T


def text_stats(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token/char statistics + fingerprint."""
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars_actual"),
        T.token_count(F.col(text)).alias("n_tokens"),
        T.bpe_token_count(F.col(text)).alias("n_bpe_tokens"),
        F.round(T.mean_token_len(F.col(text)), 6).alias("mean_token_len"),
        T.fingerprint64(F.col(text)).alias("fingerprint"),
    )


def unigram_logprob(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-unigram log-probability quality signal — the cheap stand-in
    for a KenLM perplexity filter: score each document by the mean
    negative log-probability of its tokens under the corpus's own
    unigram distribution (Lidstone-smoothed: p(t) = (c(t)+α) / (N+α·V)).
    Gibberish and off-distribution documents score high; boilerplate
    scores low. Rank-filter on the output (e.g. drop the top x%).

    One logical job: explode → (term) count agg for the model, per-doc
    (term, tf) partials for the scorer, term-keyed join (model side is
    |V| rows — AQE broadcasts), per-doc weighted aggregate. N and V ride
    a broadcast 1-row frame like tfidf's n_docs — no eager action."""
    toks = docs.select(F.col(id_col), F.explode(T.tokens(F.lower(F.col(text)))).alias("term"))
    # r13: persists tried here measured slower — ReuseExchange already
    # dedupes the repeated model subtree (see bigram_logprob's note)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    model = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    totals = model.agg(
        F.sum("c").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    logp = F.log(
        (F.col("c") + F.lit(alpha))
        / (F.col("_N") + F.lit(alpha) * F.col("_V")).cast("double")
    )
    return (
        tf.join(model, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(-F.sum(F.col("tf") * logp) / F.sum("tf"), 6).alias("mean_neg_logprob"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance score (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): rank raw-corpus
    documents by how much more likely they are under a TARGET-domain
    bag-of-words model than under the raw corpus's own model —

        score(d) = (1/|d|) Σ_w tf(w,d) · [log p_target(w) − log p_raw(w)]

    with both unigram models Lidstone-smoothed over the UNION vocabulary
    (same V on both sides, so out-of-target terms are penalized rather
    than undefined). Sample top-score (or importance-resample on
    exp(score)) to tilt the training mix toward the target domain — the
    standard cheap alternative to classifier-based selection.

    Plan shape (the ``unigram_logprob`` discipline): both models are
    vocab-sized aggregates; the per-term log-ratio weight computes ONCE
    on the joined vocab frame (full outer, missing side → count 0); the
    big per-doc tf frame joins that weight table a single time; N/V
    totals ride one broadcast 1-row frame. No eager action anywhere."""
    d_toks = docs.select(
        F.col(id_col), F.explode(T.tokens(F.lower(F.col(text)))).alias("term")
    )
    tf = d_toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    raw_model = tf.groupBy("term").agg(F.sum("tf").alias("c_raw"))
    tgt_model = (
        target.select(F.explode(T.tokens(F.lower(F.col(text)))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    vocab = raw_model.join(tgt_model, "term", "full_outer").select(
        "term",
        F.coalesce(F.col("c_raw"), F.lit(0)).alias("c_raw"),
        F.coalesce(F.col("c_tgt"), F.lit(0)).alias("c_tgt"),
    )
    totals = vocab.agg(
        F.sum("c_raw").alias("_Nr"),
        F.sum("c_tgt").alias("_Nt"),
        F.count(F.lit(1)).alias("_V"),
    )
    log_ratio = F.log(
        (F.col("c_tgt") + F.lit(alpha))
        / (F.col("_Nt") + F.lit(alpha) * F.col("_V")).cast("double")
    ) - F.log(
        (F.col("c_raw") + F.lit(alpha))
        / (F.col("_Nr") + F.lit(alpha) * F.col("_V")).cast("double")
    )
    weights = vocab.crossJoin(F.broadcast(totals)).select(
        "term", log_ratio.alias("_w")
    )
    return (
        tf.join(weights, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("_w")) / F.sum("tf"), 6).alias(
                "dsir_score"
            ),
        )
    )


def dedup_segments(
    docs: DataFrame, sep: str = "\n", text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """WITHIN-document segment dedup — remove exact repeated segments
    (lines / paragraphs / sep-delimited units), keeping the FIRST
    occurrence in order (the C4/Gopher de-boilerplating step at segment
    granularity: repeated nav bars, footers, chorus lines).

    Entirely array-local: split → filter empties → first-occurrence fold
    via ``aggregate`` (accumulator = segments seen so far, in order).
    Zero shuffle, embarrassingly parallel — the per-row fold is O(s²) in
    the segment count of ONE document, which is bounded; nothing about
    the corpus size appears anywhere. Returns (id, n_segments, n_kept,
    text_dedup)."""
    import re as _re

    segs = F.filter(
        F.split(F.col(text), _re.escape(sep)), lambda x: x != F.lit("")
    )
    kept = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.array_append(acc, x)
        ),
    )
    return docs.select(
        F.col(id_col),
        F.size(segs).cast("long").alias("n_segments"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, sep).alias("text_dedup"),
    )


def heavy_hitters(
    docs: DataFrame,
    min_count: int,
    text: str = "text",
    id_col: str = "doc_id",
    width: int = 2048,
    depth: int = 4,
    sketch: bool = True,
    seed: int = 7,
) -> DataFrame:
    """Exact corpus heavy hitters — every term occurring ≥ ``min_count``
    times, with its exact count — computed with a count-min-sketch
    prefilter: pass 1 aggregates ``depth × width`` hashed-bucket counts
    (a BOUNDED shuffle regardless of vocabulary size — the whole point
    at 100 TB, where the naive per-term aggregate shuffles partials for
    every distinct term); the collected sketch (≤ depth·width ints, a
    deliberate small driver artifact like IVF centroids) rides pass 2
    as ONE ArrayType literal per depth row, parsed from a SQL ``array(
    …)`` string — a single Literal node each, NOT width CreateArray
    children (the r4 shape put 8,192 expression literals in the plan,
    risking codegen-size fallback as width grows). The expr-string
    construction matters too: ``F.lit(list)`` converts element-by-
    element over py4j (~1 s per 2048-int array, measured), while one
    JVM parse of the array string is ~10 ms. Pass 2 drops every token
    whose sketch estimate is already below threshold BEFORE the exact
    aggregate — only near-frequent terms' occurrences shuffle. CMS
    never undercounts, so no true heavy hitter is lost: the final exact
    filter makes the result IDENTICAL to the plain group-by (the
    oracle), sketch parameters only tune how much pass-2 shuffle the
    prefilter saves. ``sketch=False`` is that plain group-by (small
    corpora / verifier).

    Pass 2 re-tokenizes rather than caching the exploded token frame:
    tokenization is in-scan codegen (cheaper than materializing strings
    to memory — persisting measured strictly slower at sf0.1, and at
    100 TB caching the token explosion is a non-starter)."""
    from epicsarchiver_spark.functions.text import tokens

    tok = docs.select(F.explode(tokens(F.col(text))).alias("term"))
    if not sketch:
        return (
            tok.groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
        )

    def _idx(i: int):
        return F.pmod(F.xxhash64(F.col("term"), F.lit(seed + i)), F.lit(width))

    buckets = tok.select(
        F.posexplode(F.array(*[_idx(i) for i in range(depth)])).alias("i", "idx")
    )
    rows = buckets.groupBy("i", "idx").agg(F.count(F.lit(1)).alias("c")).collect()
    import numpy as np

    cms = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        cms[r.i, r.idx] = r.c
    est = F.least(
        *[
            F.element_at(
                F.expr("array(" + ",".join(f"{int(c)}L" for c in cms[i]) + ")"),
                (_idx(i) + 1).cast("int"),
            )
            for i in range(depth)
        ]
    )
    return (
        tok.filter(est >= min_count)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def blocklist_stats(
    docs: DataFrame,
    words: list[str],
    max_hit_ratio: float = 0.0,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style badword filtering, generalized: per doc, the fraction of
    tokens that hit a blocklist, and the keep/drop verdict
    (``hit_ratio ≤ max_hit_ratio``; C4's "drop on ANY hit" is the
    default 0.0). Returns ``(id, n_tokens, n_hits, hit_ratio, keep)`` —
    callers filter on ``keep`` (the stats themselves are what you audit
    before committing to a list).

    Zero shuffle: tokenize once (materialized attribute), membership is
    an array-local scan against the words literal — right for real
    blocklists (10²–10³ entries, O(W) per token interpreted but W
    small). For 10⁵+-entry lists, explode tokens and broadcast-join the
    wordlist instead (the ``contamination_overlap`` shape)."""
    from epicsarchiver_spark.functions.text import tokens

    wl = F.array(*[F.lit(w.lower()) for w in words])
    base = docs.select(F.col(id_col), tokens(F.col(text)).alias("_tk"))
    counted = base.select(
        F.col(id_col),
        F.size("_tk").cast("long").alias("n_tokens"),
        F.size(
            F.filter(F.col("_tk"), lambda x: F.array_contains(wl, F.lower(x)))
        ).cast("long").alias("n_hits"),
    )
    ratio = F.when(
        F.col("n_tokens") > 0,
        F.col("n_hits").cast("double") / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    return counted.select(
        id_col,
        "n_tokens",
        "n_hits",
        ratio.alias("hit_ratio"),
        (ratio <= F.lit(max_hit_ratio)).alias("keep"),
    )


def dedup_paragraphs_corpus(
    docs: DataFrame, sep: str = "\n", text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CORPUS-level paragraph dedup (the CCNet step): keep exactly ONE
    copy of every distinct segment across the whole corpus — the first
    occurrence in (doc, position) order — and excise every other
    instance, including repeats inside the winning document. This is
    what strips mirrored boilerplate (cookie banners, license blocks,
    syndicated article bodies) that within-doc dedup
    (``dedup_segments``) cannot see. Returns ``(id, n_segments, n_kept,
    text_dedup)``.

    Scale shape: only ``(doc_id, position, md5)`` triples shuffle —
    segment TEXT never leaves its scan (md5's 128 bits make cross-text
    collisions ignorable at any corpus size). One hash aggregate picks
    each segment's global winner as min (doc, position); winners come
    back per doc as a sorted index list via one id-keyed join (skew-free:
    ≤ one row per surviving segment), and reassembly is an array-local
    index filter."""
    import re as _re

    segs_col = F.filter(
        F.split(F.col(text), _re.escape(sep)), lambda x: x != F.lit("")
    )
    base = docs.select(F.col(id_col), segs_col.alias("_segs"))
    occ = base.select(
        F.col(id_col), F.posexplode("_segs").alias("_idx", "_seg")
    ).select(F.col(id_col), F.col("_idx"), F.md5("_seg").alias("_h"))
    winners = (
        occ.groupBy("_h")
        .agg(F.min(F.struct(F.col(id_col), F.col("_idx"))).alias("_w"))
        .select(F.col(f"_w.{id_col}").alias(id_col), F.col("_w._idx").alias("_idx"))
    )
    keep_idx = winners.groupBy(id_col).agg(
        F.sort_array(F.collect_list("_idx")).alias("_ki")
    )
    joined = base.join(keep_idx, id_col, "left").select(
        F.col(id_col),
        F.col("_segs"),
        F.coalesce(F.col("_ki"), F.array().cast("array<integer>")).alias("_ki"),
    )
    # kept is referenced twice below — materialize it as an attribute so
    # the index filter runs once per doc (CollapseProject discipline)
    with_kept = joined.select(
        F.col(id_col),
        F.col("_segs"),
        F.filter(
            F.col("_segs"), lambda x, j: F.array_contains(F.col("_ki"), j)
        ).alias("_kept"),
    )
    return with_kept.select(
        F.col(id_col),
        F.size("_segs").cast("long").alias("n_segments"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.array_join("_kept", sep).alias("text_dedup"),
    )


def quality_scores(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality heuristics (length / punctuation / stopwords)."""
    return docs.select(
        F.col(id_col),
        F.round(T.punct_ratio(F.col(text)), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(F.col(text)), 6).alias("stopword_ratio"),
        F.round(T.quality_score(F.col(text)), 6).alias("quality"),
    )


def gopher_rules(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 25,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 1,
    passthrough: tuple = (),
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", App. A): per-doc heuristic
    signals and a composite ``keep`` verdict —
    ``(id, n_words, mean_word_len, alpha_frac, symbol_ratio,
    n_stopwords, keep)``. Rules: word count in [min,max]; mean word
    length in [min,max]; symbol('#'/'…')-to-word ratio below the cap;
    ≥ min_alpha_frac of words contain a letter; at least
    ``min_stopwords`` distinct common stopwords present.

    All JVM builtins over ONE materialized token array (the projection
    layering discipline of ``_with_lang_pred``); zero shuffle — the
    filter is a narrow scan however large the corpus."""
    stop = sorted(T.LANG_STOPWORDS["en"])
    # passthrough: extra columns carried to the output unchanged — lets
    # a STREAMING caller keep the full row without a (stream-stream)
    # join back onto the source
    thru = [F.col(c) for c in passthrough]
    toks = docs.select(
        F.col(id_col), *thru, F.col(text).alias("_t"), T.tokens(F.col(text)).alias("_toks")
    )
    # '#' count = length delta of strip; '...'/'…' counted as one symbol
    hash_n = F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("#"), F.lit("")))
    ell_n = (
        F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    # every per-word ratio is guarded for the zero-token doc (ANSI mode
    # turns x/0 into a stage-killing error, not ±inf — one empty doc
    # must not fail a 100 TB scan); ratios are NULL there and the keep
    # verdict is already false via the word-count floor (false AND null
    # = false)
    _nz = F.when(F.size("_toks") > 0, F.size("_toks"))
    stats = toks.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.size("_toks").cast("long").alias("n_words"),
        F.round(
            F.aggregate(
                "_toks", F.lit(0).cast("long"), lambda a, x: a + F.length(x)
            ).cast("double")
            / _nz,
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter("_toks", lambda x: x.rlike("[A-Za-z]"))).cast("double")
            / _nz,
            6,
        ).alias("alpha_frac"),
        F.round((hash_n + ell_n).cast("double") / _nz, 6).alias(
            "symbol_ratio"
        ),
        F.size(
            F.array_intersect(
                F.transform("_toks", F.lower), F.array(*[F.lit(w) for w in stop])
            )
        )
        .cast("long")
        .alias("n_stopwords"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return stats.select("*", keep.alias("keep"))


def _with_lang_pred(docs: DataFrame, text: str, keep: list) -> DataFrame:
    """Three-projection language-ID: tokenize once, score once, argmax
    once — inline `T.langid(text)` would re-tokenize per language per
    reference (~10× the work; see functions/hashing.py on CollapseProject
    and interpreted higher-order functions)."""
    toks = docs.select(
        *keep, F.transform(T.tokens(F.col(text)), lambda t: F.lower(t)).alias("_toks")
    )
    keep_names = [c for c in toks.columns if c != "_toks"]
    scored = toks.select(
        *keep_names,
        F.array(
            *[
                F.struct(
                    F.lit(lang).alias("lang"),
                    F.size(
                        F.array_intersect("_toks", F.array(*[F.lit(w) for w in words]))
                    ).alias("hits"),
                )
                for lang, words in sorted(T.LANG_STOPWORDS.items())
            ]
        ).alias("_scores"),
    )
    max_hits = F.array_max(F.transform("_scores", lambda s: s["hits"]))
    best = F.array_min(
        F.transform(
            F.filter("_scores", lambda s: s["hits"] == F.col("_max")), lambda s: s["lang"]
        )
    )
    return (
        scored.withColumn("_max", max_hits)
        .withColumn("lang_pred", F.when(F.col("_max") > 0, best).otherwise(F.lit("und")))
        .drop("_toks", "_scores", "_max")
    )


def langid_table(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc predicted language via the stopword-hits heuristic."""
    return _with_lang_pred(docs, text, [F.col(id_col)])


def langid_eval(docs: DataFrame, text: str = "text", label: str = "lang") -> DataFrame:
    """Confusion counts of predicted vs labeled language."""
    return (
        _with_lang_pred(docs, text, [F.col(label).alias("lang_true")])
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_true", "lang_pred")
    )


def tfidf_top_terms(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)) + 1, the sklearn smoothing — fully
    SQL-reproducible). The keyword/feature-extraction step of a
    training-data pipeline.

    Plan: explode → (doc,term) partial-agg count → term-level df agg →
    term-keyed join (vocab side is |V| rows — AQE broadcasts it when it
    fits) → per-doc top-k window. Ties broken by term for determinism.

    ``n_docs`` — corpus size N for the idf. Pass it when the caller
    already knows it (pipeline scale); when None, N is computed INSIDE
    the job as a broadcast 1-row cross join (the SQL ``CROSS JOIN
    (SELECT count(*) ...)`` shape) — never as an eager ``docs.count()``,
    which is a driver-blocking extra scan of the corpus before the real
    job starts.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(T.tokens(F.lower(F.col(text)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if n_docs is not None:
        n_col = F.lit(float(n_docs))
        joined = tf.join(df, "term")
    else:
        n_col = F.col("_n_docs").cast("double")
        joined = tf.join(df, "term").crossJoin(
            F.broadcast(docs.agg(F.count(F.lit(1)).alias("_n_docs")))
        )
    idf = F.log((F.lit(1.0) + n_col) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        joined.withColumn("tfidf", F.round(F.col("tf") * idf, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def query_match_base(
    docs: DataFrame,
    query_terms: list[str],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ``(id, _dl, _hit)`` projection both keyword rankers start
    from: doc length + the token array intersected with the (lowercased,
    deduped, sorted) query. ``bm25_topk`` and ``qld_topk`` build exactly
    this internally; a multi-lane caller (the RRF hybrid gate) builds it
    ONCE, private_persists it, and passes it to both via ``base=`` so
    the corpus is tokenized once instead of 5× (r14, guide §2.4 — two
    operations keyed the same way share one pass). Rows are (id, int,
    ≤|q| matched tokens) — tiny next to the text they summarize."""
    terms = sorted({t.lower() for t in query_terms})
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        F.filter(toks, lambda t: t.isin(*terms)).alias("_hit"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
    base: DataFrame | None = None,
) -> DataFrame:
    """BM25 document retrieval — the standard keyword-relevance ranker
    (Robertson/Sparck Jones; the Lucene default), completing the text
    surface's search lane beyond tfidf feature extraction: given a bag
    of query terms, score every matching document with

        Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
        idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene's variant)

    and return the top-``k`` ``(doc_id, n_terms_matched, score, rank)``.

    Scale shape: the query is a literal broadcast — the token array is
    intersected with it BEFORE the explode, so the per-doc fan-out is
    |matched terms| (≤ |query|), never document length; doc length and
    N/avgdl come from one narrow scan reduced map-side to a broadcast
    1-row frame (the tfidf_top_terms discipline — no driver-blocking
    count()); df is a |query|-sized aggregate. Everything downstream of
    the scan is |matches| ≤ N·|query| rows, and the top-k is
    TakeOrderedAndProject. Scores rounded to 6 dp; ties break on
    doc_id for engine determinism."""
    # r13: persists tried here (base, tf) measured slower —
    # ReuseExchange already dedupes the repeated subtrees at runtime.
    # ``base``: a caller-built query_match_base(docs, query_terms) frame
    # (typically persisted and shared with a qld_topk lane) — the same
    # projection this builds inline, computed once for several lanes.
    if base is None:
        base = query_match_base(docs, query_terms, text=text, id_col=id_col)
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    # one doc-keyed exchange serves the (id, _dl, term) grouping AND the
    # per-doc rollup below (subset-key distribution — same discipline as
    # keyword_labels)
    tf = (
        base.filter(F.size("_hit") > 0)
        .select(F.col(id_col), "_dl", F.explode("_hit").alias("term"))
        .repartition(F.col(id_col))
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(stats))
    contrib = _bm25_contrib(F.col("_n"), F.col("_avgdl"), F.col("_dl"), k1, b)
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum(contrib), 6).alias("score"),
    )
    return _bm25_ranked_topk(per_doc, id_col, k)


def _bm25_contrib(n, avgdl, dl, k1: float, b: float):
    """The per-(doc, term) BM25 contribution — Lucene-variant idf ×
    saturated tf — over the standard ``tf``/``df`` columns; ``n``,
    ``avgdl``, ``dl`` are Columns so the inline (``_n``/``_avgdl``/
    ``_dl``) and indexed (``n``/``avgdl``/``dl``) lanes share ONE
    formula (doc_bm25_indexed is contractually row-identical to
    doc_bm25_topk — a tweak applied to one copy must hit all)."""
    idf = F.log(F.lit(1.0) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    return idf * F.col("tf") * F.lit(k1 + 1.0) / denom


def _bm25_ranked_topk(per_doc: DataFrame, id_col: str, k: int) -> DataFrame:
    """Shared top-k tail: TakeOrderedAndProject FIRST, then the rank
    window over ≤ k rows under the GlobalLimit (plan-pinned)."""
    topk = per_doc.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return topk.select(
        id_col,
        "n_terms_matched",
        "score",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def bm25_prf(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 with pseudo-relevance feedback (Rocchio/RM1-lite) — the
    classic two-round retrieval loop: rank once, assume the top
    ``fb_docs`` are relevant, mine their ``fb_terms`` best expansion
    terms (feedback tf × the same Lucene idf, original terms excluded,
    ties (score, term)), re-rank with the expanded query. Recovers
    vocabulary-mismatch docs a literal keyword query misses.

    Scale shape: round 1 is the certified ``bm25_topk``; the feedback
    doc ids (≤ fb_docs) and the chosen expansion terms (≤ fb_terms) are
    the only driver hops — bounded artifacts. Expansion scoring joins
    the feedback docs' term counts (bounded × doc length) against the
    corpus df table (one distinct-token pass, the ``tfidf_top_terms``
    cost class) with the small side broadcast. Round 2 is ``bm25_topk``
    again with the union term list. At 100 TB both rounds can ride the
    persisted postings index instead of the inline scan."""
    terms = sorted({t.lower() for t in query_terms})
    fb = bm25_topk(docs, terms, k=int(fb_docs), k1=k1, b=b, text=text, id_col=id_col)
    fb_ids = [r[0] for r in fb.select(id_col).collect()]
    if not fb_ids:
        return bm25_topk(docs, terms, k=int(k), k1=k1, b=b, text=text, id_col=id_col)
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    n_docs = base.agg(F.count(F.lit(1)).alias("_n"))
    fbtf = (
        base.filter(F.col(id_col).isin(fb_ids))
        .select(F.explode("_toks").alias("term"))
        .filter(~F.col("term").isin(*terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
    )
    dfall = (
        base.select(F.explode(F.array_distinct("_toks")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    expansion = [
        r["term"]
        for r in dfall.join(F.broadcast(fbtf), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("term", F.round(F.col("tf_fb") * idf, 6).alias("_s"))
        .orderBy(F.col("_s").desc(), F.col("term"))
        .limit(int(fb_terms))
        .collect()
    ]
    return bm25_topk(
        docs, terms + expansion, k=int(k), k1=k1, b=b, text=text, id_col=id_col
    )


def ranked_lane(
    topk: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """Attach a 1-based ``rank`` to an ALREADY top-k-bounded retrieval
    result (``brute_force_topk``'s cosine frame, an ADC candidate list,
    ...) so it can feed ``rrf_fuse``. Ties break on ``id_col``. The
    unpartitioned rank window is safe only because the input is a
    k-row frame under a GlobalLimit — same posture as
    ``_bm25_ranked_topk``; never call this on an unbounded corpus."""
    order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.orderBy(order, F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def rrf_fuse(
    lanes: dict[str, DataFrame],
    k: int = 20,
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    scale: int = 10**12,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) of
    retrieval lanes — the standard hybrid-search combiner: a lexical
    BM25 lane and a semantic embedding lane each rank the corpus their
    own way, and each contributes ``scale // (k0 + rank)`` to every doc
    it returned; fused score = the sum across lanes. Returns
    ``(id, n_lanes, rrf_scaled, rank)`` — top-``k`` by fused score,
    ties on id.

    Contributions are exact INTEGER quotients (``DIV``), so the fused
    sum is summation-order-independent and bit-identical in any engine
    — the pagerank fixed-point discipline applied to rank fusion; no
    IEEE tie at the cut is possible.

    Scale shape: inputs are ALREADY-RANKED top-k frames, each bounded
    by its lane's retrieval k — at 100 TB the lanes do the corpus-scale
    work against their own indexes (BM25 postings, IVF-PQ cells) and
    fusion never rescans: the union is Σ|lane| rows, the rollup
    |candidate set| groups, and the final rank window sits under the
    GlobalLimit like ``_bm25_ranked_topk``'s."""
    if not lanes:
        raise ValueError("rrf_fuse needs at least one ranked lane")
    tagged = None
    contrib = F.expr(f"CAST({int(scale)} AS BIGINT) DIV (CAST({int(k0)} AS BIGINT) + {rank_col})")
    for _name, df in sorted(lanes.items()):
        part = df.select(F.col(id_col), contrib.alias("_contrib"))
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lanes"),
        F.sum("_contrib").alias("rrf_scaled"),
    )
    topk = fused.orderBy(F.col("rrf_scaled").desc(), F.col(id_col)).limit(int(k))
    w = Window.orderBy(F.col("rrf_scaled").desc(), F.col(id_col))
    return topk.select(
        id_col,
        "n_lanes",
        "rrf_scaled",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def snippet_window(
    docs: DataFrame,
    terms: list[str],
    width: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Best-window snippet extraction — the result-page highlighter:
    per document, the ``width``-token window holding the MOST query
    terms (ties → earliest start; the optimal window can always anchor
    at a matched token, so only matched positions are candidates).
    Returns ``(id, n_matched, start, snippet)`` over the full doc spine
    — ``n_matched`` 0 with NULL start/snippet when nothing matches.

    Everything is per-row array math in WholeStageCodegen: matched
    positions via a sequence filter, the argmax as a sequential
    left-fold carrying (count, start) with strict improvement (earliest
    tie kept), the snippet a slice + join. Zero shuffles — the operator
    is a projection."""
    tset = sorted({t.lower() for t in terms})
    if not tset:
        raise ValueError("snippet_window needs at least one term")
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    # empty/whitespace/NULL text → empty token array → sequence(1, 0)
    # DESCENDS to [1, 0] and element_at(_, 0) throws; guard like
    # word_shingles (functions/text.py:54)
    pos = F.when(
        F.size("_toks") > 0,
        F.filter(
            F.sequence(F.lit(1), F.size("_toks")),
            lambda i: F.element_at("_toks", i).isin(*tset),
        ),
    ).otherwise(F.array().cast("array<int>"))
    base = base.withColumn("_pos", pos)
    cnt_at = lambda p: F.size(  # noqa: E731
        F.filter("_pos", lambda q: (q >= p) & (q < p + F.lit(int(width))))
    )
    best = F.aggregate(
        "_pos",
        F.struct(F.lit(0).alias("c"), F.lit(0).alias("p")),
        lambda acc, p: F.when(cnt_at(p) > acc["c"], F.struct(cnt_at(p).alias("c"), p.alias("p"))).otherwise(acc),
    )
    out = base.withColumn("_best", best).select(
        F.col(id_col),
        F.col("_best")["c"].cast("long").alias("n_matched"),
        F.when(F.col("_best")["c"] > 0, F.col("_best")["p"]).cast("long").alias("start"),
        F.when(
            F.col("_best")["c"] > 0,
            F.array_join(F.slice("_toks", F.col("_best")["p"], int(width)), " "),
        ).alias("snippet"),
    )
    return out


def bm25_multi(
    docs: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Standing-query BM25 — Q queries answered by ONE corpus pass (the
    alert/subscription server shape: re-running ``bm25_topk`` per query
    re-tokenizes the corpus Q times; a standing set shares everything):
    tokens intersect the UNION of all query terms before the explode,
    tf/df/length stats are computed once, a broadcast (query, term) map
    fans each matched pair out to the queries that want it, and each
    query takes its own top-``k`` via a rank window that compiles to
    WindowGroupLimit (map-side per-query limit before the shuffle).
    Returns ``(query, doc_id, n_terms_matched, score, rank)`` — scores
    identical to ``bm25_topk`` run per query (same ``_bm25_contrib``).

    Scale shape: one scan, fan-out ≤ |union terms| per doc, the map and
    stats broadcast; output is Σ_q top-k rows."""
    qpairs = sorted({(q, t.lower()) for q, ts_ in queries.items() for t in ts_})
    if not qpairs:
        raise ValueError("bm25_multi needs at least one query with terms")
    all_terms = sorted({t for _q, t in qpairs})
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        F.filter(toks, lambda t: t.isin(*all_terms)).alias("_hit"),
    )
    stats = base.agg(F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl"))
    tf = (
        base.filter(F.size("_hit") > 0)
        .select(F.col(id_col), "_dl", F.explode("_hit").alias("term"))
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qmap = docs.sparkSession.createDataFrame(qpairs, "query string, term string")
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(qmap), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = _bm25_contrib(F.col("_n"), F.col("_avgdl"), F.col("_dl"), k1, b)
    per = scored.groupBy("query", id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum(contrib), 6).alias("score"),
    )
    w = Window.partitionBy("query").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        per.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )


def qld_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: float = 2000.0,
    text: str = "text",
    id_col: str = "doc_id",
    base: DataFrame | None = None,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Ponte/Croft
    '98, Zhai/Lafferty '01) — the other classical ranker next to BM25:
    score(d) = Σ_t ln((tf_{t,d} + μ·P(t|C)) / (dl_d + μ)). Rewritten in
    the standard sparse form so only MATCHED (doc, term) pairs carry
    per-pair work:

        Σ_t ln(μ·P(t|C))  −  |q|·ln(dl + μ)  +  Σ_matched ln(1 + tf/(μ·P(t|C)))

    — a corpus constant (1-row broadcast), a per-doc length term (every
    doc scores, shorter docs win on unmatched mass: the LM behavior
    BM25 lacks), and the bm25-shaped sparse correction. Query terms
    absent from the corpus drop (their P(t|C)=0 would -inf every doc).
    Returns ``(doc_id, n_terms_matched, score, rank)`` like
    ``bm25_topk``; scores 6-dp rounded, ties on id.

    Scale shape: three tokenizing scans (corpus token total, matched
    pairs, per-doc lengths — Catalyst can't share an uncached subplan),
    with the |q|-sized collection-frequency aggregate folded out of the
    matched-pair lane rather than a fourth scan; the 1-row
    constant/total frames ride broadcast nested loops (the annotated
    one-row-crossJoin pattern); top-k is TakeOrderedAndProject. Cache
    the tokenized base upstream if scoring many queries per batch."""
    # persist the tokenized projection: five consumers (token total,
    # matched pairs, cf, constants, per-doc lengths) would otherwise
    # each re-tokenize the corpus through their own lineage — the
    # winnow-fingerprint persist precedent; rows are (id, dl, ≤|q|
    # matched tokens), tiny next to the text they summarize.
    # ``base``: a caller-built (and typically already-persisted)
    # query_match_base frame shared across ranker lanes (r14). Only a
    # base built HERE is unpersisted here — unpersisting a shared one
    # would silently evict it before the sibling lane executes (found
    # the hard way: the r14 hybrid gate's bm25 lane re-tokenized the
    # corpus because this function dropped the shared entry during its
    # eager top-k checkpoint).
    own_base = base is None
    if own_base:
        from epicsarchiver_spark.operators.dedup import private_persist

        base = private_persist(
            query_match_base(docs, query_terms, text=text, id_col=id_col)
        )
    tot = base.agg(F.sum("_dl").cast("long").alias("_tt"))
    tf = (
        base.filter(F.size("_hit") > 0)
        .select(F.col(id_col), F.explode("_hit").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # collection frequency folds out of the tf lane (docs without hits
    # contribute 0) — no third tokenize-the-corpus scan
    cfreq = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    # P(t|C) enters every expression as the SAME parse tree
    # (mu * cf / tt) so both engines evaluate identical IEEE ops
    p_mu = F.lit(float(mu)) * F.col("cf") / F.col("_tt")
    cons = (
        cfreq.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_nq"),
            F.coalesce(F.sum(F.log(p_mu)), F.lit(0.0)).alias("_csum"),
        )
    )
    corr = (
        tf.join(F.broadcast(cfreq), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum(F.log(F.lit(1.0) + F.col("tf") / p_mu)).alias("_corr"),
        )
    )
    scored = (
        base.select(F.col(id_col), F.col("_dl"))
        .join(corr, id_col, "left")
        .crossJoin(F.broadcast(cons))
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_terms_matched"), F.lit(0)).cast("long").alias(
                "n_terms_matched"
            ),
            F.round(
                F.col("_csum")
                + F.coalesce(F.col("_corr"), F.lit(0.0))
                - F.col("_nq").cast("double")
                * F.log(F.col("_dl").cast("double") + F.lit(float(mu))),
                6,
            ).alias("score"),
        )
    )
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    out = topk.select(
        id_col,
        "n_terms_matched",
        "score",
        F.row_number().over(w).cast("long").alias("rank"),
    )
    # k rows: eager-checkpoint to cut lineage off the persisted base and
    # release the cache HERE (the cell_quality discipline,
    # similarity.py) instead of leaking one tokenized projection per
    # call for the life of a SearchPipeline session. A caller-owned
    # shared base stays persisted — the caller's other lanes still
    # read it (lifecycle contract: caller unpersists / clearCache).
    out = out.localCheckpoint(eager=True)
    if own_base:
        base.unpersist()
    return out


def dcg_discounts(k: int, scale: int = 10**12) -> list[int]:
    """The exact-integer DCG discount table: round(scale / log2(r+1))
    for ranks 1..k — computed ONCE in python so Spark and any SQL
    oracle consume the identical literals (no engine libm in the sum)."""
    import math

    return [round(scale / math.log2(r + 1)) for r in range(1, k + 1)]


def retrieval_eval(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    gain_col: str = "gain",
    scale: int = 10**12,
) -> DataFrame:
    """Ranking-quality report for any retrieval lane — the metric
    triple every search/RAG tuning loop reads: given a ranked top-k
    frame (``bm25_topk``, a cosine lane, ``rrf_fuse``'s output) and a
    graded relevance table ``(id, gain)``, return ONE row

        (k, n_relevant_at_k, precision_at_k, mrr, ndcg_at_k)

    completing the eval family next to ``ann_recall`` (set overlap) and
    ``minhash_quality`` (pair precision/recall) with ORDER-aware
    quality.

    Exactness: the rank discounts 1/log2(rank+1) are a PYTHON-computed
    integer table round(scale/log2(r+1)) embedded as literals (the EWMA
    weight-table discipline — engine log2/libm rounding never enters),
    gains must be integral, so DCG and ideal DCG are exact BIGINT sums,
    summation-order-independent; nDCG is one double division of two
    such integers (ideal DCG = the top-k gains of the whole relevance
    table in (gain DESC, id) order). MRR is 1/first-relevant-rank, a
    single IEEE division.

    Scale shape: the ranked lane is k-bounded by construction; the only
    corpus-sized input is ``relevant``, reduced by one
    TakeOrderedAndProject to its top-k gains. Nothing shuffles more
    than k rows."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    gtype = relevant.schema[gain_col].dataType
    if not isinstance(gtype, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"gain column {gain_col!r} must be integral (got {gtype.simpleString()}): "
            "graded relevance rides exact BIGINT sums — quantize float gains first"
        )
    disc = dcg_discounts(int(k), int(scale))
    disc_lit = F.array(*[F.lit(x).cast("long") for x in disc])
    hits = ranked.filter(F.col(rank_col) <= int(k)).join(
        relevant.select(F.col(id_col), F.col(gain_col).alias("_g")), id_col, "left"
    )
    g = F.coalesce(F.col("_g"), F.lit(0)).cast("long")
    term = g * F.element_at(disc_lit, F.col(rank_col).cast("int"))
    agg = hits.agg(
        F.sum(term).alias("_dcg"),
        F.count(F.when(g > 0, 1)).alias("_nrel"),
        F.min(F.when(g > 0, F.col(rank_col))).alias("_fr"),
    )
    iw = Window.orderBy(F.col(gain_col).desc(), F.col(id_col))
    ideal = (
        relevant.filter(F.col(gain_col) > 0)
        .orderBy(F.col(gain_col).desc(), F.col(id_col))
        .limit(int(k))
        .select(
            (
                F.col(gain_col).cast("long")
                * F.element_at(disc_lit, F.row_number().over(iw))
            ).alias("_t")
        )
        .agg(F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("_idcg"))
    )
    return agg.crossJoin(F.broadcast(ideal)).select(
        F.lit(int(k)).cast("long").alias("k"),
        F.col("_nrel").cast("long").alias("n_relevant_at_k"),
        F.round(F.col("_nrel").cast("double") / F.lit(float(k)), 6).alias("precision_at_k"),
        F.round(
            F.when(F.col("_fr").isNotNull(), F.lit(1.0) / F.col("_fr").cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("mrr"),
        F.round(
            F.when(
                F.col("_idcg") > 0,
                F.coalesce(F.col("_dcg"), F.lit(0)).cast("double") / F.col("_idcg").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg_at_k"),
    )


def keyword_labels(
    docs: DataFrame,
    taxonomy: dict[str, list[str]],
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-taxonomy classification — the domain-filter stage real
    curation pipelines run (label every document by which keyword set
    matches it best): BM25-score each document against EVERY label's
    term list in one pass and return the argmax ``(doc_id, label,
    score, n_terms_matched)`` for documents matching ≥1 term. Ties
    break (score desc, label asc) for engine determinism.

    Scale shape: the taxonomy is a literal broadcast (|labels|·|terms|
    rows); the corpus scan intersects the token array with the UNION of
    all taxonomy terms before the explode (same discipline as
    ``bm25_topk``); df is per-TERM over documents (label-independent,
    so a term shared by two labels counts once); per-(doc, label)
    scores reduce map-side and the winner is one |labels|-bounded
    row_number per doc."""
    pairs = sorted(
        {(lbl, t.lower()) for lbl, terms in taxonomy.items() for t in terms}
    )
    all_terms = sorted({t for _lbl, t in pairs})
    spark = docs.sparkSession
    tax = spark.createDataFrame(pairs, "label string, term string")
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        F.filter(toks, lambda t: t.isin(*all_terms)).alias("_hit"),
    )
    stats = base.agg(F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl"))
    # ONE doc-keyed exchange serves the whole chain: hash-partitioning
    # on id satisfies the (id, _dl, term) and (id, label) groupings AND
    # the final per-doc rank window (subset-key distribution), so the
    # match frame shuffles once instead of three times
    tf = (
        base.filter(F.size("_hit") > 0)
        .select(F.col(id_col), "_dl", F.explode("_hit").alias("term"))
        .repartition(F.col(id_col))
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(tax), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = _bm25_contrib(F.col("_n"), F.col("_avgdl"), F.col("_dl"), k1, b)
    per_label = scored.groupBy(id_col, "label").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum(contrib), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label"))
    return (
        per_label.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "label", "score", "n_terms_matched")
    )


def build_bm25_index(
    docs: DataFrame,
    path: str,
    text: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Write the persisted BM25 basis — the standing-search deployment
    shape (SCALE.md r8e): ``<path>/postings`` holds ``(term, doc_id,
    tf, dl)`` sorted and range-partitioned BY TERM so a query's
    ``term IN (...)`` predicate prunes to the row groups containing its
    terms, and ``<path>/stats`` the 1-row ``(n, avgdl)`` corpus frame
    (over ALL docs, including zero-hit ones — the same denominator the
    inline lane uses). Written once per corpus release; every query
    after is a pruned read (``bm25_topk_indexed``)."""
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    base = docs.select(F.col(id_col), F.size(toks).alias("dl"), toks.alias("_t"))
    base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{path}/stats")
    (
        base.select(F.col(id_col), "dl", F.explode("_t").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .repartitionByRange(32, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )


def bm25_topk_indexed(
    spark,
    index_path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """``bm25_topk`` answered from the persisted index: the query's
    ``term IN (...)`` filter pushes into the postings scan (term-sorted
    row groups → only the query's slices are read), df is a
    |query|-sized aggregate OVER THE FILTERED POSTINGS (identical to
    the corpus df by construction), and stats ride the persisted 1-row
    frame. Result ≡ the inline lane row-for-row (shared oracle)."""
    terms = sorted({t.lower() for t in query_terms})
    post = spark.read.parquet(f"{index_path}/postings").filter(
        F.col("term").isin(terms)
    )
    stats = spark.read.parquet(f"{index_path}/stats")
    df = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = post.join(F.broadcast(df), "term").crossJoin(F.broadcast(stats))
    contrib = _bm25_contrib(F.col("n"), F.col("avgdl"), F.col("dl"), k1, b)
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(F.sum(contrib), 6).alias("score"),
    )
    return _bm25_ranked_topk(per_doc, id_col, k)


def vocabulary_topk(
    docs: DataFrame, k: int = 1000, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary statistics: top-k terms by total term frequency
    with document frequency — the vocab-building / token-budget audit
    step of a training-data pipeline. Returns (term, tf, df), tf-desc
    with term as the deterministic tiebreak.

    Scale shape: a (doc, term) partial count first (map-side combine
    collapses within-doc repeats before anything shuffles), then a
    per-term aggregate where df is a plain COUNT of the already-distinct
    (doc, term) rows — no count-distinct expansion. The final top-k
    plans as TakeOrderedAndProject (per-partition heap), never a global
    sort."""
    per_doc = (
        docs.select(F.col(id_col), F.explode(T.tokens(F.lower(F.col(text)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    stats = per_doc.groupBy("term").agg(
        F.sum("_tf").cast("long").alias("tf"),
        F.count(F.lit(1)).alias("df"),
    )
    return stats.orderBy(F.col("tf").desc(), F.col("term")).limit(k)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into token-bounded overlapping chunks — the
    context-window packing step of a training/RAG pipeline. Chunk i covers
    tokens [i·stride, i·stride + chunk_tokens), stride = chunk_tokens −
    overlap; the final partial chunk is kept (min 1 chunk per non-empty
    doc).

    All JVM-side: tokenize once, `sequence` over chunk starts, one
    posexplode — no UDF, so chunking a 100 TB corpus is a single narrow
    scan (output ≈ input × (1 + overlap/stride) bytes). Token = whitespace
    token; swap T.tokens for a BPE tokenizer UDF at production."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.col("_toks")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int"), F.lit(0)),
    )
    return (
        docs.select(F.col(id_col), T.tokens(F.col(text)).alias("_toks"))
        .filter(n > 0)
        .select(F.col(id_col), toks, F.posexplode(starts).alias("chunk_id", "_i"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("_i") * stride).cast("long").alias("start_token"),
            F.array_join(
                F.slice(toks, F.col("_i") * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(n - F.col("_i") * stride, F.lit(chunk_tokens))
            .cast("long")
            .alias("n_tokens"),
        )
    )


def assign_splits(
    docs: DataFrame,
    key_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent key
    hash — the split step of a training pipeline. md5(key) mod `buckets`
    lands each doc in a stable bucket (reproducible across runs, engines,
    and cluster sizes — no sample() RNG, no ordering dependence), and
    cumulative weight ranges map buckets to split names. Pure JVM
    expressions; adding a split later only moves docs at range boundaries."""
    total = sum(w for _, w in splits)
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w / total
        cond = h < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def repetition_stats(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals for quality filtering: duplicate
    token / line fractions and the duplicate / most-frequent bigram share.

    EVERYTHING is array-local — one narrow scan, zero shuffle, no join:
    token/line stats are size/array_distinct, and the bigram mode (the
    max per-(doc, bigram) count) folds over the SORTED bigram-HASH array
    as a longest-equal-run scan, so the per-doc explode → two-level
    aggregate → re-join the r2 version shuffled is gone entirely.
    O(s log s) long-sort + O(s) interpreted fold per document, nothing
    about corpus size anywhere — the string-bigram formulation of this
    same scan measured ~4× slower at sf0.1 (~6 s → ~1.5 s warm,
    noop-write materialization), and strictly better than r2's shape at
    100 TB: that moved every (doc_id, bigram) pair through a two-level
    shuffle plus a doc_id join; this cost is purely per-row.
    Fractions are null for degenerate docs (0 tokens / <2 tokens) rather
    than 0 — absent evidence, not clean evidence."""
    # arrays materialized in their own projection first (no CSE across
    # sibling project expressions — see functions/hashing.py). Bigrams
    # are the xxhash sliding-combine multiset, NOT strings: the mode
    # scan only needs equal-run counts, and sorting longs beats sorting
    # n short strings (measured ~35% off the whole query at sf0.1);
    # 64-bit collisions would merge two bigrams — odds ~n²/2⁶⁵ per doc.
    base = docs.select(
        F.col(id_col),
        T.tokens(F.col(text)).alias("_toks"),
        F.filter(F.split(F.col(text), r"\n"), lambda ln: ln != "").alias("_lines"),
        F.sort_array(hashing.shingle_hashes_all(T.tokens(F.col(text)), 2)).alias("_bgs"),
    ).select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("long").alias("_nd"),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size(F.array_distinct("_lines")).cast("long").alias("_ld"),
        F.size("_bgs").cast("long").alias("_bn"),
        F.size(F.array_distinct("_bgs")).cast("long").alias("_bd"),
        # longest equal run in the sorted array == max bigram count
        # (null prev never equals a hash → the first element starts a
        # fresh run through the otherwise branch)
        F.aggregate(
            "_bgs",
            F.struct(
                F.lit(None).cast("long").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("mx"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc.mx, F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
                ).alias("mx"),
            ),
            lambda acc: acc.mx,
        ).alias("_bmax"),
    )
    frac = lambda num, den: F.round(num / den.cast("double"), 6)
    return base.select(
        id_col,
        "n_tokens",
        F.when(F.col("n_tokens") > 0, frac(F.col("n_tokens") - F.col("_nd"), F.col("n_tokens"))).alias("dup_token_frac"),
        "n_lines",
        F.when(F.col("n_lines") > 0, frac(F.col("n_lines") - F.col("_ld"), F.col("n_lines"))).alias("dup_line_frac"),
        F.col("_bn").alias("n_bigrams"),
        F.when(F.col("_bn") > 0, frac(F.col("_bn") - F.col("_bd"), F.col("_bn"))).alias("dup_bigram_frac"),
        F.when(F.col("_bn") > 0, frac(F.col("_bmax"), F.col("_bn"))).alias("top_bigram_frac"),
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination audit: for each candidate document, the
    fraction of its DISTINCT word n-grams that also occur anywhere in a
    benchmark corpus — the standard pre-training decontamination check.

    The benchmark n-gram set is tiny relative to the corpus (eval suites,
    not training data), so it is deduplicated and broadcast. The candidate
    side is ONE scan: tokenize/shingle once, carry the per-doc gram count
    through the explode, broadcast LEFT join to mark hits, re-aggregate —
    the corpus text itself never shuffles, only (doc_id, count) partials.

    Both sides shingle on the 64-bit xxhash sliding combine, never gram
    STRINGS: the join key is 8 bytes instead of an n-word string (the
    string formulation measured ~2× slower end-to-end at sf0.1), at
    ~n²/2⁶⁵ collision odds per doc-benchmark pair."""
    bench_grams = benchmark.select(
        F.explode(hashing.shingle_hashes(T.tokens(F.col(text)), n)).alias("gram")
    ).distinct().withColumn("_hit", F.lit(1))
    ex = docs.select(
        F.col(id_col),
        hashing.shingle_hashes(T.tokens(F.col(text)), n).alias("_grams"),
    ).select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("n_grams"),
        F.explode_outer("_grams").alias("gram"),
    )
    return (
        ex.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_hits") / F.col("n_grams").cast("double"), 6),
            ).alias("contaminated_frac"),
        )
    )


def global_shuffle(docs: DataFrame, key_col: str = "doc_id", hex_digits: int = 2) -> DataFrame:
    """Deterministic global shuffle for training-data export: a stable,
    contiguous 0..N−1 ``shuffle_index`` in md5(key) order — reproducible
    across runs, engines, and cluster sizes (no RNG, no
    monotonically_increasing_id partition dependence).

    A naive row_number over a global ORDER BY is a single-partition window
    — dead at 100 TB. Instead the hash's first ``hex_digits`` chars bucket
    rows into 16^hex_digits groups whose string order is consistent with
    the global hash order (fixed-width lowercase hex), so: row_number
    within bucket (16^hex_digits-way parallel) + per-bucket offsets
    (cumsum over a 16^hex_digits-row aggregate, broadcast back). Raise
    hex_digits to 4 (65 536 buckets) at cluster scale."""
    h = F.md5(F.col(key_col).cast("string"))
    hashed = docs.select(F.col(key_col), h.alias("_h")).withColumn(
        "_b", F.conv(F.substring("_h", 1, hex_digits), 16, 10).cast("int")
    )
    ranked = hashed.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_b").orderBy("_h", key_col))
    )
    counts = hashed.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias("_off")
    )
    return ranked.join(F.broadcast(offsets), "_b").select(
        key_col, (F.col("_off") + F.col("_rn") - 1).cast("long").alias("shuffle_index")
    )


def pack_sequences(
    chunks: DataFrame,
    seq_tokens: int = 2048,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    hex_digits: int = 2,
) -> DataFrame:
    """Pack chunks into fixed-width training sequences by token offset:
    chunks are laid out as one continuous token stream in deterministic
    md5 order (shuffled, so adjacent chunks come from different docs) and
    chunk → sequence ``floor(stream_offset / seq_tokens)`` — the
    concat-then-window packing used for pre-training batches. Every
    sequence except the last holds exactly ``seq_tokens`` tokens once
    consumers split straddling chunks at the boundary (``seq_offset``
    says where the chunk starts inside its sequence).

    The global running token sum uses the same two-level trick as
    global_shuffle: exclusive cumsum within a hash bucket (parallel) +
    per-bucket token totals cumsum'd (16^hex_digits tiny rows) and
    broadcast back — no single-partition sort at 100 TB."""
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.col(chunk_col).cast("string")))
    hashed = chunks.select(
        F.col(id_col), F.col(chunk_col), F.col(tokens_col), h.alias("_h")
    ).withColumn("_b", F.conv(F.substring("_h", 1, hex_digits), 16, 10).cast("int"))
    w = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_bucket = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    totals = hashed.groupBy("_b").agg(F.sum(tokens_col).alias("_t"))
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select("_b", F.coalesce(F.sum("_t").over(off_w), F.lit(0)).alias("_off"))
    return (
        hashed.withColumn("_cum", in_bucket)
        .join(F.broadcast(offsets), "_b")
        .select(
            id_col,
            chunk_col,
            F.col(tokens_col).cast("long").alias(tokens_col),
            F.floor((F.col("_off") + F.col("_cum")) / seq_tokens).cast("long").alias("seq_id"),
            ((F.col("_off") + F.col("_cum")) % seq_tokens).cast("long").alias("seq_offset"),
        )
    )


def sample_stratified(
    docs: DataFrame,
    per_stratum: int,
    strata: tuple[str, ...] = ("source",),
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: AT MOST ``per_stratum`` docs
    per stratum, chosen by content-independent hash order — the "N
    examples per source/language for eval or annotation" step. Stable
    across runs, engines, partitionings, and corpus growth that only
    APPENDS to a stratum's tail (a doc already selected stays selected
    until its stratum accumulates per_stratum lower-hashed keys); no
    sample() RNG, no ordering dependence.

    One row_number window per stratum key — the shuffle is on the
    stratum columns; with many small strata AQE coalesces, with few
    huge strata the per-partition sort is the cost, bounded by the
    top-k semantics downstream. Hash = md5 of (seed, key) so different
    seeds draw different samples."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(h.asc(), F.col(key_col))
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_stratum)
        .drop("_rk")
    )


def length_percentile_trim(
    docs: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    strata: tuple[str, ...] = ("lang",),
    length_col: str = "n_chars",
) -> DataFrame:
    """Per-stratum length-percentile trim — drop each language's
    shortest/longest tails (truncation artifacts, boilerplate walls,
    concatenation monsters) by RANK, not by a fixed byte cutoff that
    misfits across languages. Keeps rows whose ``percent_rank`` over
    ``length_col`` within their stratum lies in [lo, hi]; returns the
    surviving rows plus the rank (``pr``) that kept them.

    percent_rank = (rank−1)/(n−1) — a universal SQL definition with
    deterministic tie handling (equal lengths share a rank), so the kept
    set is identical in any engine. One window per stratum key, shuffle
    on the strata columns — same posture as ``sample_stratified``; no
    percentile aggregate, no second pass."""
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(F.col(length_col))
    return (
        docs.withColumn("pr", F.percent_rank().over(w))
        .filter((F.col("pr") >= lo) & (F.col("pr") <= hi))
    )


def rebalance_sources(
    docs: DataFrame,
    target: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    buckets: int = 10_000,
) -> DataFrame:
    """Down-sample per-source so the surviving corpus matches a target mix
    (the domain-mixing step of a training pipeline, e.g. 60% web / 30%
    code / 10% academic). The largest feasible total is T = minₛ
    countₛ/targetₛ; each source keeps rate = targetₛ·T/countₛ of its docs
    (the binding source keeps 100%). Selection is the same deterministic
    md5-bucket Bernoulli as assign_splits — reproducible everywhere, and
    the kept set only shrinks monotonically as a source's rate falls.

    Source counts are one map-side-combined aggregate (|sources| rows);
    rates broadcast back, so the corpus scan never shuffles. Rate →
    integer bucket threshold (floor(rate·buckets)) keeps the kept-set
    decision integer-vs-integer."""
    if not target or abs(sum(target.values()) - 1.0) > 1e-9:
        raise ValueError("target fractions must sum to 1")
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    tmap = F.create_map(*[F.lit(x) for kv in target.items() for x in kv])
    rated = counts.withColumn("_p", tmap[F.col(source_col)]).filter(F.col("_p").isNotNull())
    feasible = rated.select(F.min(F.col("_n") / F.col("_p")).alias("_T"))
    thresholds = rated.crossJoin(F.broadcast(feasible)).select(
        source_col,
        F.floor(
            F.least(F.lit(1.0), F.col("_p") * F.col("_T") / F.col("_n")) * buckets
        ).cast("long").alias("_thr"),
    )
    b = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )
    return (
        docs.join(F.broadcast(thresholds), source_col)
        .filter(b < F.col("_thr"))
        .drop("_thr")
    )


# Patterns deliberately lookahead-free so the SAME regex runs on Java
# (Spark) and RE2 (DuckDB oracle) — same discipline as BPE_TOKEN_RE.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("longnum", r"[0-9]{9,}", "<NUM>"),
)


def scrub_pii(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Mask emails, URLs, and ≥9-digit runs (phone/account/card shaped)
    before training — returns the scrubbed text plus per-kind match counts
    for corpus-level leak auditing. Pure JVM regexp (one pass per
    pattern); counts computed on the ORIGINAL text so they survive
    masking order."""
    out = docs.select(F.col(id_col), F.col(text).alias("_t"))
    counts = [
        F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col("_t")
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return out.select(id_col, clean.alias("clean_text"), *counts)


def train_bigram_lm(
    docs: DataFrame, text: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train the interpolated-bigram LM tables once: ``(unigrams(term,
    c), bigrams(w1, w2, c12))`` — the per-release artifact the CCNet
    production cadence writes from a REFERENCE corpus (Wikipedia-grade
    text) and scores every crawl against (``bigram_logprob(model=)``).
    Totals (N, V) derive from the unigram table at read time."""
    toks = docs.select(T.tokens(F.lower(F.col(text))).alias("tk"))
    pairs = F.filter(
        F.zip_with(
            F.col("tk"),
            F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    uni = (
        toks.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    return uni, bi


def write_bigram_lm(docs: DataFrame, path: str, text: str = "text") -> None:
    """Persist the LM tables under ``path``/{unigrams,bigrams}."""
    uni, bi = train_bigram_lm(docs, text=text)
    uni.write.mode("overwrite").parquet(f"{path}/unigrams")
    bi.write.mode("overwrite").parquet(f"{path}/bigrams")


def read_bigram_lm(spark, path: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/unigrams"),
        spark.read.parquet(f"{path}/bigrams"),
    )


def bigram_logprob(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    lam: float = 0.8,
    model: tuple[DataFrame, DataFrame] | str | None = None,
) -> DataFrame:
    """Interpolated bigram LM quality signal — one rung up from
    ``unigram_logprob`` toward a KenLM perplexity filter: score each
    document by the mean negative log-probability of its tokens under a
    Jelinek-Mercer-interpolated bigram model trained on the corpus
    itself:

        p(w_i | w_{i-1}) = λ·c(w_{i-1}, w_i)/c_left(w_{i-1})
                           + (1−λ)·p_uni(w_i)

    with Lidstone unigram p_uni(w) = (c(w)+α)/(N+α·V); the first token
    of each document is scored by p_uni alone. Repetitive boilerplate
    scores low, off-distribution/gibberish text scores high.

    Plan shape: one tokenize, bigram pairs built array-locally
    (zip_with against the shifted token array — no self-join), per-doc
    (w1, w2, tf) partials map-side; the bigram model and its
    left-context totals are model-keyed aggregates the per-doc partials
    join back to (model sides are |bigram vocab| rows — AQE broadcasts
    at moderate vocab; co-partitioned hash join beyond). N/V ride a
    broadcast 1-row frame — no eager action anywhere. Docs with zero
    tokens drop, matching ``unigram_logprob``.

    ``model``: a ``(unigrams, bigrams)`` pair from ``train_bigram_lm``
    or the parquet artifact path from ``write_bigram_lm`` — the CCNet
    production cadence, where the LM trains ONCE on a reference corpus
    and every crawl scores against the read-back tables (the
    self-trained default is the calibration/test shape). The external
    path scores unseen unigrams at the Lidstone floor (c = 0) and
    unseen bigrams by the (1−λ)·p_uni backoff alone, so scores stay
    finite on out-of-vocabulary text."""
    # r13 note: every persist tried here (toks, bi_tf, uni_model) was
    # MEASURED SLOWER than the replicated-looking plan (doc_ccnet_buckets
    # 3.7 → 7-8 s): Spark's ReuseExchange already computes the repeated
    # model subtrees once at runtime, so a cache only adds columnar
    # materialization cost and blocks whole-stage pipelining. The plan
    # TEXT shows duplicate subtrees; the executed plan does not.
    toks = docs.select(
        F.col(id_col), T.tokens(F.lower(F.col(text))).alias("tk")
    )
    # per-position unigrams with an is-first marker (first token scores
    # under p_uni alone), plus the bigram pair list, all array-local
    pairs = F.filter(
        F.zip_with(
            F.col("tk"),
            F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    bi_tf = (
        toks.select(F.col(id_col), F.explode(pairs).alias("p"))
        .groupBy(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus models: bigram counts, left-context totals, unigram counts
    if model is not None:
        if isinstance(model, str):
            model = read_bigram_lm(docs.sparkSession, model)
        uni_model, bi_model = model
        uni_model = uni_model.select("term", "c")
        bi_model = bi_model.select("w1", "w2", "c12")
    else:
        bi_model = bi_tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
        uni_tf = (
            toks.select(F.col(id_col), F.explode("tk").alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("utf"))
        )
        uni_model = uni_tf.groupBy("term").agg(F.sum("utf").alias("c"))
    left_model = bi_model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    totals = uni_model.agg(F.sum("c").alias("_N"), F.count(F.lit(1)).alias("_V"))
    p_uni = (F.col("c") + F.lit(alpha)) / (
        F.col("_N") + F.lit(alpha) * F.col("_V")
    ).cast("double")

    # bigram positions: -log(λ·c12/c1 + (1−λ)·p_uni(w2)). Each distinct
    # bigram is scored ONCE on the vocab-sized model frames; the big
    # per-doc frame then joins that score table a single time — the
    # former shape pushed the doc-keyed frame through three joins
    # (model, left-context, unigram), 2× the wall time at sf0.1. Same
    # arithmetic per term (tf·(−log x) ≡ −tf·log x in IEEE).
    if model is not None:
        doc_bi = bi_tf.select("w1", "w2").distinct()
        score_bi = (
            doc_bi.join(bi_model, ["w1", "w2"], "left")
            .join(left_model, "w1", "left")
            .join(uni_model.select(F.col("term").alias("w2"), "c"), "w2", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "w1",
                "w2",
                (
                    -F.log(
                        F.lit(lam)
                        * F.coalesce(F.col("c12") / F.col("c1"), F.lit(0.0))
                        + F.lit(1.0 - lam)
                        * (
                            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                            / (F.col("_N") + F.lit(alpha) * F.col("_V")).cast("double")
                        )
                    )
                ).alias("_nlp"),
            )
        )
    else:
        score_bi = (
            bi_model.join(left_model, "w1")
            .join(uni_model.select(F.col("term").alias("w2"), "c"), "w2")
            .crossJoin(F.broadcast(totals))
            .select(
                "w1",
                "w2",
                (
                    -F.log(
                        F.lit(lam) * F.col("c12") / F.col("c1") + F.lit(1.0 - lam) * p_uni
                    )
                ).alias("_nlp"),
            )
        )
    bi_scored = (
        bi_tf.join(score_bi, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bi"),
            F.sum(F.col("tf") * F.col("_nlp")).alias("s_bi"),
        )
    )
    # first token of each doc: -log p_uni
    first_join = "left" if model is not None else "inner"
    first_scored = (
        toks.filter(F.size("tk") > 0)
        .select(F.col(id_col), F.element_at("tk", 1).alias("term"))
        .join(uni_model, "term", first_join)
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                    / (F.col("_N") + F.lit(alpha) * F.col("_V")).cast("double")
                )
            ).alias("s_first"),
        )
    )
    return (
        first_scored.join(bi_scored, id_col, "left")
        .select(
            F.col(id_col),
            (F.coalesce(F.col("n_bi"), F.lit(0)) + 1).cast("long").alias("n_tokens"),
            F.round(
                (F.col("s_first") + F.coalesce(F.col("s_bi"), F.lit(0.0)))
                / (F.coalesce(F.col("n_bi"), F.lit(0)) + 1),
                6,
            ).alias("mean_neg_logprob"),
        )
    )


# Fixed, deterministic weights for the logistic quality classifier — the
# oracle-checkable stand-in for a trained fastText/DSIR-style quality
# model (the container has no trained artifacts; a real deployment swaps
# these for learned coefficients without touching the plan shape).
QC_BIAS = -1.0
QC_WEIGHTS = (
    ("len_log", 0.9),        # log1p(chars), saturating length prior
    ("mean_tok_len", 0.25),  # very short/very long tokens → gibberish
    ("stopword_ratio", 4.0), # function words → natural prose
    ("punct_ratio", -6.0),   # punctuation soup → markup/boilerplate
    ("digit_frac", -3.0),    # digit-heavy → tables/serials
    ("upper_frac", -2.0),    # SHOUTING / header dumps
)


def quality_classifier(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Logistic quality classifier over cheap JVM-side features:
    p(keep) = sigmoid(b + Σ wᵢ·xᵢ) with the fixed ``QC_WEIGHTS`` above.
    Returns (id, the 6 features, quality_prob, keep) — filter on ``keep``
    or rank on ``quality_prob``; the standard corpus-quality gate shape
    (CCNet / Gopher rules → one score → threshold).

    One narrow scan, zero shuffle, zero UDF — every feature is a builtin
    expression, so the whole row pipeline stays in WholeStageCodegen."""
    t = F.col(text)
    n_chars = F.length(t).cast("double")
    feats = {
        "len_log": F.log1p(n_chars),
        "mean_tok_len": T.mean_token_len(t),
        "stopword_ratio": T.stopword_ratio(t),
        "punct_ratio": T.punct_ratio(t),
        "digit_frac": F.when(
            n_chars > 0,
            F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double") / n_chars,
        ).otherwise(F.lit(0.0)),
        "upper_frac": F.when(
            n_chars > 0,
            F.length(F.regexp_replace(t, "[^A-Z]", "")).cast("double") / n_chars,
        ).otherwise(F.lit(0.0)),
    }
    base = docs.select(
        F.col(id_col), *[v.alias(k) for k, v in feats.items()]
    )
    z = F.lit(QC_BIAS)
    for name, w in QC_WEIGHTS:
        z = z + F.lit(w) * F.col(name)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    out = base.select(
        F.col(id_col),
        *[F.round(F.col(k), 6).alias(k) for k, _ in QC_WEIGHTS],
        prob.alias("quality_prob"),
    )
    return out.withColumn("keep", F.col("quality_prob") >= F.lit(threshold))


def _bounded_exclusive_prefix(
    per_key: DataFrame,
    key: str,
    val: str,
    out: str,
    descending: bool = False,
    coarse: float = 16.0,
) -> DataFrame:
    """Exact exclusive prefix sum of ``val`` over rows ordered by ``key``
    (distinct numeric keys), with a structurally bounded single-task
    frame — the two-level coarse-bucket cumsum. The r6 decomposition ran
    one unpartitioned running-sum window over the distinct-score frame;
    that frame is small in practice (6-dp rounding) but its size is
    data-dependent. Here the only unpartitioned window consumes the
    per-COARSE-BUCKET totals, where bucket = floor(key·coarse) — a pure
    deterministic expression, so unlike the repartitionByRange
    formulation (tried first) there is no sampling pass re-reading the
    upstream, no spark_partition_id cross-branch consistency question,
    and no persist: the whole thing is one extra bounded aggregate
    (measured: the range form cost the ccnet gate 2.4→4.8 s; this form
    is within noise of the unbounded r6 original while keeping the
    bound).

    The bucket-count bound: quality_prob-style [0,1] scores give
    ≤ coarse+1 buckets outright; mean-neg-logprob scores are bounded by
    the Lidstone floor at ln((N+αV)/α) — logarithmic in corpus size, so
    ≤ ~40·coarse buckets even at 10¹³ tokens. Either way the
    unpartitioned window input is provably tiny regardless of how many
    DISTINCT scores exist (the r6 concern).

    1. bucket totals (≤ buckets rows, map-side partials) → exclusive
       bucket offsets via the one unpartitioned window;
    2. within-bucket exclusive running sum, partitioned BY bucket
       (parallel — and bucket order IS key order, floor is monotone);
    3. broadcast-join the offsets back: prefix = offset + local.

    Returns ``(key, out)`` where ``out`` is the sum of ``val`` over all
    keys strictly before ``key`` in the requested order."""
    sign = -1.0 if descending else 1.0
    keyed = per_key.withColumn(
        "_pid", F.floor(F.col(key) * F.lit(sign * coarse)).cast("long")
    )
    order = F.col(key).desc() if descending else F.col(key).asc()
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        keyed.groupBy("_pid")
        .agg(F.sum(val).alias("_pt"))
        .select("_pid", (F.sum("_pt").over(woff) - F.col("_pt")).alias("_poff"))
    )
    wloc = Window.partitionBy("_pid").orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        keyed.withColumn("_loc", F.sum(val).over(wloc) - F.col(val))
        .join(F.broadcast(offsets), "_pid")
        .select(key, (F.col("_poff") + F.col("_loc")).alias(out))
    )


def perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    lam: float = 0.8,
    model: tuple[DataFrame, DataFrame] | str | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    corpus into equal-population quality tiers by language-model score —
    bucket 1 ("head") is the lowest mean negative log-probability (most
    fluent), the last bucket ("tail") the highest. CCNet keeps head+middle
    for LM pretraining and routes tail to re-filtering. The LM is the
    corpus-trained interpolated bigram model of ``bigram_logprob``.

    Exact NTILE semantics WITHOUT a global single-partition window: a
    global ``F.ntile().over(Window.orderBy(...))`` funnels the whole
    corpus through ONE task. Instead the global rank is decomposed as
    rank = (docs with strictly smaller rounded score) + (row_number
    within my score by id): the first term is an exclusive prefix sum of
    the per-score counts via ``_bounded_exclusive_prefix`` (the only
    unpartitioned window consumes ≤64 per-range-partition totals —
    structurally bounded no matter how many distinct scores exist), the
    second a window partitioned BY score (parallel over scores). The
    ntile bucket is then pure arithmetic on (rank, n), reproducing SQL
    NTILE's first-buckets-get-the-remainder rule, so any engine's
    ntile() is the oracle."""
    from pyspark.sql import Window

    scored = bigram_logprob(
        docs, text=text, id_col=id_col, alpha=alpha, lam=lam, model=model
    )
    # per-score population, exclusive prefix over the ordered distinct scores
    per_score = scored.groupBy("mean_neg_logprob").agg(F.count(F.lit(1)).alias("_c"))
    base = _bounded_exclusive_prefix(per_score, "mean_neg_logprob", "_c", "_base")
    n_total = scored.agg(F.count(F.lit(1)).alias("_n"))
    within = F.row_number().over(
        Window.partitionBy("mean_neg_logprob").orderBy(id_col)
    )
    ranked = (
        scored.withColumn("_rw", within)
        .join(base, "mean_neg_logprob")
        .crossJoin(F.broadcast(n_total))
        .withColumn("_rank", F.col("_base") + F.col("_rw"))
    )
    k = F.lit(n_buckets)
    small = (F.col("_n") / k).cast("long")  # floor
    extra = F.col("_n") % k
    cut = extra * (small + 1)  # rows living in the size-(small+1) buckets
    bucket = F.when(
        F.col("_rank") <= cut, ((F.col("_rank") - 1) / (small + 1)).cast("long") + 1
    ).otherwise(extra + ((F.col("_rank") - 1 - cut) / small).cast("long") + 1)
    label = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        ranked.withColumn("bucket", bucket.cast("int"))
        .withColumn("bucket_label", label)
        .select(id_col, "n_tokens", "mean_neg_logprob", "bucket", "bucket_label")
    )


def mixture_plan(
    docs: DataFrame,
    target_weights: dict[str, float] | None = None,
    text: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Data-mixture recipe: per-source token accounting and the
    sampling weight that reshapes the natural corpus mixture into a
    target mixture (the Pile/DoReMi-style "data recipe" step that
    precedes packing). For each source: document and token counts, its
    natural token share, the target share (uniform across sources when
    ``target_weights`` is None, else the normalized given weights), and
    ``mix_weight`` = target/natural — the per-source sampling rate
    multiplier (>1 ⇒ upsample/repeat epochs, <1 ⇒ downsample).

    Scale shape: token counts are a pure-expression projection (no
    tokenizer UDF — ``token_count`` is one regexp scan) feeding a
    source-keyed aggregate with map-side partials; the corpus total and
    the weight-normalization constant ride broadcast one-row frames.
    |sources| is dashboard-sized, so everything after the first
    aggregate is negligible."""
    per_src = docs.select(
        F.col(source_col).alias("source"), T.token_count(F.col(text)).alias("_t")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("_t").alias("n_tokens")
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("_tot"), F.count(F.lit(1)).alias("_nsrc")
    )
    base = per_src.crossJoin(F.broadcast(totals))
    if target_weights is None:
        tgt = F.lit(1.0) / F.col("_nsrc")
    else:
        wsum = float(sum(target_weights.values()))
        m = F.create_map(
            *[F.lit(x) for kv in target_weights.items() for x in (kv[0], kv[1] / wsum)]
        )
        tgt = F.coalesce(m[F.col("source")], F.lit(0.0))
    natural = F.col("n_tokens").cast("double") / F.col("_tot")
    return base.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(natural, 6).alias("natural_share"),
        F.round(tgt, 6).alias("target_share"),
        # ANSI guard: a zero-token source has no natural share to invert
        F.round(F.when(F.col("n_tokens") > 0, tgt / natural), 6).alias("mix_weight"),
    )


def corpus_report(
    docs: DataFrame, text: str = "text", source_col: str = "source", label: str = "lang"
) -> DataFrame:
    """Per-source corpus report card — the monitoring rollup a curation
    pipeline publishes after every crawl/merge: document and token
    volume, mean heuristic quality, language-ID agreement with the
    declared label, and the exact-duplicate rate (share of docs whose
    md5 text fingerprint occurs more than once CORPUS-wide, so
    cross-source duplication is charged to every source holding a
    copy).

    One doc-level projection computes tokens/quality/lang/fingerprint
    in a single narrow scan (the ``_with_lang_pred`` layering); the dup
    flag needs the only extra exchange — a fingerprint-keyed window
    count whose partitions are duplicate groups (bounded); the final
    per-source aggregate is map-side partial. Linear, two shuffles,
    no text movement after the scan."""
    from pyspark.sql import Window

    base = _with_lang_pred(
        docs,
        text,
        [
            F.col(source_col).alias("source"),
            F.col(label).alias("_lang_true"),
            T.token_count(F.col(text)).alias("_ntok"),
            F.round(T.quality_score(F.col(text)), 6).alias("_q"),
            T.fingerprint64(F.col(text)).alias("_fp"),
        ],
    )
    dup = F.count(F.lit(1)).over(Window.partitionBy("_fp")) > 1
    flagged = base.withColumn("_dup", dup.cast("int"))
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ntok").alias("n_tokens"),
        F.round(F.avg("_q"), 6).alias("mean_quality"),
        F.round(
            F.avg((F.col("lang_pred") == F.col("_lang_true")).cast("double")), 6
        ).alias("lang_match_rate"),
        F.round(F.avg(F.col("_dup").cast("double")), 6).alias("dup_rate"),
    )


def ngram_diversity(
    docs: DataFrame, max_n: int = 3, text: str = "text", source_col: str = "source"
) -> DataFrame:
    """Distinct-n-gram diversity per source (the corpus-level half of
    Self-BLEU-style diversity monitoring; low ratios flag boilerplate or
    synthetic-data mode collapse): for n = 1..max_n, distinct word
    n-grams over total n-grams, per source.

    All n sizes are built array-locally from ONE token array in one
    scan (space-joined slices — no self-join, no re-tokenize per n),
    then a (source, n, gram) partial count reduces map-side before the
    (source, n) rollup: shuffle volume is the distinct-gram vocabulary,
    never the corpus."""
    toks = docs.select(
        F.col(source_col).alias("source"), T.tokens(F.col(text)).alias("_tk")
    )
    def _grams(n: int):
        # closure, NOT a default arg: transform() passes the element
        # index as a second lambda parameter when the callable is
        # binary, so `lambda i, n=n:` silently rebinds n to the index
        return F.when(F.size("_tk") >= n, F.transform(
            F.sequence(F.lit(1), F.size("_tk") - n + 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), i, n)),
        )).otherwise(F.array().cast("array<string>"))

    per_n = [
        F.struct(F.lit(n).alias("n"), _grams(n).alias("grams"))
        for n in range(1, max_n + 1)
    ]
    return (
        toks.select("source", F.explode(F.array(*per_n)).alias("ng"))
        .select("source", F.col("ng.n").alias("n"), F.explode("ng.grams").alias("gram"))
        .groupBy("source", "n", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("distinct_grams"),
            F.sum("_c").alias("total_grams"),
        )
        .withColumn(
            "diversity", F.round(F.col("distinct_grams") / F.col("total_grams"), 6)
        )
    )


def oov_rates(
    docs: DataFrame,
    vocab_k: int = 1000,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus's own top-K
    frequency vocabulary (lowercased) — the tokenizer-coverage signal a
    pipeline checks before committing to a vocab size: docs with high
    OOV either carry rare-domain text worth keeping or junk worth
    dropping; either way they need eyes.

    The top-K vocab is a term-count aggregate + one K-row top-k
    (TakeOrderedAndProject — K rows to the driver side of the plan,
    broadcast back); per-doc OOV is then an array-local count against
    the broadcast vocab array — the doc tokens never shuffle at all.
    Ties at the K boundary break by term for determinism.

    The membership probe is a linear scan of the K-array per token —
    O(corpus · K), shuffle-free; right for dashboard-sized K (10³-10⁴).
    For a 10⁵+ vocab, switch to explode → broadcast-hash anti-join →
    per-doc count: the hash probe is O(1)/token at the cost of one
    doc-keyed re-aggregation shuffle."""
    lt = docs.select(
        F.col(id_col),
        F.transform(T.tokens(F.col(text)), lambda t: F.lower(t)).alias("_tk"),
    )
    counts = (
        lt.select(F.explode("_tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # TakeOrderedAndProject: every partition keeps its own top-K, the
    # driver merges K rows — no single-partition window over the vocab
    topk = counts.orderBy(F.desc("_c"), F.col("term")).limit(vocab_k)
    vocab = topk.agg(F.array_sort(F.collect_list("term")).alias("_vocab"))
    return (
        lt.crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.size("_tk").cast("long").alias("n_tokens"),
            F.size(F.filter("_tk", lambda t: ~F.array_contains(F.col("_vocab"), t)))
            .cast("long")
            .alias("n_oov"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("oov_rate", F.round(F.col("n_oov") / F.col("n_tokens"), 6))
    )


def budget_selection(
    docs: DataFrame,
    token_budget: int,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked token-budget selection: walk the corpus from the
    highest classifier-quality document down and keep documents until
    the cumulative token count exceeds ``token_budget`` — the "best N
    tokens" cut every fixed-compute pretraining run makes. Returns
    every doc with ``(quality_prob, n_tokens, cum_tokens, selected)``;
    a doc is selected iff the running total THROUGH it stays within
    budget — a pure prefix cut: cum_tokens is monotone, so once one doc
    overruns the budget nothing after it is selected either (no
    skip-and-continue backfill, no partial docs).

    Global prefix-sum WITHOUT a single-partition window, the
    ``perplexity_buckets`` decomposition: per-score token totals
    aggregate map-side; their exclusive prefix comes from
    ``_bounded_exclusive_prefix`` (the only unpartitioned window
    consumes ≤64 per-range-partition totals — structurally bounded);
    within a score the cum-sum window partitions BY score. The corpus
    never funnels through one task."""
    from pyspark.sql import Window

    scored = quality_classifier(docs, text=text, id_col=id_col).select(
        F.col(id_col), "quality_prob"
    )
    toks = docs.select(F.col(id_col), T.token_count(F.col(text)).cast("long").alias("n_tokens"))
    base = scored.join(toks, id_col)
    per_score = base.groupBy("quality_prob").agg(F.sum("n_tokens").alias("_st"))
    prior = _bounded_exclusive_prefix(
        per_score, "quality_prob", "_st", "_prior", descending=True
    )
    win = (
        Window.partitionBy("quality_prob")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(prior, "quality_prob")
        .withColumn("cum_tokens", F.col("_prior") + F.sum("n_tokens").over(win))
        .select(
            F.col(id_col),
            "quality_prob",
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") <= F.lit(int(token_budget))).alias("selected"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame, text: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word — the classic multilingual-tokenizer equity check
    (high-fertility languages pay more sequence length for the same
    content; >2 flags a vocabulary that underserves the language).
    Corpus fertility is the token-weighted ratio (sum/sum); the per-doc
    mean is reported alongside because the two diverge when long docs
    tokenize differently from short ones. One narrow scan, two regexp
    passes per row, one |langs|-sized aggregate — nothing shuffles but
    the partials."""
    base = docs.select(
        F.col(lang_col).alias("lang"),
        T.token_count(F.col(text)).cast("long").alias("_w"),
        T.bpe_token_count(F.col(text)).cast("long").alias("_b"),
    )
    per_doc = F.when(F.col("_w") > 0, F.col("_b") / F.col("_w"))
    return (
        base.withColumn("_r", per_doc)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_b").alias("n_bpe_tokens"),
            # ANSI guard: a language whose docs are all empty has 0 words
            F.round(
                F.when(F.sum("_w") > 0, F.sum("_b") / F.sum("_w")), 6
            ).alias("fertility"),
            F.round(F.avg("_r"), 6).alias("mean_doc_fertility"),
        )
    )


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information: bigrams whose
    joint frequency beats what their unigram frequencies predict —
    PMI = ln(c12·N / (c1·c2)) — the classic phrase/term-of-art extractor
    a corpus-analysis pass runs to build tokenizer merge candidates and
    domain lexicons. ``min_count`` floors the joint count (PMI explodes
    on hapax pairs); ties break on the bigram for determinism.

    One tokenize; bigrams built array-locally (the ``bigram_logprob``
    shifted-zip shape, no self-join); the unigram and bigram models are
    vocabulary-sized aggregates joined on their terms; N rides a
    broadcast one-row frame; the final top-k is TakeOrderedAndProject.
    Shuffle volume is the vocabulary, never the corpus."""
    # r13: persists tried here measured slower (ReuseExchange — see
    # bigram_logprob's note)
    toks = docs.select(T.tokens(F.lower(F.col(text))).alias("tk"))
    pairs = F.filter(
        F.zip_with(
            F.col("tk"),
            F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    bi = (
        toks.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    uni = (
        toks.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").alias("_N"))
    return (
        bi.join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(F.col("c12") * F.col("_N") / (F.col("c1") * F.col("c2"))), 6
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )


def related_terms(
    docs: DataFrame,
    target: str,
    window: int = 5,
    k: int = 20,
    min_count: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Windowed co-occurrence PMI around a target term — the "related
    searches"/lexicon-expansion extractor: terms appearing within
    ±``window`` tokens of an occurrence of ``target`` more often than
    their corpus frequency predicts, scored ln((c/C_win)/(c_corpus/N)).
    Overlapping windows double-count by construction (a term near two
    target occurrences IS twice as associated); the target itself is
    excluded. Returns top-``k`` ``(term, n_cooc, n_corpus, pmi)``, ties
    on term; ``min_count`` floors the co-occurrence count (PMI explodes
    on hapax neighbors, the collocations_pmi discipline).

    Array-local windows: target positions via a sequence filter, each
    position's neighborhood a clamped slice, flattened — no positional
    self-join, no corpus-sized shuffle; the aggregates are
    vocabulary-sized and the totals ride 1-row broadcasts."""
    tgt = target.lower()
    w = int(window)
    # two consumers (co-occurrence lane, corpus unigram lane) share one
    # tokenize via persist — the qld_topk discipline (private: the
    # tokenized frame derives from a path read, r13 hazard class)
    from epicsarchiver_spark.operators.dedup import private_persist

    toks = private_persist(
        docs.select(T.tokens(F.lower(F.coalesce(F.col(text), F.lit("")))).alias("tk"))
    )
    n = F.size("tk")
    # empty/whitespace docs tokenize to [] → sequence(1, 0) descends and
    # element_at(_, 0) throws; one such doc anywhere kills the whole scan
    pos = F.when(
        n > 0,
        F.filter(
            F.sequence(F.lit(1), n), lambda i: F.element_at("tk", i) == F.lit(tgt)
        ),
    ).otherwise(F.array().cast("array<int>"))
    neigh = F.flatten(
        F.transform(
            pos,
            lambda p: F.slice(
                F.col("tk"),
                F.greatest(p - F.lit(w), F.lit(1)),
                F.least(p + F.lit(w), n) - F.greatest(p - F.lit(w), F.lit(1)) + F.lit(1),
            ),
        )
    )
    cooc = (
        toks.filter(F.size(pos) > 0)
        .select(F.explode(neigh).alias("term"))
        .filter(F.col("term") != tgt)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .filter(F.col("n_cooc") >= int(min_count))
    )
    cwin = cooc.agg(F.coalesce(F.sum("n_cooc"), F.lit(0)).cast("long").alias("_cw"))
    uni = (
        toks.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_corpus"))
    )
    n_total = uni.agg(F.sum("n_corpus").cast("long").alias("_N"))
    out = (
        cooc.join(uni, "term")
        .crossJoin(F.broadcast(cwin))
        .crossJoin(F.broadcast(n_total))
        .select(
            "term",
            F.col("n_cooc").cast("long").alias("n_cooc"),
            F.col("n_corpus").cast("long").alias("n_corpus"),
            F.round(
                F.log(
                    (F.col("n_cooc") / F.col("_cw"))
                    / (F.col("n_corpus") / F.col("_N"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "term")
        .limit(int(k))
    )
    # k rows: eager-checkpoint + release the token projection (the
    # cell_quality discipline) — no cache leak per call
    out = out.localCheckpoint(eager=True)
    toks.unpersist()
    return out


def rake_keyphrases(
    docs: DataFrame,
    k: int = 20,
    max_phrase_len: int = 4,
    min_count: int = 1,
    stopwords: tuple[str, ...] | None = None,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level RAKE keyphrase extraction (Rose et al. 2010) — the
    unsupervised keyword miner for corpus triage and taxonomy seeding:
    candidate phrases are maximal stopword-free token runs (≤
    ``max_phrase_len`` tokens), each word scores degree/frequency over
    all candidate instances (degree = Σ length of phrases it appears
    in — words that live in long multi-word terms outrank ubiquitous
    singletons), and a phrase scores the sum of its words. Returns
    top-``k`` ``(phrase, n, score)`` by (score desc, phrase), ``n`` =
    corpus instance count, floored at ``min_count``.

    Determinism: word scores quantize to integer micro-units via the
    same IEEE expression in any engine (floor(deg·1e6/freq + 0.5)), so
    phrase scores are exact integer sums — order-free — divided once
    at the edge (gate ``doc_rake_keyphrases``).

    Scale shape: one posexplode + a doc-keyed running-count window
    (the phrase segmentation — shuffle = token stream, once), then
    vocabulary- and phrase-sized aggregates; top-k is
    TakeOrderedAndProject."""
    stop = sorted(stopwords if stopwords is not None else T.LANG_STOPWORDS["en"])
    toks = T.tokens(F.lower(F.coalesce(F.col(text), F.lit(""))))
    flat = docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    is_stop = F.col("tok").isin(*stop)
    w = Window.partitionBy(id_col).orderBy("pos")
    inst = (
        flat.withColumn("_gid", F.sum(is_stop.cast("int")).over(w))
        .filter(~is_stop)
        .groupBy(id_col, "_gid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("_plen"),
        )
        .filter(F.col("_plen") <= int(max_phrase_len))
    )
    wstats = (
        inst.select(F.explode(F.split("phrase", " ")).alias("wtok"), "_plen")
        .groupBy("wtok")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("_plen").alias("deg"))
    )
    # integer micro-unit word score: identical IEEE ops in any engine,
    # then phrase score is an EXACT integer sum (float Σ would be
    # partition-order-dependent)
    score_u = F.floor(F.col("deg") * F.lit(1e6) / F.col("freq") + F.lit(0.5)).cast(
        "long"
    )
    dist = inst.groupBy("phrase").agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        dist.select("phrase", "n", F.explode(F.split("phrase", " ")).alias("wtok"))
        .join(wstats, "wtok")
        .groupBy("phrase", "n")
        .agg(F.sum(score_u).alias("_su"))
    )
    return (
        scored.filter(F.col("n") >= int(min_count))
        .select("phrase", "n", (F.col("_su").cast("double") / F.lit(1e6)).alias("score"))
        .orderBy(F.desc("score"), "phrase")
        .limit(int(k))
    )


def hapax_zipf(
    docs: DataFrame,
    top_k: int = 100,
    text: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source lexical-distribution fingerprint: distinct-term count,
    hapax share (fraction of the vocabulary occurring exactly once —
    high hapax = rich/noisy text, near-zero = template spam), and the
    Zipf slope — the OLS slope of ln(frequency) on ln(rank) over the
    ``top_k`` most frequent terms (natural language sits near −1;
    boilerplate and generated text flatten it). The corpus-health
    companion to ``ngram_diversity``.

    Scale shape: one (source, term) count aggregate (map-side combine
    collapses repeats before the shuffle — vocabulary-sized, never
    corpus-sized), a source-partitioned rank window over the SAME
    aggregate, and two tiny per-source reductions. The OLS slope is
    computed from the moment sums (Σx, Σy, Σxy, Σxx over ≤ top_k rows
    per source) so no second pass and no fit library:
    slope = (Σxy − ΣxΣy/n) / (Σxx − (Σx)²/n). Ranks break ties by term
    so the top-k set — and therefore the slope — is engine-identical."""
    terms = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(T.tokens(F.lower(F.col(text)))).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    vocab = terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.avg((F.col("_c") == 1).cast("double")), 6).alias("hapax_share"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("_c"), "term")
    )
    top = terms.withColumn("_rk", rk).filter(F.col("_rk") <= top_k)
    x = F.log(F.col("_rk").cast("double"))
    y = F.log(F.col("_c").cast("double"))
    fit = (
        top.select("source", x.alias("_x"), y.alias("_y"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        )
        .select(
            "source",
            # ANSI guard: a source whose top-k collapses to one rank (a
            # single distinct term) has zero x-variance — slope is
            # undefined (null), not a DIVIDE_BY_ZERO stage failure
            F.when(
                F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_n") != 0,
                F.round(
                    (F.col("_sxy") - F.col("_sx") * F.col("_sy") / F.col("_n"))
                    / (F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_n")),
                    6,
                ),
            ).alias("zipf_slope"),
        )
    )
    return vocab.join(fit, "source")


# marker unlikely to occur in any document; both engines emit the same
# single code point so group counting is a pure length difference
_SEG_MARK = "\x01"


def readability(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Flesch reading-ease estimate from pure expression
    counts: words (whitespace tokens), sentences (runs of ``.!?`` —
    floored at 1 so unpunctuated text is scored as one sentence rather
    than dropped), and a syllable proxy (vowel-group runs, the standard
    dictionary-free approximation). flesch = 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words); null when a doc has no words.
    One narrow scan, three regexp passes per row, zero shuffle — the
    quality family's cheapest signal and a classic curation feature
    (very low scores flag tables/code/garbled text)."""

    def _groups(col, pattern):
        marked = F.regexp_replace(col, pattern, _SEG_MARK)
        return (
            F.length(marked) - F.length(F.regexp_replace(marked, _SEG_MARK, ""))
        ).cast("long")

    t = F.col(text)
    counts = docs.select(
        F.col(id_col),
        T.token_count(t).cast("long").alias("n_words"),
        F.greatest(_groups(t, r"[.!?]+"), F.lit(1).cast("long")).alias("n_sentences"),
        _groups(F.lower(t), r"[aeiouy]+").alias("n_syllables"),
    )
    w, s, y = (F.col(c).cast("double") for c in ("n_words", "n_sentences", "n_syllables"))
    return counts.withColumn(
        "flesch",
        F.when(
            F.col("n_words") > 0,
            F.round(F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w), 6),
        ),
    )


def nb_label_audit(
    docs: DataFrame,
    label_col: str = "source",
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Multinomial Naive Bayes trained on the corpus's own labels and
    applied back — the closed-form in-engine CLASSIFIER (counts →
    smoothed log-likelihoods, no gradient loop): each document gets the
    argmax class under

        score(d, c) = ln(docs_c / N) + Σ_t tf(t,d) · ln((cnt_{c,t} + α)
                                                        / (n_c + α·V))

    with Lidstone smoothing over the union vocabulary. Returns
    ``(id, label, predicted, score, agree)`` — disagreements are the
    mislabeled / mixed-domain candidates, the text-side twin of
    ``similarity.knn_labels`` (and the K-class generalization of
    ``dsir_scores``' two-model log-ratio). Train-once/score-crawls
    splits the same way as the bigram-LM lane: persist the (class,
    term) count table and rejoin.

    Plan shape (the ``dsir_scores`` discipline): class models are
    vocab-sized aggregates; the per-(class, term) weight table builds
    once (V×K rows — vocabulary × a handful of classes); the per-doc tf
    frame joins it a single time; priors/V ride broadcast frames; the
    argmax is a doc-keyed K-row window. Scores are 6-dp-rounded before
    the argmax so the tie order is engine-exact."""
    d_toks = docs.select(
        F.col(id_col),
        F.col(label_col).alias("_lbl"),
        F.explode(T.tokens(F.lower(F.col(text)))).alias("term"),
    )
    # r13: persists tried here (tf, cls_counts) measured slower —
    # ReuseExchange already dedupes the repeated subtrees at runtime
    tf = d_toks.groupBy(id_col, "_lbl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    cls_counts = tf.groupBy(F.col("_lbl").alias("_cls"), "term").agg(
        F.sum("tf").alias("c")
    )
    classes = cls_counts.groupBy("_cls").agg(F.sum("c").alias("n_c"))
    vocab = cls_counts.select("term").distinct()
    v_tot = vocab.agg(F.count(F.lit(1)).alias("V"))
    priors = (
        docs.groupBy(F.col(label_col).alias("_cls"))
        .agg(F.count(F.lit(1)).alias("_nd"))
        .crossJoin(F.broadcast(docs.select(F.count(F.lit(1)).alias("_N"))))
        .select("_cls", F.log(F.col("_nd") / F.col("_N")).alias("_prior"))
    )
    a = float(alpha)
    weights = (
        vocab.crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(v_tot))
        .join(cls_counts, ["_cls", "term"], "left")
        .select(
            "term",
            "_cls",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(a))
                / (F.col("n_c") + F.lit(a) * F.col("V"))
            ).alias("_w"),
        )
    )
    scored = (
        tf.join(weights, "term")
        .groupBy(id_col, "_lbl", "_cls")
        .agg(F.sum(F.col("tf") * F.col("_w")).alias("_ll"))
        .join(F.broadcast(priors), "_cls")
        .select(
            F.col(id_col),
            "_lbl",
            "_cls",
            F.round(F.col("_ll") + F.col("_prior"), 6).alias("_score"),
        )
    )
    w_best = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.col("_cls")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("_lbl").alias("label"),
            F.col("_cls").alias("predicted"),
            F.col("_score").alias("score"),
            (F.col("_cls") == F.col("_lbl")).alias("agree"),
        )
    )


def boilerplate_segments(
    docs: DataFrame,
    sep: str = "\n",
    seg_words: int | None = None,
    stopwords: tuple[str, ...] | None = None,
    min_words: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """jusText/trafilatura-style line-level boilerplate scoring — the
    main-content extraction step of a curation pipeline: split each
    document into segments, score every segment by stopword density
    and link density, and label it ``short`` / ``boilerplate`` /
    ``good`` (jusText's core insight: real prose is stopword-dense;
    navigation, headers, footers and link farms are not — Pomikálek
    2011). Returns long-form ``(id, seg, n_words, n_stop, n_links,
    label)``; keep ``label = 'good'`` and re-join to reassemble the
    main content.

    Segmentation: by ``sep`` (lines/paragraphs — the jusText block
    unit) or, for stream-of-words corpora with no line structure, by
    fixed ``seg_words``-word windows (``seg_words=`` overrides
    ``sep``). Classification is integer cross-multiplied — no float
    ratio ever forms: a segment is ``short`` below ``min_words``,
    ``boilerplate`` when links exceed a fifth of its words
    (``n_links·5 > n_words``) or stopwords fall under an eighth
    (``n_stop·8 < n_words``), else ``good``.

    Scale shape: one narrow scan — split, per-segment counts and the
    CASE are all array-local builtins in WholeStageCodegen; the
    explode multiplies rows by segments-per-doc only. Zero shuffle,
    zero UDF, nothing corpus-sized anywhere."""
    import re as _re

    stop = (
        sorted(stopwords)
        if stopwords is not None
        else sorted(T.LANG_STOPWORDS["en"])
    )
    stop_arr = F.array(*[F.lit(w) for w in stop])
    if seg_words is not None:
        toks = T.tokens(F.col(text))
        sw = int(seg_words)
        segs = F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.size(toks) / F.lit(sw)).cast("int") - 1
                ),
                lambda i: F.slice(toks, i * sw + 1, sw),
            ),
        ).otherwise(F.array().cast("array<array<string>>"))
    else:
        segs = F.transform(
            F.filter(F.split(F.col(text), _re.escape(sep)), lambda s: s != ""),
            lambda s: T.tokens(s),
        )
    exploded = docs.select(F.col(id_col), F.posexplode(segs).alias("seg", "_w"))
    counted = exploded.select(
        F.col(id_col),
        F.col("seg").cast("long").alias("seg"),
        F.size("_w").cast("long").alias("n_words"),
        F.size(F.filter("_w", lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
        F.size(F.filter("_w", lambda x: x.rlike(r"^(https?://|www\.)")))
        .cast("long")
        .alias("n_links"),
    )
    label = (
        F.when(F.col("n_words") < int(min_words), F.lit("short"))
        .when(F.col("n_links") * 5 > F.col("n_words"), F.lit("boilerplate"))
        .when(F.col("n_stop") * 8 < F.col("n_words"), F.lit("boilerplate"))
        .otherwise(F.lit("good"))
    )
    return counted.select("*", label.alias("label"))


# Encoding-damage signatures, shared with the DuckDB oracle so both
# engines compile the IDENTICAL pattern (literal char classes work on
# Java regex and RE2 alike): U+FFFD; the C1 block UTF-8-bytes-as-
# Latin-1 lands in; UTF-8-as-Latin-1/cp1252 digraph leads ('Ã' +
# continuation, the 'â€¦'-family prefix, 'Â' + double-decoded NBSP
# block).
MOJIBAKE_REPLACEMENT = "\ufffd"
MOJIBAKE_C1 = "[\u0080-\u009f]"
MOJIBAKE_DIGRAPH = "\u00c3[\u0080-\u00bf]|\u00e2\u20ac|\u00c2[\u00a0-\u00bf]"


def mojibake_stats(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    flag_ppm: int = 500,
    passthrough: tuple = (),
) -> DataFrame:
    """Encoding-damage (mojibake) detector — the cheap curation signal
    next to ``quality_scores``: per-doc counts of U+FFFD replacement
    characters (a decoder already gave up), C1 control characters
    U+0080–U+009F (UTF-8 bytes decoded as Latin-1 land here), and the
    classic UTF-8-as-Latin-1/cp1252 digraph signatures ('Ã?', 'â€',
    'Â?'). Returns ``(id, n_chars, n_replacement, n_c1, n_digraph,
    mojibake_ppm, flagged)`` where the score is integer parts-per-
    million of weighted hits (replacement ×3, digraph ×2, C1 ×1 — a
    digraph's C1 member also counts in n_c1, documented overlap) and
    ``flagged = mojibake_ppm >= flag_ppm``.

    Pure regexp_count expressions — one narrow scan in codegen, zero
    shuffle; the ppm is exact BIGINT division (weighted·10⁶ div
    chars), engine-identical by construction. Note 'â€' uses U+20AC €
    (the cp1252 read of byte 0x80) — the form mojibake actually takes
    in the wild."""
    counted = docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.length(text).cast("long").alias("n_chars"),
        F.regexp_count(F.col(text), F.lit(MOJIBAKE_REPLACEMENT))
        .cast("long")
        .alias("n_replacement"),
        F.regexp_count(F.col(text), F.lit(MOJIBAKE_C1)).cast("long").alias("n_c1"),
        F.regexp_count(F.col(text), F.lit(MOJIBAKE_DIGRAPH))
        .cast("long")
        .alias("n_digraph"),
    )
    ppm = F.when(
        F.col("n_chars") > 0,
        F.expr("(3*n_replacement + n_c1 + 2*n_digraph) * 1000000 DIV n_chars"),
    )
    return counted.select(
        "*",
        ppm.alias("mojibake_ppm"),
        (F.coalesce(ppm, F.lit(0)) >= int(flag_ppm)).alias("flagged"),
    )
