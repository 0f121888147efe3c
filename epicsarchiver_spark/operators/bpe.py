"""BPE tokenizer TRAINING in the engine (Sennrich et al. 2016) — the
piece a training-data pipeline runs before anything downstream can count
tokens honestly: learn the merge table from the corpus itself.

Distributed shape: ONE corpus-sized aggregate reduces the text to the
distinct-word frequency table; everything after that — pair counting,
argmax, merge application — operates on that VOCABULARY-sized frame
(10⁴–10⁶ rows at any corpus size), so a 100 TB corpus pays one
tokenize+count pass and then trains on kilobytes-per-round. Pair
extraction is an array-local zip (no per-symbol explode of the corpus),
merge application an array fold; both whole-stage-codegen expressions.

The per-round argmax pair is deterministic (count desc, then pair
lexicographic) and `bpe_pair_counts` — round 1's counting step — carries
a full DuckDB oracle; the loop itself is pinned by a pure-python mirror
test (tests/test_bpe.py) the same way the PCA eigen step is pinned by
numpy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word counts — the one corpus-sized reduction. Lowercased
    whitespace tokens (the same convention as the rest of the text
    surface); returns ``(word, n)``."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _chars_with_marker(word: Column) -> Column:
    """Initial symbol sequence: one symbol per character plus the
    end-of-word marker (split on the empty pattern differs between
    engines — substr indexing is exact everywhere). Works on any
    string Column, including lambda variables."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substr(word, i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(syms: Column) -> Column:
    """Array-local adjacent (a, b) struct list — no explode of anything
    corpus-sized; callers explode the VOCAB frame only."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b) with
    the fused symbol — one array fold, the exact classic-BPE apply step
    (a freshly fused symbol never re-fuses within the same pass unless
    it literally equals ``a``, which requires b = '' and cannot occur)."""
    fused = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_pair_counts(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Round-1 BPE statistics: corpus-weighted adjacent character-pair
    counts over the initial symbol sequences, top-``k`` by (count desc,
    pair) — the frame whose argmax IS the first learned merge. The only
    corpus-sized work is ``word_frequency``'s aggregate; the pair
    explode fans out the vocab frame by ~word-length and reduces
    map-side; top-k is TakeOrderedAndProject."""
    wf = word_frequency(docs, text_col)
    pairs = wf.select(
        "n", F.explode(_adjacent_pairs(_chars_with_marker(F.col("word")))).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(k)
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. After the single
    corpus reduction the loop is vocabulary-sized: each round counts
    pairs on the symbol table (array-local zip + one small aggregate),
    collects ONE (a, b, count) row, and rewrites the symbol column with
    an expression fold. The symbol table is lineage-truncated per round
    (vocab-sized — the same discipline as the PageRank rank frame).
    Stops early when no pair reaches ``min_count``."""
    from epicsarchiver_spark.operators.dedup import _truncate_lineage

    syms = _truncate_lineage(
        word_frequency(docs, text_col).select(
            "n", _chars_with_marker(F.col("word")).alias("syms")
        )
    )
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        top = (
            syms.select("n", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms = _truncate_lineage(
            syms.select("n", _apply_merge(F.col("syms"), a, b).alias("syms"))
        )
    return merges


def select_batch(
    candidates: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str]]:
    """Greedy non-interacting batch selection over a (count desc, a, b)-
    ordered candidate list: a merge joins the batch only when its parts
    AND its fused symbol are disjoint from every symbol an earlier
    selection touches (parts and fused). Disjointness is exactly the
    condition under which applying the batch in order is
    indistinguishable from ``batch`` sequential Sennrich rounds over
    these pairs: applying (x, y) can only change the count of (a, b)
    when they share a symbol, and fresh fused symbols can only collide
    when one equals a selected part. Pure function — mirrored verbatim
    by the python reference in tests/test_bpe.py."""
    selected: list[tuple[str, str]] = []
    touched: set[str] = set()
    for a, b, _c in candidates:
        if {a, b, a + b} & touched:
            continue
        selected.append((a, b))
        touched |= {a, b, a + b}
        if len(selected) >= batch:
            break
    return selected


def learn_bpe_batched(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_count: int = 2,
    batch: int = 16,
    oversample: int = 4,
) -> list[tuple[str, str]]:
    """``learn_bpe`` at production vocab size: each round learns up to
    ``batch`` NON-INTERACTING merges from one pair-count job, so a
    32k-merge tokenizer train is ~32k/batch Spark jobs instead of 32k
    sequential ones (VERDICT r7 #6). ``batch=1`` is bit-identical to
    ``learn_bpe`` (same argmax, same tie-break).

    Semantics: within a round the top ``batch * oversample`` pairs are
    collected (count desc, then pair lexicographic — Sennrich's
    deterministic order) and filtered greedily to a non-interacting set
    (``select_batch``): parts and fused symbols pairwise disjoint.
    Under that condition the batch IS the sequential result for those
    pairs — counts of later selections are provably unchanged by
    earlier applications. The one deliberate deviation from
    strictly-sequential BPE: a pair CREATED by a merge in this round
    (count ≤ its creator's) cannot be selected until the next round,
    so a created pair that would outrank a later candidate shifts the
    merge ORDER across the batch boundary; the learned vocabulary
    converges to the same set in practice and the batch=1 lane remains
    the exact-order reference. Documented + property-tested against a
    pure-python mirror of this exact algorithm (tests/test_bpe.py)."""
    from epicsarchiver_spark.operators.dedup import _truncate_lineage

    syms = _truncate_lineage(
        word_frequency(docs, text_col).select(
            "n", _chars_with_marker(F.col("word")).alias("syms")
        )
    )
    merges: list[tuple[str, str]] = []
    while len(merges) < int(n_merges):
        want = min(int(batch), int(n_merges) - len(merges))
        cand = (
            syms.select("n", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("c"))
            .filter(F.col("c") >= int(min_count))
            .orderBy(F.desc("c"), "a", "b")
            .limit(max(want * int(oversample), want))
            .collect()
        )
        picked = select_batch([(r["a"], r["b"], r["c"]) for r in cand], want)
        if not picked:
            break
        merges.extend(picked)
        col = F.col("syms")
        for a, b in picked:
            col = _apply_merge(col, a, b)
        syms = _truncate_lineage(syms.select("n", col.alias("syms")))
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "auto",
) -> DataFrame:
    """Segment every document with a learned merge table: per word, the
    merge sequence replays in training order. Returns ``(id, n_words,
    n_bpe_tokens, fertility)`` — the honest token accounting for budget
    / mixture planning once a real vocab exists.

    Two lanes, identical semantics (equivalence-tested): ``expr`` —
    chained array folds, zero shuffle, zero UDF, WholeStageCodegen, but
    plan depth grows with len(merges) — the analyzer's lambda-variable
    resolution iterates per nesting level and hits its default
    maxIterations=100 at 48 chained transforms (measured, Spark 4.1);
    ``pandas`` — one Arrow-batched ``mapInPandas`` doing the same
    left-to-right non-overlapping replay in python, flat plan at any
    merge-table size (a real 32k-merge vocab). ``auto`` picks expr for
    ≤40 merges, pandas past that (margin under the measured cliff)."""
    if engine == "auto":
        engine = "expr" if len(merges) <= 40 else "pandas"
    if engine == "pandas":
        return _apply_bpe_pandas(docs, merges, id_col, text_col)
    # coalesce: a NULL text must count as zero words in BOTH lanes
    # (size(NULL array) is -1, not 0)
    words = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: t != "",
        ).alias("_w"),
    )
    per_word = words.select(
        F.col(id_col),
        F.transform(F.col("_w"), _chars_with_marker).alias("_syms"),
    )
    def _merge_fn(a: str, b: str):
        # pyspark counts default-arg params toward lambda arity — a
        # closure keeps the HOF lambda unary
        return lambda s: _apply_merge(s, a, b)

    col = F.col("_syms")
    for a, b in merges:
        col = F.transform(col, _merge_fn(a, b))
    return per_word.select(
        F.col(id_col),
        F.size("_syms").alias("n_words"),
        # tokens = symbols after replay, excluding only a still-BARE end
        # marker: once a merge fuses </w> into a symbol (learned tables
        # do this early — ('n','</w>') etc.) that symbol IS a token, and
        # a fully-fused word is 1 token, never 0 (size-1 undercounted
        # every marker-fusing word and bottomed out at 0)
        F.aggregate(
            F.transform(
                col,
                lambda s: F.size(s)
                - F.when(F.element_at(s, -1) == F.lit(END), 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("long").alias("n_bpe_tokens"),
    ).withColumn(
        "fertility",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6),
        ),
    )


def _apply_bpe_pandas(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Arrow-batched replay lane for production-sized merge tables —
    semantics byte-identical to the expression folds (shared with the
    python mirror in tests/test_bpe.py), plan depth constant in
    len(merges). Per-word results are memoized within a batch: corpus
    word frequency follows Zipf, so the cache hit rate is high and the
    cost approaches one replay per DISTINCT word per batch."""
    import re

    import pandas as pd

    mseq = [(a, b, a + b) for a, b in merges]
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_words long, n_bpe_tokens long, fertility double"
    )
    # Java \s is ASCII-only ([ \t\n\x0b\f\r]); python str.split() also
    # splits unicode whitespace (U+00A0 …) and would disagree with the
    # expression lane — use the exact same character class
    ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")

    def _batches(frames):
        cache: dict[str, int] = {}

        def n_units(word: str) -> int:
            hit = cache.get(word)
            if hit is not None:
                return hit
            syms = list(word) + [END]
            for a, b, fused in mseq:
                out = []
                for tok in syms:
                    if out and out[-1] == a and tok == b:
                        out[-1] = fused
                    else:
                        out.append(tok)
                syms = out
            # same accounting as the expression lane: only a still-bare
            # end marker is excluded; a marker-fused symbol is a token
            cache[word] = len(syms) - (1 if syms[-1] == END else 0)
            return cache[word]

        for pdf in frames:
            ids, nw, nb = [], [], []
            for i, t in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                toks = [w for w in ws.split((t or "").lower()) if w]
                ids.append(i)
                nw.append(len(toks))
                nb.append(sum(n_units(w) for w in toks))
            res = pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": nb}
            )
            # HALF_UP like Spark's round(), not python's half-even
            res["fertility"] = [
                (math.floor(b / w * 1e6 + 0.5) / 1e6) if w else None
                for b, w in zip(nb, nw)
            ]
            yield res

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _batches, schema=out_schema
    )
