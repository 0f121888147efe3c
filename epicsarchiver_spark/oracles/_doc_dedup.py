"""DuckDB oracles: document dedup/graph gates (doc_* — minhash/simhash/CDC/bloom/components/shards/winnowing/entity/contamination) — split from the former
oracles.py monolith (VERDICT r10 task 8); ``build(o)`` mutates the
shared registry dict. Statement order (and any support helpers each
family needs) is preserved verbatim from the original file, so the
composed oracle_sql() output is byte-identical."""

from __future__ import annotations

from epicsarchiver_spark.catalog import POINTS_ORACLE_CTE
from epicsarchiver_spark.gate_constants import (
    ALARM_TRIP,
    ALERT_RULES,
    ASOF_LOOKBACK,
    BLOCKWORDS,
    BOILER_MIN_WORDS,
    BOILER_SEG_WORDS,
    BOILER_STOPWORDS,
    BLOCK_MAX_RATIO,
    BM25_QUERY,
    COMPRESS_DEADBAND,
    COMPRESS_DEADTIME,
    CORR_MIN_R,
    DEADBAND,
    DEADTIME,
    DISCORD_K,
    DISCORD_WINDOW,
    ENUM_LABELS,
    FUNNEL_STEPS,
    GRID_STEP,
    HEARTBEAT,
    HH_MIN_COUNT,
    HIST_BINS,
    INSTRUMENT,
    KEYWORD_TAXONOMY,
    MAIL_LOOKUP_PV,
    MAIL_TEMPLATE,
    MULTI_QUERIES,
    OUTLIER_K,
    PROJ_DIM,
    RAMP_MIN_STEPS,
    RECENT_RUNS_LIMIT,
    RELATED_NODE,
    SAX_ALPHABET,
    SAX_EXPAND,
    SAX_NCAND,
    SAX_QUERY_PV,
    SAX_SEGMENTS,
    SAX_TOPK,
    SESSION_GAP,
    SHIFT_THRESHOLD,
    SHIFT_WINDOW,
    T0,
    T1,
    T_ASOF,
    WINNOW_MAX_DF,
    WINNOW_MIN_SHARED,
    _EDGES_CTE,
    _XCORR_PAIRS,
)
from epicsarchiver_spark.operators import similarity


def build(o: dict[str, str]) -> None:
    P = f"WITH {POINTS_ORACLE_CTE}"
    E = f"WITH {_EDGES_CTE}"

    _rules_sql = ", ".join(f"('{k}','{c}',{t})" for k, c, t in ALERT_RULES)

    # cat_parse_times oracle: the EXECUTED reference parser's outputs at a
    # frozen clock (tools/gen_parse_time_vectors.py) served as VALUES.
    from epicsarchiver_spark.functions.parse_time_vectors import PARSE_TIME_VECTORS

    _ptrows = ", ".join(
        f"(CAST({i} AS BIGINT), {t0!r}, {t1!r})" for i, _, _, t0, t1 in PARSE_TIME_VECTORS
    )

    # --- LSH plane-family oracles -------------------------------------
    # The hyperplanes/centroids are a deterministic LCG (similarity.
    # _hyperplanes), so the "approximate" operators are exactly
    # reproducible in SQL with the planes embedded as list literals.
    # Cross-engine float safety: numpy GEMM vs DuckDB list_dot_product
    # differ by ≤ 9e-16 on this data while the smallest |plane·v| is
    # 1.4e-4 — eleven orders of magnitude of sign margin (measured at
    # sf0.01; see tests/test_oracle_parity.py for the standing check).
    from epicsarchiver_spark.operators.similarity import _hyperplanes

    def _lits(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    def _sig_sql(evar: str, planes) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({evar}, {_lits(p)}) > 0 THEN {1 << j} ELSE 0 END)"
            for j, p in enumerate(planes)
        )

    _V = """v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        )"""

    _COS = (
        "list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )

    _bp = _hyperplanes(64, 16, 42)  # banded: n_planes=16, bands=8 → 2 bits/band

    _lp = _hyperplanes(64, 8, 42)  # lsh_bucket_topk: n_planes=8, max_hamming=2

    # ivf_topk: n_cells=8, n_probe=4. Cell scores use the same
    # ‖c‖² − 2·v·c formula (with ‖c‖² precomputed in python, matching the
    # UDF's closure constant); probe selection uses the full ‖q−c‖²
    # ordered by (dist, cell) exactly as the operator's heapq does.
    _cents = _hyperplanes(64, 8, 42)

    _cnorm = [sum(x * x for x in c) for c in _cents]

    _score_list = "[" + ", ".join(
        f"{_cnorm[i]!r} - 2 * list_dot_product(e, {_lits(c)})" for i, c in enumerate(_cents)
    ) + "]"

    _cell_rows = ", ".join(f"({i + 1}, {_lits(c)})" for i, c in enumerate(_cents))

    # ts_cvalue oracle: the reference formatter's own outputs, recorded by
    # executing ref epicsarchiver/util.py hformat (tools/gen_hformat_vectors.py)
    # — DuckDB just serves the expected strings back as a VALUES table.
    from epicsarchiver_spark.functions.hformat_vectors import CVALUE_VECTORS

    _cvrows = ", ".join(
        "(CAST({} AS BIGINT), '{}')".format(i, exp) for i, _, exp in CVALUE_VECTORS
    )

    # tokens = whitespace split with empties removed — shared by the doc oracles
    TOK = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

    o["doc_fingerprints"] = rf"""
        SELECT doc_id,
               length(text) AS n_chars_actual,
               len({TOK}) AS n_tokens,
               len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?\p{{L}}+| ?\p{{N}}+| ?[^\s\p{{L}}\p{{N}}]+|\s+'))
                   AS n_bpe_tokens,
               round(CASE WHEN len({TOK}) > 0
                     THEN list_sum(list_transform({TOK}, x -> length(x))) * 1.0 / len({TOK})
                     ELSE 0.0 END, 6) AS mean_token_len,
               lower(substr(md5(text), 1, 16)) AS fingerprint
        FROM documents
    """

    o["doc_dedup_exact"] = """
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    """

    o["doc_exact_dups"] = """
        SELECT lower(substr(md5(text), 1, 16)) AS fp,
               min(doc_id) AS keep_id, count(*) AS n_docs
        FROM documents
        GROUP BY 1 HAVING count(*) >= 2
    """

    # windowed co-occurrence PMI: clamped slices around each target
    # position (overlaps double-count by contract), vocabulary-sized
    # aggregates, the same ln-ratio in both engines
    # RAKE: same phrase segmentation (running stop-count window), same
    # integer micro-unit word scores (identical IEEE floor expression),
    # exact integer phrase sums
    _rk_stop = ", ".join(f"'{w}'" for w in sorted(("the", "and", "of", "to", "in")))

    o["doc_segment_dedup"] = """
        WITH segs AS (
          SELECT doc_id, unnest(l) AS seg, unnest(range(1, len(l)+1)) AS ord
          FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        ), nz AS (SELECT * FROM segs WHERE seg <> ''),
        stats AS (SELECT doc_id, count(*) AS n_segments FROM nz GROUP BY doc_id),
        firsts AS (SELECT doc_id, seg, min(ord) AS mo FROM nz GROUP BY doc_id, seg),
        agg AS (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(seg, ' ' ORDER BY mo) AS text_dedup
          FROM firsts GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(stats.n_segments, 0) AS n_segments,
               coalesce(agg.n_kept, 0) AS n_kept,
               coalesce(agg.text_dedup, '') AS text_dedup
        FROM documents d
        LEFT JOIN stats ON d.doc_id = stats.doc_id
        LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

    # logistic quality classifier: every feature replayed as builtin SQL,
    # weights embedded as exact Python double reprs; z over UNROUNDED
    # features, prob rounded to 6dp, keep compared on the rounded value
    from epicsarchiver_spark.operators.text_ops import QC_BIAS, QC_WEIGHTS

    _qc_feats = {
        "len_log": "ln(1 + length(text))",
        "mean_tok_len": (
            f"CASE WHEN len({TOK}) > 0 THEN "
            f"list_sum(list_transform({TOK}, x -> length(x))) * 1.0 / len({TOK}) "
            "ELSE 0.0 END"
        ),
        "stopword_ratio": (
            f"CASE WHEN len({TOK}) > 0 THEN "
            f"len(list_filter({TOK}, t -> lower(t) IN ('the','and','of','to','in')))"
            f" * 1.0 / len({TOK}) ELSE 0.0 END"
        ),
        "punct_ratio": (
            "CASE WHEN length(text) > 0 THEN "
            "length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]-]', '', 'g'))"
            " * 1.0 / length(text) ELSE 0.0 END"
        ),
        "digit_frac": (
            "CASE WHEN length(text) > 0 THEN "
            "length(regexp_replace(text, '[^0-9]', '', 'g'))"
            " * 1.0 / length(text) ELSE 0.0 END"
        ),
        "upper_frac": (
            "CASE WHEN length(text) > 0 THEN "
            "length(regexp_replace(text, '[^A-Z]', '', 'g'))"
            " * 1.0 / length(text) ELSE 0.0 END"
        ),
    }

    _qc_z = repr(QC_BIAS) + "".join(
        f" + {w!r} * ({_qc_feats[name]})" for name, w in QC_WEIGHTS
    )

    o["doc_incremental_dedup"] = """
        WITH newb AS (
          SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 20000 AS doc_id, text || ' unseen' AS text
          FROM documents WHERE doc_id % 7 = 3
        )
        SELECT doc_id, text FROM newb
        WHERE lower(substr(md5(text), 1, 16)) NOT IN
              (SELECT lower(substr(md5(text), 1, 16)) FROM documents)
    """

    # bloom-accelerated path: semantically identical to the plain
    # anti-join (no false negatives; maybes confirmed exactly) — the
    # oracle IS the exact formulation
    o["doc_bloom_dedup"] = o["doc_incremental_dedup"]

    o["doc_splits"] = """
        SELECT doc_id,
               CASE WHEN b < 9000 THEN 'train'
                    WHEN b < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS b
          FROM documents
        )
    """

    SHING2 = (
        f"list_distinct(list_transform(range(1, greatest(len({TOK}) - 1, 0) + 1), "
        f"i -> array_to_string(({TOK})[i:i+1], ' ')))"
    )

    o["doc_jaccard_pairs"] = f"""
        WITH sh AS (
          SELECT doc_id, lang, n_chars // 100 AS lb, {SHING2} AS s
          FROM documents
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.s, b.s)) * 1.0 AS i,
                 len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
          FROM sh a JOIN sh b
            ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, round(i / u, 6) AS jaccard
        FROM pairs WHERE u > 0 AND i / u >= 0.05
    """

    # triangles via the oriented join over the same jaccard pair lane;
    # per-node rollups + the 2T/(d(d−1)) coefficient
    o["doc_triangles"] = f"""
        WITH jp AS ({o["doc_jaccard_pairs"]}),
        e AS (
          SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
          FROM jp
        ),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM e e1
          JOIN e e2 ON e1.v = e2.u
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        nt AS (
          SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
          FROM (SELECT a AS id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
          GROUP BY id
        ),
        deg AS (
          SELECT id, CAST(count(*) AS BIGINT) AS degree
          FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
          GROUP BY id
        )
        SELECT deg.id,
               deg.degree,
               CAST(coalesce(nt.n_triangles, 0) AS BIGINT) AS n_triangles,
               round(CASE WHEN deg.degree >= 2
                          THEN 2.0 * coalesce(nt.n_triangles, 0)
                               / (deg.degree * (deg.degree - 1))
                          ELSE 0.0 END, 6) AS clustering
        FROM deg LEFT JOIN nt USING (id)
    """

    # the persisted-edge lane answers the SAME question
    o["doc_triangles_indexed"] = o["doc_triangles"]

    # --- MinHash / SimHash (basis="md5"): bit-for-bit reproduction -----
    # Engine and oracle share the md5 token basis: per-token 60-bit hash
    # (first 15 hex digits of md5 → BIGINT; DuckDB folds hex digits with
    # shifts), split into two 30-bit lanes, k=2 shingles combined by the
    # two-lane sliding fold acc=(acc·R+next) mod p — and, for MinHash,
    # the affine family v=(a·(h mod p)+b) mod p over p=2³¹−1. Every step
    # is exact BIGINT arithmetic in both engines; no shingle strings.
    from epicsarchiver_spark.functions.hashing import (
        LANE_MASK,
        MERSENNE31,
        P30_HI,
        P30_LO,
        R_HI,
        R_LO,
        affine31_params,
    )

    _P31 = MERSENNE31

    _HEX60_TOK = (
        "list_aggregate(list_transform(range(1, 16), j -> "
        "(strpos('0123456789abcdef', substr(md5(t), j, 1)) - 1)::BIGINT "
        "<< (4 * (15 - j))), 'sum')"
    )

    _PACK2 = (
        f"(((th[i] & {LANE_MASK}) * {R_LO} + (th[i + 1] & {LANE_MASK})) % {P30_LO})"
        f" + ((((th[i] >> 30) * {R_HI}) + (th[i + 1] >> 30)) % {P30_HI}) * (1::BIGINT << 30)"
    )

    _HS_CTE = f"""
        th AS (
          SELECT doc_id, list_transform({TOK}, t -> {_HEX60_TOK}) AS th
          FROM documents
        ),
        hs AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(th) - 1, 0) + 1), i -> {_PACK2})) AS hs
          FROM th
        )
    """

    _sig_exprs = ", ".join(
        f"coalesce(list_min(list_transform(hs, h -> ({a} * (h % {_P31}) + {b}) % {_P31})), {_P31})"
        for a, b in affine31_params(64)
    )

    o["doc_minhash_neardups"] = f"""
        WITH {_HS_CTE},
        sig AS (
          SELECT doc_id, [{_sig_exprs}] AS sig FROM hs
        ), bands AS (
          SELECT doc_id, i AS band,
                 array_to_string(sig[4*i+1 : 4*i+4], ',') AS chunk
          FROM sig, range(0, 16) t(i)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
        ), est AS (
          SELECT c.id_a, c.id_b,
                 len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0
                   AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.id_a
          JOIN sig sb ON sb.doc_id = c.id_b
        )
        SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
    """

    # persisted-signature lane reads back the same signatures → same pairs
    o["doc_minhash_indexed"] = o["doc_minhash_neardups"]

    o["doc_simhash_neardups"] = f"""
        WITH {_HS_CTE},
        sim AS (
          SELECT doc_id,
                 list_aggregate(list_transform(range(0, 60), j ->
                   CASE WHEN 2 * len(list_filter(hs, h -> ((h >> j) & 1) = 1)) > len(hs)
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END), 'sum') AS sh
          FROM hs
        ), blk AS (
          SELECT doc_id, sh, i AS blk, (sh >> (16 * i)) & 65535 AS val
          FROM sim, range(0, 4) t(i)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.sh AS sh_a, b.sh AS sh_b
          FROM blk a JOIN blk b
            ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 8
    """

    # exact-substring span dedup: the same two-lane md5 fold, POSITIONAL
    # (window start i), unrolled for window=8; a window is duplicated when
    # its hash occurs >= 2 times corpus-wide; covered tokens are excised.
    # DuckDB list_filter's index lambda is 1-based (Spark's is 0-based):
    # token index j0 = i - 1.
    _SUB_L = 8

    _sub_lo = f"(th[i] & {LANE_MASK})"

    _sub_hi = "(th[i] >> 30)"

    for _s in range(1, _SUB_L):
        _sub_lo = f"(({_sub_lo}) * {R_LO} + (th[i+{_s}] & {LANE_MASK})) % {P30_LO}"
        _sub_hi = f"(({_sub_hi}) * {R_HI} + (th[i+{_s}] >> 30)) % {P30_HI}"

    _SUB_PACK = f"({_sub_lo}) + ({_sub_hi}) * (1::BIGINT << 30)"

    o["doc_substring_dedup"] = f"""
        WITH th AS (
          SELECT doc_id, list_transform({TOK}, t -> {_HEX60_TOK}) AS th
          FROM documents
        ), wh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(th) - {_SUB_L - 1}, 0) + 1),
                                i -> {_SUB_PACK}) AS wh
          FROM th
        ), px AS (
          SELECT doc_id, unnest(wh) AS h, unnest(range(0, len(wh))) AS pos FROM wh
        ), dup AS (
          SELECT h FROM px GROUP BY h HAVING count(*) >= 2
        ), starts AS (
          SELECT doc_id, list_sort(list(pos)) AS starts
          FROM px WHERE h IN (SELECT h FROM dup) GROUP BY doc_id
        ), j AS (
          SELECT d.doc_id, {TOK} AS t, coalesce(s.starts, CAST([] AS BIGINT[])) AS st
          FROM documents d LEFT JOIN starts s USING (doc_id)
        ), k AS (
          SELECT doc_id, t, st,
                 list_filter(t, (x, i) ->
                   len(list_filter(st, s -> s <= i - 1 AND i - 1 < s + {_SUB_L})) = 0) AS kept
          FROM j
        )
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(st) AS BIGINT) AS n_dup_windows,
               CAST(len(t) - len(kept) AS BIGINT) AS n_dup_tokens,
               coalesce(array_to_string(kept, ' '), '') AS text_clean
        FROM k
    """

    # winnowing (MOSS): k=5 positional fold (same two-lane md5 machinery),
    # window-min selection, distinct fingerprint set, pair join
    _WIN_K, _WIN_W = 5, 4

    _win_lo = f"(th[i] & {LANE_MASK})"

    _win_hi = "(th[i] >> 30)"

    for _s in range(1, _WIN_K):
        _win_lo = f"(({_win_lo}) * {R_LO} + (th[i+{_s}] & {LANE_MASK})) % {P30_LO}"
        _win_hi = f"(({_win_hi}) * {R_HI} + (th[i+{_s}] >> 30)) % {P30_HI}"

    _WIN_PACK = f"({_win_lo}) + ({_win_hi}) * (1::BIGINT << 30)"

    o["doc_winnow_pairs"] = f"""
        WITH th AS (
          SELECT doc_id, list_transform({TOK}, t -> {_HEX60_TOK}) AS th
          FROM documents
        ),
        wh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(th) - {_WIN_K - 1}, 0) + 1),
                                i -> {_WIN_PACK}) AS wh
          FROM th
        ),
        fps AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(wh) - {_WIN_W - 1}, 0) + 1),
                   i -> list_aggregate(list_slice(wh, i, i + {_WIN_W - 1}), 'min'))) AS fps
          FROM wh WHERE len(wh) >= {_WIN_W}
        ),
        e0 AS (SELECT doc_id, unnest(fps) AS fp FROM fps),
        rare AS (
          SELECT fp FROM e0 GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF}
        ),
        e AS (SELECT doc_id, fp FROM e0 WHERE fp IN (SELECT fp FROM rare))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
    """

    # shared prefix: the jaccard pair graph as symmetric edges + closure —
    # component(v) = min id reachable (recursive CTE = the oracle analog of
    # the engine's min-label propagation)
    CC = f"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, lang, n_chars // 100 AS lb, {SHING2} AS s
          FROM documents
        ), jp AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.s, b.s)) * 1.0 AS i,
                 len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
          FROM sh a JOIN sh b
            ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        ), pairs AS (
          SELECT id_a, id_b FROM jp WHERE u > 0 AND i / u >= 0.05
        ), edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ), reach(id, root) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.id
        ), comp AS (
          SELECT id, min(root) AS component FROM reach GROUP BY id
        )
    """

    o["doc_dedup_groups"] = (
        CC + "SELECT id AS doc_id, component FROM comp"
    )

    # incremental artifact maintenance answers the SAME question as a
    # from-scratch rebuild — that equality IS the operator's contract
    o["doc_components_incremental"] = o["doc_dedup_groups"]

    o["doc_dedup_survivors"] = (
        CC
        + """
        SELECT d.doc_id, d.lang, d.source
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id != component)
        """
    )

    # --- clickstream analytics (operators/events.py) ------------------
    step_list = ", ".join(f"'{s}'" for s in FUNNEL_STEPS)

    cascade = []

    for i, s in enumerate(FUNNEL_STEPS):
        if i == 0:
            cascade.append(
                f"s0 AS (SELECT user_id, min(t) AS t0 FROM ev"
                f" WHERE event_type = '{s}' GROUP BY 1)"
            )
        else:
            cascade.append(
                f"s{i} AS (SELECT user_id, min(t) AS t{i}"
                f" FROM ev JOIN s{i - 1} USING (user_id)"
                f" WHERE event_type = '{s}' AND t > t{i - 1} GROUP BY 1)"
            )

    unions = "\n        UNION ALL ".join(
        f"SELECT {i} AS step, '{s}' AS step_name,"
        f" (SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(FUNNEL_STEPS)
    )

    lat_unions = "\n        UNION ALL ".join(
        f"SELECT {i} AS step, '{s}' AS step_name,"
        f" CAST(count(*) AS BIGINT) AS n_converted,"
        f" round(quantile_cont(t{i} - t{i - 1}, 0.5), 6) AS p50_s,"
        f" round(quantile_cont(t{i} - t{i - 1}, 0.9), 6) AS p90_s,"
        f" round(avg(t{i} - t{i - 1}), 6) AS mean_s"
        f" FROM s{i} JOIN s{i - 1} USING (user_id)"
        for i, s in enumerate(FUNNEL_STEPS)
        if i > 0
    )

    # signed random projection: the ±1 matrix regenerates from the same
    # LCG (signed_projection_matrix) and embeds as list literals — the
    # emb_topk_lsh trick; round(6) guards dot-product reduce order
    _proj_rows = similarity.signed_projection_matrix(64, PROJ_DIM)

    _proj_exprs = ", ".join(
        "round(list_dot_product(e, ["
        + ", ".join(str(s) for s in row)
        + "]), 6)"
        for row in _proj_rows
    )

    # product quantization: codebook regenerates from the shared LCG and
    # embeds as literals; distances are the same left-fold of (x−c)² in
    # both engines, so argmin codes agree bit-for-bit
    _pq_cb = similarity.pq_codebook(8, 16, 8)

    _sl_cols = ", ".join(f"e[{8 * s + 1}:{8 * s + 8}] AS s{s}" for s in range(8))

    def _pq_dist(var: str, cent: list[float]) -> str:
        return "(" + " + ".join(
            f"({var}[{i + 1}] - ({c}))*({var}[{i + 1}] - ({c}))"
            for i, c in enumerate(cent)
        ) + ")"

    _d_cols = ", ".join(
        "[" + ", ".join(_pq_dist(f"s{s}", cent) for cent in _pq_cb[s]) + f"] AS d{s}"
        for s in range(8)
    )

    _code_items = ", ".join(
        f"CAST(list_position(d{s}, list_aggregate(d{s}, 'min')) - 1 AS BIGINT)"
        for s in range(8)
    )

    # IVF-PQ end-to-end: coarse-cell probe (the emb_topk_ivf machinery)
    # + the PQ code CTEs + a query-side LUT (the same left-fold (q−c)²
    # per subspace centroid) — adc = 8 list lookups summed, ordered
    # ascending. All doubles computed by identical expression chains.
    _qsl_cols = ", ".join(f"qe[{8 * s + 1}:{8 * s + 8}] AS q{s}" for s in range(8))

    _lut_cols = ", ".join(
        "[" + ", ".join(_pq_dist(f"q{s}", cent) for cent in _pq_cb[s]) + f"] AS l{s}"
        for s in range(8)
    )

    # the CTE chain (corpus → cells → probes → codes → LUT → probed
    # candidate set) is shared by the plain ADC oracle and the re-rank
    # oracle below — one formula, two consumers, like _bm25_contrib
    _ivfpq_cte = f"""
        WITH {_V},
        ev AS (SELECT vec_id, e FROM v),
        q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        assigned AS (
          SELECT vec_id, list_position(dl, list_min(dl)) AS cell
          FROM (SELECT vec_id, {_score_list} AS dl FROM v)
        ),
        cells(cell, c) AS (SELECT * FROM (VALUES {_cell_rows}) t(cell, c)),
        probe AS (
          SELECT cell FROM cells, q
          ORDER BY list_dot_product(qe, qe)
                   - 2 * list_dot_product(qe, list_transform(c, x -> CAST(x AS DOUBLE)))
                   + list_dot_product(list_transform(c, x -> CAST(x AS DOUBLE)),
                                      list_transform(c, x -> CAST(x AS DOUBLE))),
                   cell
          LIMIT 4
        ),
        sl AS (SELECT vec_id, {_sl_cols} FROM ev),
        d AS (SELECT vec_id, {_d_cols} FROM sl),
        c AS (SELECT vec_id, [{_code_items}] AS codes FROM d),
        qsl AS (SELECT {_qsl_cols} FROM q),
        lut AS (SELECT {_lut_cols} FROM qsl),
        sel AS (
          SELECT a.vec_id, c.codes
          FROM assigned a JOIN c USING (vec_id)
          WHERE a.cell IN (SELECT cell FROM probe)
        )"""

    # corpus-level segment dedup: the oracle groups by the segment TEXT
    # (it needn't be scale-shaped); the engine groups by md5 — identical
    # barring a 128-bit collision. Winner = min (doc_id, idx); DuckDB
    # list_filter's index lambda is 1-based (Spark's is 0-based) → i−1.
    o["doc_paragraph_dedup"] = """
        WITH segs AS (
          SELECT doc_id, unnest(l) AS seg, unnest(range(0, len(l))) AS idx
          FROM (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
            FROM documents
          )
        ),
        w AS (
          SELECT doc_id, idx FROM (
            SELECT doc_id, idx,
                   row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) AS rn
            FROM segs
          ) WHERE rn = 1
        ),
        ki AS (SELECT doc_id, list_sort(list(idx)) AS ki FROM w GROUP BY doc_id),
        j AS (
          SELECT d.doc_id,
                 list_filter(string_split(d.text, ' '), x -> x <> '') AS l,
                 coalesce(k.ki, CAST([] AS BIGINT[])) AS ki
          FROM documents d LEFT JOIN ki k USING (doc_id)
        ),
        f AS (
          SELECT doc_id, l, ki,
                 list_filter(l, (x, i) -> list_contains(ki, i - 1)) AS kept
          FROM j
        )
        SELECT doc_id, CAST(len(l) AS BIGINT) AS n_segments,
               CAST(len(kept) AS BIGINT) AS n_kept,
               coalesce(array_to_string(kept, ' '), '') AS text_dedup
        FROM f
    """

    # CDC chunking: k=4 rolling fold (same two-lane md5 machinery as the
    # ExactSubstr/winnow oracles), boundary at h % 2^5 == 0, chunk index
    # = running boundary count, order-insensitive per-chunk signature
    _CDC_W, _CDC_BITS = 4, 5

    _cdc_lo = f"(th[i] & {LANE_MASK})"

    _cdc_hi = "(th[i] >> 30)"

    for _s in range(1, _CDC_W):
        _cdc_lo = f"(({_cdc_lo}) * {R_LO} + (th[i+{_s}] & {LANE_MASK})) % {P30_LO}"
        _cdc_hi = f"(({_cdc_hi}) * {R_HI} + (th[i+{_s}] >> 30)) % {P30_HI}"

    _CDC_PACK = f"({_cdc_lo}) + ({_cdc_hi}) * (1::BIGINT << 30)"

    def _cdc_chain(p: str, src: str) -> str:
        """The CDC signature CTE chain with prefix ``p`` over source
        relation ``src`` (must expose doc_id, text) — reused for the
        corpus and batch sides of the incremental report."""
        return f"""
        {p}th AS (
          SELECT doc_id, list_transform({TOK}, t -> {_HEX60_TOK}) AS th
          FROM {src}
        ), {p}wh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(th) - {_CDC_W - 1}, 0) + 1),
                                i -> {_CDC_PACK}) AS wh
          FROM {p}th
        ), {p}px AS (
          SELECT doc_id, unnest(wh) AS h, unnest(range(0, len(wh))) AS pos
          FROM {p}wh
        ), {p}ch AS (
          SELECT doc_id, h,
                 sum(CASE WHEN h % {1 << _CDC_BITS} = 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_idx
          FROM {p}px
        ), {p}sig AS (
          SELECT doc_id, chunk_idx, count(*) AS n_windows,
                 CAST(sum(h % {_P31}) % {_P31} AS BIGINT) AS sig_sum,
                 CAST(min(h) AS BIGINT) AS sig_min,
                 CAST(max(h) AS BIGINT) AS sig_max
          FROM {p}ch GROUP BY 1, 2
        )"""

    _CDC_SIGS = "WITH " + _cdc_chain("", "documents").lstrip() + ", sigs AS (SELECT * FROM sig)\n"

    o["doc_cdc_chunks"] = (
        _CDC_SIGS
        + "SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, n_windows,"
        " sig_sum, sig_min, sig_max FROM sigs"
    )

    o["doc_cdc_dup_chunks"] = (
        _CDC_SIGS
        + """
        SELECT n_windows, sig_sum, sig_min, sig_max, count(*) AS n_chunks
        FROM sigs GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2
        """
    )

    o["doc_cdc_chunk_texts"] = f"""
        WITH {_cdc_chain("", "documents")},
        cuts AS (SELECT doc_id, pos FROM px WHERE h % {1 << _CDC_BITS} = 0),
        tk AS (
          SELECT doc_id, unnest({TOK}) AS tok,
                 unnest(range(0, len({TOK}))) AS pos
          FROM documents
        ),
        mk AS (
          SELECT t.doc_id, t.pos, t.tok,
                 sum(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS chunk_idx
          FROM tk t
          LEFT JOIN cuts c ON t.doc_id = c.doc_id AND t.pos = c.pos
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
               count(*) AS n_tokens
        FROM mk GROUP BY 1, 2
        """

    _ID_HASH60 = _HEX60_TOK.replace("md5(t)", "md5(CAST(vec_id AS VARCHAR))")

    # span decontamination: corpus (%97 != 0) windows colliding with the
    # benchmark slice (%97 == 0) excised — same k=8 fold as ExactSubstr
    o["doc_decontaminate_spans"] = f"""
        WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
        bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        cth AS (
          SELECT doc_id, list_transform({TOK}, t -> {_HEX60_TOK}) AS th FROM corpus
        ), cwh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(th) - {_SUB_L - 1}, 0) + 1),
                                i -> {_SUB_PACK}) AS wh
          FROM cth
        ), cpx AS (
          SELECT doc_id, unnest(wh) AS h, unnest(range(0, len(wh))) AS pos FROM cwh
        ), bth AS (
          SELECT doc_id, list_transform({TOK}, t -> {_HEX60_TOK}) AS th FROM bench
        ), bwh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(th) - {_SUB_L - 1}, 0) + 1),
                                i -> {_SUB_PACK}) AS wh
          FROM bth
        ), bh AS (
          SELECT DISTINCT unnest(wh) AS h FROM bwh
        ), starts AS (
          SELECT doc_id, list_sort(list(pos)) AS starts
          FROM cpx WHERE h IN (SELECT h FROM bh) GROUP BY doc_id
        ), j AS (
          SELECT d.doc_id, {TOK} AS t, coalesce(s.starts, CAST([] AS BIGINT[])) AS st
          FROM corpus d LEFT JOIN starts s USING (doc_id)
        ), k AS (
          SELECT doc_id, t, st,
                 list_filter(t, (x, i) ->
                   len(list_filter(st, s -> s <= i - 1 AND i - 1 < s + {_SUB_L})) = 0) AS kept
          FROM j
        )
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(st) AS BIGINT) AS n_dup_windows,
               CAST(len(t) - len(kept) AS BIGINT) AS n_dup_tokens,
               coalesce(array_to_string(kept, ' '), '') AS text_clean
        FROM k
        """

    o["doc_cdc_incremental"] = f"""
        WITH newb AS (
          SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 20000 AS doc_id, text || ' unseen trailing tokens' AS text
          FROM documents WHERE doc_id % 7 = 3
          UNION ALL
          SELECT doc_id + 30000 AS doc_id, reverse(text) AS text
          FROM documents WHERE doc_id % 11 = 1
        ),
        {_cdc_chain("c", "documents")},
        {_cdc_chain("b", "newb")},
        cset AS (
          SELECT DISTINCT n_windows, sig_sum, sig_min, sig_max FROM csig
        ),
        stats AS (
          SELECT b.doc_id, count(*) AS n_chunks, count(cset.sig_sum) AS n_matched
          FROM bsig b
          LEFT JOIN cset USING (n_windows, sig_sum, sig_min, sig_max)
          GROUP BY 1
        )
        SELECT doc_id, n_chunks, n_matched,
               n_matched >= 0.5 * n_chunks AS dropped
        FROM stats
        """

    # cross-modal survivor rule: the SemDeDup evidence edges close into
    # groups (recursive CTE = the engine's connected_components), then
    # the text-side quality score picks each group's survivor
    o["doc_quality_survivors"] = f"""
        WITH RECURSIVE {_V},
        assigned AS (
          SELECT vec_id, e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
        ),
        prs AS (
          SELECT a.vec_id, b.vec_id AS bid,
                 round({_COS.format(a="a.e", b="b.e")}, 6) AS cos
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND b.vec_id < a.vec_id
        ),
        sd AS (
          SELECT vec_id AS a, min(bid) AS b FROM prs WHERE cos >= 0.4 GROUP BY vec_id
        ),
        edges AS (SELECT a, b FROM sd UNION ALL SELECT b, a FROM sd),
        reach(id, root) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.id
        ),
        comp AS (SELECT id, min(root) AS component FROM reach GROUP BY id),
        q AS (
          SELECT doc_id, round(1.0 / (1.0 + exp(-({_qc_z}))), 6) AS quality_prob
          FROM documents
        ),
        m AS (
          SELECT q.doc_id, coalesce(c.component, q.doc_id) AS group_root,
                 q.quality_prob
          FROM q LEFT JOIN comp c ON q.doc_id = c.id
        ),
        w AS (
          SELECT group_root, doc_id AS survivor_id
          FROM (
            SELECT group_root, doc_id,
                   row_number() OVER (
                     PARTITION BY group_root
                     ORDER BY quality_prob DESC, doc_id ASC
                   ) AS rn
            FROM m
          ) WHERE rn = 1
        )
        SELECT m.doc_id, m.group_root, m.quality_prob, w.survivor_id,
               m.doc_id = w.survivor_id AS kept
        FROM m JOIN w ON m.group_root = w.group_root
        """

    _ROOT_HASH60 = _HEX60_TOK.replace("md5(t)", "md5(CAST(root AS VARCHAR))")

    o["doc_dedup_shards"] = (
        CC
        + f""",
        rooted AS (
          SELECT d.doc_id, coalesce(c.component, d.doc_id) AS root
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        ),
        h AS (
          SELECT doc_id, root,
                 CAST({_ROOT_HASH60} % 8 AS INTEGER) AS shard
          FROM rooted
        ),
        g AS (SELECT shard, root, count(*) AS gsz FROM h GROUP BY shard, root)
        SELECT shard, CAST(sum(gsz) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(max(gsz) AS BIGINT) AS max_group_size
        FROM g GROUP BY shard
        """
    )

    # persisted-components lane reads back the same labels → same layout
    o["doc_dedup_shards_indexed"] = o["doc_dedup_shards"]

    o["doc_component_splits"] = (
        CC
        + f""",
        rooted AS (
          SELECT d.doc_id, coalesce(c.component, d.doc_id) AS root
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        )
        SELECT doc_id, root,
               CASE WHEN b < 9000 THEN 'train'
                    WHEN b < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id, root,
                 ('0x' || substr(md5(CAST(root AS VARCHAR)), 1, 8))::UBIGINT
                   % 10000 AS b
          FROM rooted
        )
        """
    )

    # persisted-fingerprint lane reads back the same basis → same pairs
    o["doc_winnow_indexed"] = o["doc_winnow_pairs"]

    # artifact read-back lane: identical labels → identical assignment
    o["doc_splits_indexed"] = o["doc_component_splits"]

    o["doc_survivors_indexed"] = o["doc_quality_survivors"]

    o["doc_soft_dedup"] = (
        CC
        + """,
        rooted AS (
          SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_root
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        )
        SELECT doc_id, group_root,
               CAST(row_number() OVER (PARTITION BY group_root ORDER BY doc_id)
                    AS BIGINT) AS rank_in_group,
               (row_number() OVER (PARTITION BY group_root ORDER BY doc_id) <= 2)
                 AS kept
        FROM rooted
        """
    )

    o["doc_minhash_quality"] = f"""
        WITH cand AS (
          SELECT id_a, id_b FROM ({o["doc_minhash_neardups"]})
        ),
        sh2 AS (
          SELECT doc_id, lang, n_chars // 100 AS lb, {SHING2} AS s
          FROM documents
        ),
        truth AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh2 a JOIN sh2 b
            ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
          WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
            AND len(list_intersect(a.s, b.s)) * 1.0
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                >= 0.5
        ),
        j AS (
          SELECT coalesce(c.id_a, t.id_a) AS id_a,
                 c.id_a IS NOT NULL AS in_c, t.id_a IS NOT NULL AS in_t
          FROM cand c FULL OUTER JOIN truth t
            ON c.id_a = t.id_a AND c.id_b = t.id_b
        ),
        agg AS (
          SELECT CAST(sum(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_candidates,
                 CAST(sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true,
                 CAST(sum(CASE WHEN in_c AND in_t THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_hit
          FROM j
        )
        SELECT n_candidates, n_true, n_hit,
               n_candidates - n_hit AS n_false,
               n_true - n_hit AS n_missed,
               CASE WHEN n_candidates > 0
                    THEN round(n_hit * 1.0 / n_candidates, 6) END AS precision,
               CASE WHEN n_true > 0
                    THEN round(n_hit * 1.0 / n_true, 6) END AS recall
        FROM agg
    """

    # sampled dial: shadow `documents` with the identical md5 draw the
    # operator applies (first 8 hex chars of md5('<seed>:<id>') as a
    # uniform 32-bit fraction), then reuse the full-report SQL verbatim
    o["doc_minhash_quality_sampled"] = o["doc_minhash_quality"].replace(
        "WITH cand AS",
        """WITH documents AS (
          SELECT * FROM main.documents  -- base view; the CTE shadows it below
          WHERE ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                / 4294967296.0 < 0.5
        ),
        cand AS""",
        1,
    )

    o["doc_graph_profile"] = (
        CC
        + """,
        deg AS (SELECT a, count(DISTINCT b) AS k FROM edges GROUP BY a),
        dh AS (
          SELECT 'degree' AS metric, k, CAST(count(*) AS BIGINT) AS n
          FROM deg GROUP BY k
        ),
        cs AS (SELECT component, count(*) AS k FROM comp GROUP BY component),
        ch AS (
          SELECT 'component' AS metric, k, CAST(count(*) AS BIGINT) AS n
          FROM cs GROUP BY k
        )
        SELECT metric, CAST(k AS BIGINT) AS k, n FROM dh
        UNION ALL
        SELECT metric, CAST(k AS BIGINT) AS k, n FROM ch
        """
    )

    o["doc_graph_profile_indexed"] = o["doc_graph_profile"]
