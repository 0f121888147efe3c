"""DuckDB oracles: embedding/ANN gates (emb_*) — split from the former
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

    o["emb_quantize"] = """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), m AS (
          SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v
        )
        SELECT vec_id,
               floor(amax / 127.0 * 1e9 + 0.5) / 1e9 AS scale,
               CASE WHEN amax > 0 THEN
                 array_to_string(list_transform(v,
                   x -> CAST(floor(x / (amax / 127.0) + 0.5) AS INT)), ',')
               ELSE array_to_string(list_transform(v, x -> 0), ',')
               END AS qvec
        FROM m
    """

    o["emb_pairwise_topk"] = """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ), scored AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id,
                 list_dot_product(c.e, p.e)
                 / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(p.e, p.e)))
                   AS sim,
                 row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(c.e, p.e)
                            / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(p.e, p.e))) DESC,
                            c.vec_id
                 ) AS rn
          FROM v p JOIN v c ON p.vec_id < 5 AND c.vec_id <> p.vec_id
        )
        SELECT probe_id, corpus_id, round(sim, 6) AS cosine_sim
        FROM scored WHERE rn <= 5
    """

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

    o["emb_contamination"] = f"""
        WITH {_V},
        b AS (SELECT vec_id AS bid, e AS be FROM v WHERE vec_id % 25 = 0),
        sims AS (
          SELECT v.vec_id, round({_COS.format(a="v.e", b="b.be")}, 6) AS sim
          FROM v CROSS JOIN b
        )
        SELECT vec_id, max(sim) AS max_cosine,
               CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               max(sim) >= 0.9 AS contaminated
        FROM sims GROUP BY vec_id
    """

    _bp = _hyperplanes(64, 16, 42)  # banded: n_planes=16, bands=8 → 2 bits/band

    o["emb_cosine_neardups_banded"] = f"""
        WITH {_V},
        sig AS (
          SELECT vec_id, CAST({_sig_sql("e", _bp)} AS BIGINT) AS sig FROM v
        ),
        banded AS (
          SELECT vec_id, band, (sig >> (band * 2)) & 3 AS bits
          FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band) b
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
          FROM banded a JOIN banded b2
            ON a.band = b2.band AND a.bits = b2.bits AND a.vec_id < b2.vec_id
        )
        SELECT id_a, id_b,
               round({_COS.format(a="x.e", b="y.e")}, 6) AS cosine_sim
        FROM cand JOIN v x ON x.vec_id = cand.id_a JOIN v y ON y.vec_id = cand.id_b
        WHERE round({_COS.format(a="x.e", b="y.e")}, 6) >= 0.38
    """

    _lp = _hyperplanes(64, 8, 42)  # lsh_bucket_topk: n_planes=8, max_hamming=2

    o["emb_topk_lsh"] = f"""
        WITH {_V},
        q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        sig AS (SELECT vec_id, e, CAST({_sig_sql("e", _lp)} AS BIGINT) AS sig FROM v),
        qsig AS (SELECT CAST({_sig_sql("qe", _lp)} AS BIGINT) AS qs FROM q)
        SELECT vec_id, round({_COS.format(a="e", b="qe")}, 6) AS cosine_sim
        FROM sig, qsig, q
        WHERE bit_count(xor(sig, qs)) <= 2
        ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """

    # multi-probe LSH: same 8-plane family; the engine's hamming-ball
    # equi-join is semantically hamming(sig, psig) <= 1, which the oracle
    # states directly as the theta-join (the oracle need not be fast)
    o["emb_topk_lsh_multi"] = f"""
        WITH {_V},
        sig AS (SELECT vec_id, e, CAST({_sig_sql("e", _lp)} AS BIGINT) AS sig FROM v),
        probes AS (SELECT vec_id AS probe_id, e AS pe, sig AS psig FROM sig WHERE vec_id < 3),
        cand AS (
          SELECT p.probe_id, s.vec_id AS corpus_id,
                 round({_COS.format(a="s.e", b="p.pe")}, 6) AS cosine_sim
          FROM probes p JOIN sig s
            ON bit_count(xor(s.sig, p.psig)) <= 1 AND s.vec_id <> p.probe_id
        )
        SELECT probe_id, corpus_id, cosine_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
                                       ORDER BY cosine_sim DESC, corpus_id) AS rn
          FROM cand
        ) WHERE rn <= 5
    """

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

    # cluster assignment alone — same cell arithmetic as emb_topk_ivf
    o["emb_cell_assign"] = f"""
        WITH {_V}
        SELECT vec_id, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
        FROM (SELECT vec_id, {_score_list} AS dl FROM v)
    """

    o["emb_cell_stats"] = f"""
        WITH {_V},
        assigned AS (
          SELECT vec_id, e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
        ),
        stats AS (
          SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
                 round(avg(sqrt(list_dot_product(e, e))), 6) AS mean_norm
          FROM assigned GROUP BY cell
        ),
        ex AS (
          SELECT cell, e[CAST(t.i AS INTEGER)] AS x, CAST(t.i AS INTEGER) - 1 AS pos
          FROM assigned, range(1, 65) t(i)
        ),
        cent AS (
          SELECT cell, pos, round(avg(x), 6) AS c FROM ex GROUP BY cell, pos
        )
        SELECT s.cell, s.n_vectors, s.mean_norm, cent.pos, cent.c
        FROM stats s JOIN cent USING (cell)
    """

    o["emb_topk_ivf"] = f"""
        WITH {_V},
        q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        assigned AS (
          SELECT vec_id, e, list_position(dl, list_min(dl)) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
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
        )
        SELECT vec_id, round({_COS.format(a="e", b="qe")}, 6) AS cosine_sim
        FROM assigned, q
        WHERE cell IN (SELECT cell FROM probe)
        ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """

    # ts_cvalue oracle: the reference formatter's own outputs, recorded by
    # executing ref epicsarchiver/util.py hformat (tools/gen_hformat_vectors.py)
    # — DuckDB just serves the expected strings back as a VALUES table.
    from epicsarchiver_spark.functions.hformat_vectors import CVALUE_VECTORS

    _cvrows = ", ".join(
        "(CAST({} AS BIGINT), '{}')".format(i, exp) for i, _, exp in CVALUE_VECTORS
    )

    o["emb_cosine_neardups"] = """
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e)
                     / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                     6) AS cosine_sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.e, b.e)
                    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                    6) >= 0.38
    """

    o["emb_dedup_groups"] = """
        WITH RECURSIVE v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ), pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM v a JOIN v b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.e, b.e)
                      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                      6) >= 0.38
        ), edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ), reach(id, root) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.id
        )
        SELECT id AS vec_id, min(root) AS component FROM reach GROUP BY id
    """

    # tokens = whitespace split with empties removed — shared by the doc oracles
    TOK = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

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

    SHING2 = (
        f"list_distinct(list_transform(range(1, greatest(len({TOK}) - 1, 0) + 1), "
        f"i -> array_to_string(({TOK})[i:i+1], ' ')))"
    )

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

    # winnowing (MOSS): k=5 positional fold (same two-lane md5 machinery),
    # window-min selection, distinct fingerprint set, pair join
    _WIN_K, _WIN_W = 5, 4

    _win_lo = f"(th[i] & {LANE_MASK})"

    _win_hi = "(th[i] >> 30)"

    for _s in range(1, _WIN_K):
        _win_lo = f"(({_win_lo}) * {R_LO} + (th[i+{_s}] & {LANE_MASK})) % {P30_LO}"
        _win_hi = f"(({_win_hi}) * {R_HI} + (th[i+{_s}] >> 30)) % {P30_HI}"

    o["emb_topk_cosine"] = """
        WITH q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0
        ), scored AS (
          SELECT e.vec_id,
                 round(
                   list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv)
                   / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                            list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
          FROM embeddings e, q
        )
        SELECT vec_id, cosine_sim FROM scored
        ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """

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

    o["emb_project"] = f"""
        WITH ev AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ),
        pr AS (SELECT vec_id, [{_proj_exprs}] AS p FROM ev)
        SELECT vec_id, CAST(i AS INT) AS pos, p[i + 1] AS value
        FROM pr, range(0, {PROJ_DIM}) t(i)
    """

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

    o["emb_pq_codes"] = f"""
        WITH ev AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ),
        sl AS (SELECT vec_id, {_sl_cols} FROM ev),
        d AS (SELECT vec_id, {_d_cols} FROM sl),
        c AS (SELECT vec_id, [{_code_items}] AS codes FROM d)
        SELECT vec_id, CAST(i AS INT) AS subspace, codes[i + 1] AS code
        FROM c, range(0, 8) t(i)
    """

    # IVF-PQ end-to-end: coarse-cell probe (the emb_topk_ivf machinery)
    # + the PQ code CTEs + a query-side LUT (the same left-fold (q−c)²
    # per subspace centroid) — adc = 8 list lookups summed, ordered
    # ascending. All doubles computed by identical expression chains.
    _qsl_cols = ", ".join(f"qe[{8 * s + 1}:{8 * s + 8}] AS q{s}" for s in range(8))

    _lut_cols = ", ".join(
        "[" + ", ".join(_pq_dist(f"q{s}", cent) for cent in _pq_cb[s]) + f"] AS l{s}"
        for s in range(8)
    )

    _adc = " + ".join(f"l.l{s}[codes[{s + 1}] + 1]" for s in range(8))

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

    o["emb_ivfpq_topk"] = f"""{_ivfpq_cte}
        SELECT vec_id, round({_adc}, 6) AS adc_dist
        FROM sel, lut l
        ORDER BY {_adc}, vec_id
        LIMIT 10
    """

    # the persisted-index path answers the SAME question as the inline
    # build — one oracle serves both
    o["emb_ivfpq_index"] = o["emb_ivfpq_topk"]

    # two-stage retrieval: the SAME ADC chain nominates 50 candidates,
    # then exact cosine (the certified emb_topk_cosine formula) re-ranks
    # just those ids — quantization error fixed at the top of the list
    o["emb_ivfpq_rerank"] = f"""{_ivfpq_cte},
        cand AS (
          SELECT vec_id FROM sel, lut l
          ORDER BY {_adc}, vec_id
          LIMIT 50
        ),
        qv AS (SELECT e AS q2 FROM v WHERE vec_id = 0)
        SELECT s.vec_id,
               round({_COS.format(a="s.e", b="q2")}, 6) AS cosine_sim
        FROM (SELECT vec_id, e FROM v
              WHERE vec_id IN (SELECT vec_id FROM cand)) s, qv
        ORDER BY cosine_sim DESC, s.vec_id
        LIMIT 10
    """

    # the persisted-index two-stage path answers the SAME question
    o["emb_ivfpq_rerank_indexed"] = o["emb_ivfpq_rerank"]

    # SQ8 two-stage: corpus codes/scales exactly as emb_quantize derives
    # them, query codes by the same IEEE ops the engine runs in python
    # (max|x|, /127, floor(x/s + 0.5)); stage-1 ordering on the
    # UNROUNDED double product, stage 2 the certified exact cosine
    o["emb_sq8_rerank"] = f"""
        WITH {_V},
        m AS (
          SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax
          FROM v
        ),
        qz AS (
          SELECT vec_id,
                 floor(amax / 127.0 * 1e9 + 0.5) / 1e9 AS scale,
                 CASE WHEN amax > 0 THEN
                   list_transform(e, x -> CAST(floor(x / (amax / 127.0) + 0.5)
                                               AS BIGINT))
                 ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS q8
          FROM m
        ),
        qside AS (
          SELECT CASE WHEN amax > 0 THEN
                   list_transform(e, x -> CAST(floor(x / (amax / 127.0) + 0.5)
                                               AS BIGINT))
                 ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS q8q
          FROM m WHERE vec_id = 0
        ),
        keyed AS (
          SELECT vec_id,
                 CAST(list_sum(list_transform(range(1, len(q8) + 1),
                        i -> q8[i] * q8q[i])) AS DOUBLE) AS inn,
                 CAST(list_sum(list_transform(q8, x -> x * x)) AS DOUBLE) AS ssq
          FROM qz, qside
        ),
        cand AS (
          SELECT vec_id
          FROM keyed
          ORDER BY CASE WHEN ssq > 0 THEN inn / sqrt(ssq) ELSE -2.0 END
                   DESC, vec_id
          LIMIT 50
        ),
        qv2 AS (SELECT e AS q2 FROM v WHERE vec_id = 0)
        SELECT s.vec_id,
               round({_COS.format(a="s.e", b="q2")}, 6) AS cosine_sim
        FROM (SELECT vec_id, e FROM v
              WHERE vec_id IN (SELECT vec_id FROM cand)) s, qv2
        ORDER BY cosine_sim DESC, s.vec_id
        LIMIT 10
    """

    # the persisted-artifact stage-1 answers the SAME question
    o["emb_sq8_rerank_indexed"] = o["emb_sq8_rerank"]

    # ranking metrics with the SAME python-computed integer discount
    # table the operator embeds (no engine log2 in the DCG sums)
    from epicsarchiver_spark.operators.text_ops import dcg_discounts as _dcg_disc

    _disc20 = "[" + ", ".join(str(x) for x in _dcg_disc(20)) + "]"

    o["emb_retrieval_eval"] = f"""
        WITH {_V},
        q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
        lane AS (
          SELECT vec_id, round({_COS.format(a="e", b="qv")}, 6) AS cs
          FROM v, q
        ),
        rk AS (
          SELECT vec_id, rank FROM (
            SELECT vec_id,
                   row_number() OVER (ORDER BY cs DESC, vec_id) AS rank
            FROM lane
          ) WHERE rank <= 20
        ),
        rel AS (
          SELECT vec_id, 1 AS gain FROM embeddings
          WHERE label = (SELECT label FROM embeddings WHERE vec_id = 0)
        ),
        disc AS (SELECT {_disc20} AS dt),
        hits AS (
          SELECT r.rank, coalesce(rel.gain, 0) AS g
          FROM rk r LEFT JOIN rel USING (vec_id)
        ),
        a AS (
          SELECT CAST(sum(CAST(g AS BIGINT) * dt[rank]) AS BIGINT) AS dcg,
                 CAST(count(CASE WHEN g > 0 THEN 1 END) AS BIGINT) AS nrel,
                 min(CASE WHEN g > 0 THEN rank END) AS fr
          FROM hits, disc
        ),
        ideal AS (
          SELECT CAST(coalesce(sum(CAST(gain AS BIGINT) * dt[rn]), 0) AS BIGINT) AS idcg
          FROM (
            SELECT gain, row_number() OVER (ORDER BY gain DESC, vec_id) AS rn
            FROM rel WHERE gain > 0
            ORDER BY gain DESC, vec_id LIMIT 20
          ), disc
        )
        SELECT CAST(20 AS BIGINT) AS k,
               nrel AS n_relevant_at_k,
               round(CAST(nrel AS DOUBLE) / 20.0, 6) AS precision_at_k,
               round(CASE WHEN fr IS NOT NULL
                          THEN 1.0 / CAST(fr AS DOUBLE) ELSE 0.0 END, 6) AS mrr,
               round(CASE WHEN idcg > 0
                          THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
                          ELSE 0.0 END, 6) AS ndcg_at_k
        FROM a, ideal
    """

    # per-dim standardization: the same quantized BIGINT moments, the
    # same python-order double arithmetic (sum/n, E[x²]−m², sqrt,
    # /scale), the same (x−m)/s two-op transform
    o["emb_standardize"] = f"""
        WITH {_V},
        qv AS (
          SELECT vec_id, e,
                 list_transform(e, x ->
                   CAST(floor(abs(x * 10000.0) + 0.5) * sign(x) AS BIGINT)) AS q
          FROM v
        ),
        st AS (
          SELECT i,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(q[i]) AS BIGINT) AS sq,
                 CAST(sum(q[i] * q[i]) AS BIGINT) AS sqq
          FROM qv, range(1, 65) t(i)
          GROUP BY i
        ),
        ms AS (
          SELECT i,
                 (CAST(sq AS DOUBLE) / n) / 10000.0 AS m,
                 sqrt(greatest(CAST(sqq AS DOUBLE) / n
                      - (CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n),
                      0.0)) / 10000.0 AS s
          FROM st
        ),
        lists AS (SELECT list(m ORDER BY i) AS ml, list(s ORDER BY i) AS sl FROM ms)
        SELECT vec_id,
               CAST(i AS BIGINT) AS pos,
               CASE WHEN sl[i] > 0
                    THEN round((e[i] - ml[i]) / sl[i], 6)
                    ELSE 0.0 END AS z
        FROM qv, lists, range(1, 65) t(i)
    """

    # farthest-first traversal replayed in SQL: the recursive CTE
    # carries the seed set, each round re-scores every remaining vector
    # (min squared-L2 to the seeds via the dot-product expansion, 6-dp
    # rounded) and picks the (dist DESC, id) argmax — every round of
    # the distributed loop certified
    _kpp_d = (
        "round((SELECT min(list_dot_product(c.e, c.e)"
        " - 2 * list_dot_product(c.e, b.e)"
        " + list_dot_product(b.e, b.e))"
        " FROM v b WHERE list_contains(s.sel_ids, b.vec_id)), 6)"
    )

    o["emb_kpp_init"] = f"""
        WITH RECURSIVE {_V},
        sel(step, picked, dist, sel_ids) AS (
          (SELECT 1, vec_id, CAST(0.0 AS DOUBLE), [vec_id]
           FROM v ORDER BY vec_id LIMIT 1)
          UNION ALL
          SELECT step, picked, dist, sel_ids FROM (
            SELECT s.step + 1 AS step, c.vec_id AS picked,
                   {_kpp_d} AS dist,
                   list_append(s.sel_ids, c.vec_id) AS sel_ids,
                   row_number() OVER (ORDER BY {_kpp_d} DESC, c.vec_id) AS rn
            FROM sel s JOIN v c ON NOT list_contains(s.sel_ids, c.vec_id)
            WHERE s.step < 5
          ) WHERE rn = 1
        )
        SELECT CAST(step AS BIGINT) AS step, picked AS vec_id, dist
        FROM sel ORDER BY step
    """

    # greedy MMR replayed in SQL: the recursive CTE carries the selected
    # set as a list, each iteration re-scores the remaining candidates
    # (λ·rel − (1−λ)·max sim to selected, 6-dp-rounded cosines) and
    # picks the (score DESC, id) winner — the engine's driver-side loop
    # and this recursion walk the identical pick sequence
    _mmr_score = (
        "0.5*c.rel - 0.5*coalesce((SELECT max(ss.s) FROM sims ss"
        " WHERE ss.ia = c.id AND list_contains(s.sel_ids, ss.ib)), 0.0)"
    )

    o["emb_mmr_topk"] = f"""
        WITH RECURSIVE {_V},
        cand AS (
          SELECT vec_id AS id,
                 round({_COS.format(a="e", b="qv")}, 6) AS rel
          FROM v, (SELECT e AS qv FROM v WHERE vec_id = 0) q
          ORDER BY rel DESC, vec_id LIMIT 30
        ),
        cv AS (SELECT vec_id, e FROM v WHERE vec_id IN (SELECT id FROM cand)),
        sims AS (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 round({_COS.format(a="a.e", b="b.e")}, 6) AS s
          FROM cv a JOIN cv b ON a.vec_id <> b.vec_id
        ),
        sel(step, picked, score, sel_ids) AS (
          (SELECT 1, id, 0.5*rel, [id] FROM cand ORDER BY 0.5*rel DESC, id LIMIT 1)
          UNION ALL
          SELECT step, picked, score, sel_ids FROM (
            SELECT s.step + 1 AS step, c.id AS picked,
                   {_mmr_score} AS score,
                   list_append(s.sel_ids, c.id) AS sel_ids,
                   row_number() OVER (ORDER BY {_mmr_score} DESC, c.id) AS rn
            FROM sel s JOIN cand c ON NOT list_contains(s.sel_ids, c.id)
            WHERE s.step < 8
          ) WHERE rn = 1
        )
        SELECT CAST(step AS BIGINT) AS step, picked AS vec_id,
               round(score, 6) AS mmr_score
        FROM sel ORDER BY step
    """

    # ANN recall report: the two component oracles nest as subqueries —
    # the report is the exact overlap of their result sets
    # recall denominator = actual brute-force row count (matches the
    # engine's small-index-safe formula), not the literal k
    o["emb_ann_recall"] = f"""
        SELECT CAST(10 AS INT) AS k,
               count(l.vec_id) AS n_matched,
               count(l.vec_id) / CAST(count(*) AS DOUBLE) AS recall
        FROM ({o["emb_topk_cosine"]}) b
        LEFT JOIN ({o["emb_topk_lsh"]}) l ON b.vec_id = l.vec_id
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

    _ID_HASH60 = _HEX60_TOK.replace("md5(t)", "md5(CAST(vec_id AS VARCHAR))")

    o["emb_cell_sample"] = f"""
        WITH {_V},
        assigned AS (
          SELECT vec_id, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, {_score_list} AS dl FROM v)
        ),
        h AS (SELECT vec_id, cell, {_ID_HASH60} AS hh FROM assigned)
        SELECT vec_id, cell, CAST(rk AS INTEGER) AS rk FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY cell ORDER BY hh, vec_id) AS rk
          FROM h
        ) WHERE rk <= 4
        """

    o["emb_semantic_dedup"] = f"""
        WITH {_V},
        assigned AS (
          SELECT vec_id, e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
        ),
        pairs AS (
          SELECT a.vec_id, a.cell, b.vec_id AS bid,
                 round({_COS.format(a="a.e", b="b.e")}, 6) AS cos
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND b.vec_id < a.vec_id
        )
        SELECT vec_id, cell, min(bid) AS keep_id, max(cos) AS max_cosine,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM pairs WHERE cos >= 0.4
        GROUP BY vec_id, cell
        """

    o["emb_prototype_scores"] = f"""
        WITH {_V},
        assigned AS (
          SELECT vec_id, e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
        ),
        ex AS (
          SELECT cell, CAST(t.i AS INTEGER) - 1 AS pos, e[CAST(t.i AS INTEGER)] AS x
          FROM assigned, range(1, 65) t(i)
        ),
        cent AS (
          SELECT cell, list(round(ax, 6) ORDER BY pos) AS c
          FROM (SELECT cell, pos, avg(x) AS ax FROM ex GROUP BY cell, pos)
          GROUP BY cell
        ),
        scored AS (
          SELECT vec_id, assigned.cell,
                 round({_COS.format(a="e", b="c")}, 6) AS proto_cosine
          FROM assigned JOIN cent ON assigned.cell = cent.cell
        ),
        ranked AS (
          SELECT vec_id, cell, proto_cosine,
                 CAST(row_number() OVER (
                   PARTITION BY cell ORDER BY proto_cosine DESC, vec_id
                 ) AS INTEGER) AS rk,
                 CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_n
          FROM scored
        )
        SELECT vec_id, cell, proto_cosine, rk, cell_n,
               rk <= ceil(0.2 * cell_n) AS dropped
        FROM ranked
        """

    o["emb_kmeans_refine"] = f"""
        WITH {_V},
        assigned AS (
          SELECT vec_id, e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
        ),
        ex AS (
          SELECT cell, CAST(t.i AS INTEGER) - 1 AS pos, e[CAST(t.i AS INTEGER)] AS x
          FROM assigned, range(1, 65) t(i)
        ),
        cent AS (
          SELECT cell AS nc, list(round(ax, 6) ORDER BY pos) AS c
          FROM (SELECT cell, pos, avg(x) AS ax FROM ex GROUP BY cell, pos)
          GROUP BY cell
        ),
        scored AS (
          SELECT vec_id, nc,
                 CASE WHEN sqrt(list_dot_product(e, e))
                           * sqrt(list_dot_product(c, c)) > 0
                      THEN round({_COS.format(a="e", b="c")}, 6)
                      ELSE 0.0 END AS cs
          FROM v CROSS JOIN cent
        ),
        best AS (
          SELECT vec_id, nc, cs,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, nc) AS rk
          FROM scored
        )
        SELECT vec_id, CAST(nc AS INTEGER) AS cell, cs AS cosine
        FROM best WHERE rk = 1
        """

    o["emb_pipeline_verdicts"] = f"""
        WITH sd AS (SELECT vec_id FROM ({o["emb_semantic_dedup"]})),
        pr AS (SELECT vec_id FROM ({o["emb_prototype_scores"]}) WHERE dropped)
        SELECT e.vec_id,
               CASE WHEN sd.vec_id IS NOT NULL THEN 'semantic_dup'
                    WHEN pr.vec_id IS NOT NULL THEN 'prototype'
                    ELSE 'kept' END AS stage,
               sd.vec_id IS NULL AND pr.vec_id IS NULL AS kept
        FROM embeddings e
        LEFT JOIN sd ON e.vec_id = sd.vec_id
        LEFT JOIN pr ON e.vec_id = pr.vec_id
        """

    o["emb_cell_quality"] = f"""
        WITH per AS (
          SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
                 round(avg(proto_cosine), 6) AS mean_cohesion,
                 round(min(proto_cosine), 6) AS min_cohesion
          FROM ({o["emb_prototype_scores"]}) GROUP BY cell
        ), tot AS (SELECT sum(n_vecs) AS t FROM per)
        SELECT cell, n_vecs, mean_cohesion, min_cohesion,
               round(n_vecs / t, 6) AS share
        FROM per CROSS JOIN tot
    """

    o["emb_hard_negatives"] = f"""
        WITH vl AS (
          SELECT vec_id, CAST(label AS INTEGER) AS label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ),
        assigned AS (
          SELECT vec_id, label, e,
                 CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, label, e, {_score_list} AS dl FROM vl)
        ),
        pairs AS (
          SELECT a.vec_id, a.label, b.vec_id AS neg_id,
                 b.label AS neg_label,
                 round({_COS.format(a="a.e", b="b.e")}, 6) AS cosine
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id <> b.vec_id
               AND a.label <> b.label
        ),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY vec_id ORDER BY cosine DESC, neg_id
                 ) AS INTEGER) AS rank
          FROM pairs
        )
        SELECT vec_id, label, rank, neg_id, neg_label, cosine
        FROM ranked WHERE rank <= 5
    """

    o["emb_knn_labels"] = f"""
        WITH vl AS (
          SELECT vec_id, CAST(label AS INTEGER) AS label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ),
        assigned AS (
          SELECT vec_id, label, e,
                 CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, label, e, {_score_list} AS dl FROM vl)
        ),
        pairs AS (
          SELECT a.vec_id, a.label, b.label AS nl,
                 round({_COS.format(a="a.e", b="b.e")}, 6) AS cosine,
                 b.vec_id AS nid
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id <> b.vec_id
        ),
        sel AS (
          SELECT vec_id, label, nl FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY cosine DESC, nid
            ) AS rn FROM pairs
          ) WHERE rn <= 5
        ),
        cnt AS (
          SELECT vec_id, label, nl, count(*) AS c
          FROM sel GROUP BY vec_id, label, nl
        ),
        tot AS (
          SELECT vec_id, CAST(count(*) AS BIGINT) AS n_neighbors
          FROM sel GROUP BY vec_id
        ),
        win AS (
          SELECT vec_id, label, nl, c, row_number() OVER (
                   PARTITION BY vec_id ORDER BY c DESC, nl
                 ) AS rb
          FROM cnt
        )
        SELECT w.vec_id, w.label, CAST(nl AS INTEGER) AS predicted_label,
               CAST(c AS BIGINT) AS votes, t.n_neighbors,
               nl = w.label AS agree
        FROM win w JOIN tot t USING (vec_id) WHERE rb = 1
    """

    o["emb_dispersion"] = f"""
        WITH {_V},
        assigned AS (
          SELECT vec_id, e,
                 CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT vec_id, e, {_score_list} AS dl FROM v)
        ),
        qv AS (
          SELECT cell,
                 list_transform(e, x ->
                   CAST(floor(abs(x * 100.0) + 0.5) * sign(x) AS BIGINT)) AS qe
          FROM assigned
        ),
        ex AS (
          SELECT cell, CAST(t.i AS INTEGER) - 1 AS pos,
                 qe[CAST(t.i AS INTEGER)] AS x
          FROM qv, range(1, 65) t(i)
        ),
        pp AS (
          SELECT cell, pos, sum(x) AS sx, sum(x * x) AS sxx,
                 count(*) AS n
          FROM ex GROUP BY 1, 2
        ),
        c AS (
          SELECT cell, max(n) AS nv, sum(sx * sx) AS ns, sum(sxx) AS ss
          FROM pp GROUP BY cell
        )
        SELECT cell, CAST(nv AS BIGINT) AS n_vectors,
               CASE WHEN nv >= 2
                    THEN round(CAST(ns - ss AS DOUBLE)
                               / CAST(nv * (nv - 1) AS DOUBLE) / 10000.0, 6)
               END AS mean_pairwise_dot,
               round(CAST(ss AS DOUBLE) / CAST(nv AS DOUBLE) / 10000.0, 6)
                 AS mean_sq_norm
        FROM c
    """

    o["emb_corpus_drift"] = f"""
        WITH {_V},
        va AS (SELECT vec_id, e FROM v),
        vb AS (SELECT vec_id, e FROM v WHERE vec_id % 3 > 0),
        aa AS (
          SELECT e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT e, {_score_list} AS dl FROM va)
        ),
        ab AS (
          SELECT e, CAST(list_position(dl, list_min(dl)) AS INTEGER) AS cell
          FROM (SELECT e, {_score_list} AS dl FROM vb)
        ),
        exa AS (
          SELECT cell, CAST(t.i AS INTEGER) - 1 AS pos,
                 e[CAST(t.i AS INTEGER)] AS x
          FROM aa, range(1, 65) t(i)
        ),
        exb AS (
          SELECT cell, CAST(t.i AS INTEGER) - 1 AS pos,
                 e[CAST(t.i AS INTEGER)] AS x
          FROM ab, range(1, 65) t(i)
        ),
        ca AS (
          SELECT cell, max(n) AS n_a, list(round(ax, 6) ORDER BY pos) AS c
          FROM (SELECT cell, pos, avg(x) AS ax, count(*) AS n
                FROM exa GROUP BY cell, pos)
          GROUP BY cell
        ),
        cb AS (
          SELECT cell, max(n) AS n_b, list(round(ax, 6) ORDER BY pos) AS c
          FROM (SELECT cell, pos, avg(x) AS ax, count(*) AS n
                FROM exb GROUP BY cell, pos)
          GROUP BY cell
        ),
        j AS (
          SELECT coalesce(ca.cell, cb.cell) AS cell,
                 coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
                 ca.c AS c1, cb.c AS c2
          FROM ca FULL OUTER JOIN cb ON ca.cell = cb.cell
        ),
        tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j)
        SELECT cell, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               round(n_a / ta, 6) AS share_a,
               round(n_b / tb, 6) AS share_b,
               CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL
                         AND sqrt(list_dot_product(c1, c1))
                             * sqrt(list_dot_product(c2, c2)) > 0
                    THEN round({_COS.format(a="c1", b="c2")}, 6)
               END AS centroid_cosine
        FROM j CROSS JOIN tot
    """

    o["emb_gram_matrix"] = """
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(floor(abs(CAST(x AS DOUBLE) * 10000.0) + 0.5)
                        * sign(CAST(x AS DOUBLE)) AS BIGINT)) AS qe
          FROM embeddings
        ), ex AS (
          SELECT vec_id, CAST(t.i AS INTEGER) - 1 AS pos,
                 qe[CAST(t.i AS INTEGER)] AS qx
          FROM q, range(1, 65) t(i)
        )
        SELECT a.pos AS pos_i, b.pos AS pos_j,
               CAST(sum(a.qx * b.qx) AS BIGINT) AS sum_prod,
               CAST(sum(a.qx) AS BIGINT) AS sum_i,
               CAST(sum(b.qx) AS BIGINT) AS sum_j,
               CAST(count(*) AS BIGINT) AS n_vectors
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        GROUP BY 1, 2
    """
