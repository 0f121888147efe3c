"""DuckDB oracles: clickstream/event gates (ev_*) — split from the former
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

    o["ev_funnel"] = f"""
        WITH ev AS (
          SELECT user_id, epoch(ts) AS t, event_type FROM events
          WHERE event_type IN ({step_list})
        ),
        {",".join(cascade)}
        {unions}
    """

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

    o["ev_funnel_times"] = f"""
        WITH ev AS (
          SELECT user_id, epoch(ts) AS t, event_type FROM events
          WHERE event_type IN ({step_list})
        ),
        {",".join(cascade)}
        {lat_unions}
    """

    o["ev_retention"] = """
        WITH base AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS wk
          FROM events
        ),
        coh AS (SELECT user_id, min(wk) AS cohort_wk FROM base GROUP BY 1)
        SELECT cohort_wk, wk - cohort_wk AS week_offset, count(*) AS n_users
        FROM base JOIN coh USING (user_id)
        GROUP BY 1, 2
    """

    o["ev_props_rollup"] = """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
               round(avg(k), 6) AS avg_k,
               max(k) AS max_k
        FROM (SELECT event_type,
                     CAST(json_extract(props, '$.k') AS DOUBLE) AS k
              FROM events) t
        GROUP BY 1
    """

    o["ev_rolling_dau"] = """
        WITH dau AS (
          SELECT day, CAST(count(*) AS BIGINT) AS dau FROM (
            SELECT DISTINCT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
                   user_id
            FROM events
          ) GROUP BY 1
        )
        SELECT day, dau,
               round(avg(dau) OVER (ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS dau_roll_avg
        FROM dau
    """

    o["ev_dau_anomalies"] = """
        WITH dau AS (
          SELECT day, CAST(count(*) AS BIGINT) AS dau FROM (
            SELECT DISTINCT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
                   user_id
            FROM events
          ) GROUP BY 1
        ), b AS (
          SELECT day, dau,
                 round(quantile_cont(dau, 0.5) OVER w, 6) AS med,
                 count(*) OVER w AS nwin
          FROM dau
          WINDOW w AS (ORDER BY day RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT day, dau,
               CASE WHEN nwin >= 7 THEN med END AS trailing_med,
               CASE WHEN nwin >= 7 AND med > 0
                    THEN round(abs(dau - med) / med, 6) END AS rel_dev,
               coalesce(CASE WHEN nwin >= 7 AND med > 0
                             THEN round(abs(dau - med) / med, 6) END > 0.25,
                        FALSE) AS is_anomaly
        FROM b
    """

    o["ev_top_paths"] = """
        WITH seqs AS (
          SELECT user_id, list(event_type ORDER BY epoch(ts), event_id) AS seq
          FROM events GROUP BY user_id
        ),
        g AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(seq) - 2, 0) + 1),
                   i -> array_to_string(list_slice(seq, i, i + 2), '>'))) AS path
          FROM seqs
        )
        SELECT path, count(*) AS n_occurrences FROM g GROUP BY path
        ORDER BY n_occurrences DESC, path LIMIT 10
    """

    o["ev_transitions"] = """
        WITH s AS (
          SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch(ts), event_id
                 ) AS src,
                 event_type AS dst
          FROM events
        ),
        c AS (
          SELECT src, dst, count(*) AS n FROM s
          WHERE src IS NOT NULL GROUP BY 1, 2
        )
        SELECT src, dst, n,
               CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
        FROM c
    """

    o["ev_attribution"] = """
        WITH t AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS vc,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch(ts), event_id
                 ) AS touch
          FROM events
        )
        SELECT coalesce(touch, '(direct)') AS touch,
               CAST(count(*) AS BIGINT) AS n_conversions,
               CAST(sum(vc) AS DOUBLE) / 100.0 AS converted_value
        FROM t WHERE event_type = 'purchase'
        GROUP BY touch
    """

    o["ev_session_stats"] = """
        WITH f AS (
          SELECT user_id, event_id, epoch(ts) AS t,
                 CASE WHEN lag(epoch(ts)) OVER w IS NULL
                        OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
                      THEN 1 ELSE 0 END AS nw
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts), event_id)
        ), s AS (
          SELECT user_id, t,
                 sum(nw) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM f
        ), ses AS (
          SELECT user_id, sid, count(*) AS n, max(t) - min(t) AS dur
          FROM s GROUP BY user_id, sid
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               round(quantile_cont(dur, 0.5), 6) AS p50_duration_s,
               round(quantile_cont(dur, 0.9), 6) AS p90_duration_s,
               round(avg(CAST(n AS DOUBLE)), 6) AS mean_events,
               round(avg(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END), 6) AS bounce_share
        FROM ses
    """

    o["ev_cohort_value"] = """
        WITH uw AS (
          SELECT user_id, CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS wk,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS wv
          FROM events GROUP BY user_id, wk
        ),
        cu AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id),
        cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
               FROM cu GROUP BY cohort),
        curve AS (
          SELECT cu.cohort, uw.wk - cu.cohort AS week_offset,
                 CAST(count(*) AS BIGINT) AS n_active, sum(uw.wv) AS tv
          FROM uw JOIN cu USING (user_id)
          GROUP BY cu.cohort, week_offset
        )
        SELECT curve.cohort AS cohort_week,
               CAST(week_offset AS INTEGER) AS week_offset,
               n_active, cohort_users,
               tv / 100.0 AS total_value,
               round(tv / 100.0 / cohort_users, 6) AS value_per_user
        FROM curve JOIN cs USING (cohort)
    """

    o["ev_inter_arrival"] = """
        WITH g AS (
          SELECT event_type,
                 epoch(ts) - lag(epoch(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch(ts), event_id
                 ) AS gap
          FROM events
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
               round(quantile_cont(gap, 0.5), 6) AS p50_gap_s,
               round(quantile_cont(gap, 0.9), 6) AS p90_gap_s,
               round(max(gap), 6) AS max_gap_s
        FROM g WHERE gap IS NOT NULL
        GROUP BY event_type
    """

    o["ev_linear_attribution"] = """
        WITH e AS (
          SELECT user_id AS u, event_id AS eid,
                 epoch_us(ts) / 1000000.0 AS t, event_type AS ty
          FROM events
        ), c AS (
          SELECT user_id AS cu, event_id AS cid,
                 epoch_us(ts) / 1000000.0 AS ct,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ), p AS (
          SELECT ty, cid,
                 (cents * 1000000) // (count(*) OVER (PARTITION BY cid))
                   AS micros
          FROM c JOIN e ON cu = u
          WHERE (t < ct OR (t = ct AND eid < cid)) AND t >= ct - 604800.0
        ), s AS (
          SELECT ty, cid, count(*) AS n, sum(micros) AS m
          FROM p GROUP BY ty, cid
        )
        SELECT ty AS event_type, CAST(sum(n) AS BIGINT) AS touches,
               CAST(count(*) AS BIGINT) AS conversions,
               round(sum(m) / 1e8, 6) AS credit
        FROM s GROUP BY ty ORDER BY event_type
    """

    o["ev_position_attribution"] = """
        WITH e AS (
          SELECT user_id AS u, event_id AS eid,
                 epoch_us(ts) / 1000000.0 AS t, event_type AS ty
          FROM events
        ), c AS (
          SELECT user_id AS cu, event_id AS cid,
                 epoch_us(ts) / 1000000.0 AS ct,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ), p AS (
          SELECT ty, cid, cents,
                 count(*) OVER (PARTITION BY cid) AS k,
                 row_number() OVER (PARTITION BY cid ORDER BY t, eid) AS rn
          FROM c JOIN e ON cu = u
          WHERE (t < ct OR (t = ct AND eid < cid)) AND t >= ct - 604800.0
        ), sh AS (
          SELECT ty, cid,
                 CASE WHEN k = 1 THEN cents * 1000000
                      WHEN k = 2 THEN (cents * 1000000) // 2
                      WHEN rn = 1 OR rn = k
                        THEN (cents * 1000000 * 40) // 100
                      ELSE (cents * 1000000 * 20) // (100 * (k - 2)) END
                   AS micros
          FROM p
        ), s AS (
          SELECT ty, cid, count(*) AS n, sum(micros) AS m
          FROM sh GROUP BY ty, cid
        )
        SELECT ty AS event_type, CAST(sum(n) AS BIGINT) AS touches,
               CAST(count(*) AS BIGINT) AS conversions,
               round(sum(m) / 1e8, 6) AS credit
        FROM s GROUP BY ty ORDER BY event_type
    """
