"""DuckDB oracles: catalog/control/multimodal/sink/source/stream/store/cache gates — split from the former
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

    P = f"WITH {POINTS_ORACLE_CTE}"

    E = f"WITH {_EDGES_CTE}"

    _rules_sql = ", ".join(f"('{k}','{c}',{t})" for k, c, t in ALERT_RULES)

    _members_sql = ", ".join(f"'{m}'" for m in INSTRUMENT)

    o["mm_media_stats"] = """
        WITH media AS (
          SELECT CAST(doc_id AS VARCHAR) AS media_id,
                 ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                 CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 64 + 1 AS INT) END AS width,
                 octet_length(encode(text)) AS n_bytes
          FROM documents
        )
        SELECT kind, count(*) AS n, round(avg(n_bytes), 6) AS avg_bytes,
               max(width) AS max_width
        FROM media GROUP BY kind ORDER BY kind
    """

    # W1 oracle — an independent DuckDB implementation of the sequential
    # deadtime/deadband/limbo state machine (ref archiver.py:386-414,
    # executed-behavior semantics: non-saved changes >1 ms go to limbo and
    # flush one deadtime after the last save) as a recursive CTE: one
    # recursion step per event per series (depth = longest series, 24 at
    # sf0.01), kept rows accumulated in a struct list and unnested at the
    # end. `include_pending` distinguishes the batch operator (end-of-
    # stream flushes the tail) from the bounded streaming run
    # (flush_ms=None leaves the tail in state).
    def _compress_walk(dt: float, db: float, include_pending: bool) -> str:
        empty = "CAST([] AS STRUCT(t DOUBLE, v DOUBLE)[])"
        tail = (
            f"""w.kept || (CASE WHEN w.pend_t IS NOT NULL
                           THEN [{{'t': w.pend_t, 'v': w.pend_v}}]
                           ELSE {empty} END)"""
            if include_pending
            else "w.kept"
        )
        return f"""
        WITH RECURSIVE {POINTS_ORACLE_CTE},
        seq AS (
          SELECT pvname, time, value,
                 row_number() OVER (PARTITION BY pvname ORDER BY time) AS rn
          FROM points
        ),
        walk(pvname, rn, last_t, last_v, pend_t, pend_v, kept) AS (
          SELECT pvname, rn, time, value,
                 CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                 [{{'t': time, 'v': value}}]
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT pvname, rn,
                 CASE WHEN save THEN t ELSE lt1 END,
                 CASE WHEN save THEN v ELSE lv1 END,
                 CASE WHEN save THEN NULL WHEN t > lt1 + 0.001 THEN t
                      WHEN flush THEN NULL ELSE pend_t END,
                 CASE WHEN save THEN NULL WHEN t > lt1 + 0.001 THEN v
                      WHEN flush THEN NULL ELSE pend_v END,
                 kept
                   || (CASE WHEN flush THEN [{{'t': pend_t, 'v': pend_v}}]
                            ELSE {empty} END)
                   || (CASE WHEN save THEN [{{'t': t, 'v': v}}]
                            ELSE {empty} END)
          FROM (
            SELECT i2.*, (t > lt1 + {dt} AND abs(v - lv1) > {db}) AS save
            FROM (
              SELECT i1.*,
                     CASE WHEN flush THEN pend_t ELSE last_t END AS lt1,
                     CASE WHEN flush THEN pend_v ELSE last_v END AS lv1
              FROM (
                SELECT s.pvname, s.rn, s.time AS t, s.value AS v,
                       w.last_t, w.last_v, w.pend_t, w.pend_v, w.kept,
                       (w.pend_t IS NOT NULL AND s.time > w.last_t + {dt}) AS flush
                FROM walk w JOIN seq s ON s.pvname = w.pvname AND s.rn = w.rn + 1
              ) i1
            ) i2
          ) i3
        ),
        final AS (
          SELECT w.pvname, {tail} AS res
          FROM walk w
          JOIN (SELECT pvname, max(rn) AS mrn FROM walk GROUP BY pvname) m
            ON w.pvname = m.pvname AND w.rn = m.mrn
        )
        SELECT pvname, r.t AS time, r.v AS value
        FROM (SELECT pvname, unnest(res) AS r FROM final)
        """

    o["stream_compress"] = _compress_walk(
        COMPRESS_DEADTIME, COMPRESS_DEADBAND, include_pending=False
    )

    # --- catalog / sink / source surface -------------------------------
    _NAMES = "names AS (SELECT DISTINCT pvname FROM points)"

    o["cat_normalize"] = (
        P
        + f""",
        {_NAMES}
        SELECT pvname,
               CASE WHEN contains(trim(pvname), '.') THEN trim(pvname)
                    ELSE trim(pvname) || '.VAL' END AS normalized,
               regexp_full_match(pvname, '[A-Za-z0-9:._+\\[\\]<>;{{}}\\-]+') AS valid,
               substring(regexp_replace(pvname || ' ;comment # x', '[;#].*$', ''), 1, 4090)
                 AS cleaned
        FROM names
        """
    )

    o["cat_hashname"] = (
        P
        + f""",
        {_NAMES}
        SELECT pvname,
               CAST(list_aggregate(list_transform(
                      string_split_regex(to_base64(unhex(sha256(pvname))), ''),
                      x -> unicode(x)), 'sum') % 128 AS INT) AS bucket
        FROM names
        """
    )

    o["cat_chararray"] = (
        P
        + """
        SELECT DISTINCT event_type, event_type AS decoded FROM points
        """
    )

    _LATEST = """latest AS (
          SELECT pvname, value, event_type FROM (
            SELECT pvname, value, event_type,
                   row_number() OVER (PARTITION BY pvname ORDER BY time DESC, event_id DESC) AS rn
            FROM points
          ) WHERE rn = 1
        )"""

    o["cat_desc_join"] = (
        P
        + f""",
        {_LATEST}
        SELECT pvname || '.VAL' AS pvname,
               printf('%.2f', value) AS value,
               event_type AS description
        FROM latest
        """
    )

    o["cat_yesno_json"] = (
        P
        + """
        SELECT event_type,
               CASE WHEN count(*) % 2 = 0 THEN 'No' ELSE 'Yes' END AS odd_yn,
               '["' || event_type || '","other"]' AS enum_json,
               event_type AS roundtrip
        FROM points GROUP BY event_type
        """
    )

    o["store_roundtrip"] = P + " SELECT pvname, time, value FROM points"

    o["sink_ascii"] = (
        P
        + """
        SELECT pvname,
               printf('%.3f  %s  %s', floor(time * 1000 + 0.5) / 1000.0,
                      printf('%.2f', value),
                      strftime(make_timestamp(CAST(floor(time * 1000 + 0.5) AS BIGINT) * 1000),
                               '%Y%m%d %H%M%S')) AS line
        FROM points
        """
    )

    o["sink_saverestore"] = (
        P
        + f""",
        {_LATEST}
        SELECT printf('caput(''%s'', %s)', pvname, printf('%.2f', value)) AS line
        FROM latest
        """
    )

    o["sink_sqldump"] = (
        P
        + """
        SELECT 'INSERT INTO pvdat (pvname,ts,val) VALUES ('
               || '''' || pvname || ''','
               || '''' || printf('%.6f', time) || ''','
               || '''' || printf('%.2f', value) || ''');' AS line
        FROM points
        """
    )

    # cat_parse_times oracle: the EXECUTED reference parser's outputs at a
    # frozen clock (tools/gen_parse_time_vectors.py) served as VALUES.
    from epicsarchiver_spark.functions.parse_time_vectors import PARSE_TIME_VECTORS

    _ptrows = ", ".join(
        f"(CAST({i} AS BIGINT), {t0!r}, {t1!r})" for i, _, _, t0, t1 in PARSE_TIME_VECTORS
    )

    o["cat_parse_times"] = (
        f"SELECT vec_id, t0, t1 FROM (VALUES {_ptrows}) AS t(vec_id, t0, t1)"
    )

    o["src_pvlist"] = (
        P
        + """,
        names AS (SELECT DISTINCT pvname FROM points),
        ordered AS (SELECT pvname, row_number() OVER (ORDER BY pvname) AS rn FROM names),
        paired AS (
          SELECT a.pvname AS n1, b.pvname AS n2
          FROM ordered a JOIN ordered b ON b.rn = a.rn + 1
          WHERE a.rn % 2 = 1
        )
        SELECT least(n1 || '.VAL', n2 || '.VAL') AS pv1,
               greatest(n1 || '.VAL', n2 || '.VAL') AS pv2,
               CAST(10 AS INT) AS score
        FROM paired
        """
    )

    o["src_template"] = (
        P
        + f""",
        {_LATEST},
        names6 AS (
          SELECT pvname, rn FROM (
            SELECT pvname, row_number() OVER (ORDER BY pvname) AS rn
            FROM (SELECT DISTINCT pvname FROM points)
          ) WHERE rn <= 6
        ),
        tpl_rows AS (
          SELECT 'Main' AS section,
                 'pair ' || CAST((rn - 1) // 2 AS VARCHAR) AS description,
                 '%8.3f' AS format,
                 pvname
          FROM names6
        )
        SELECT section, description, format, r.pvname,
               printf('%.2f', l.value) AS value
        FROM tpl_rows r LEFT JOIN latest l USING (pvname)
        """
    )

    o["ctl_apply_requests"] = (
        P
        + """,
        names AS (SELECT DISTINCT pvname FROM points)
        SELECT pvname,
               CASE WHEN pvname LIKE '%:error' THEN 'no' ELSE 'yes' END AS active
        FROM names WHERE pvname NOT LIKE '%:click'
        UNION ALL SELECT 'NEW:0:added', 'yes'
        """
    )

    o["ctl_rotate_runs"] = (
        P
        + f""",
        runs AS (
          SELECT 'run_' || CAST(CAST(floor(time / 86400.0) AS BIGINT) AS VARCHAR) AS db,
                 min(time) AS start_time, max(time) AS stop_time
          FROM points GROUP BY floor(time / 86400.0)
        )
        SELECT db, start_time, stop_time FROM runs
        UNION ALL SELECT 'run_current', {T1 - 86400.0!r}, {T1!r}
        UNION ALL SELECT 'run_next', {T1!r}, 2147483647.0
        """
    )

    o["ctl_pair_increment"] = (
        E
        + """
        SELECT least(pv1, pv2) AS pv1, greatest(pv1, pv2) AS pv2,
               least(max(score) + 1, 500000) AS score
        FROM edges GROUP BY least(pv1, pv2), greatest(pv1, pv2)
        """
    )

    # position save/restore: the saved-positions dimension resolves the
    # name 'park' to its RE-SAVED timestamp T_ASOF (latest save of a name
    # wins); the restore is then the same as-of read as
    # ts_instrument_restore at that ts.
    o["ctl_position_save"] = (
        P
        + f""",
        positions(instrument, position, ts) AS (
          VALUES ('beamline', 'run', {T1!r}),
                 ('beamline', 'park', {T_ASOF!r})
        ),
        ranked AS (
          SELECT event_id, pvname, time, value,
                 row_number() OVER (PARTITION BY pvname ORDER BY time DESC, event_id DESC) AS rn
          FROM points
          WHERE time < (SELECT ts FROM positions
                        WHERE instrument = 'beamline' AND position = 'park') + 1e-4
            AND pvname IN ({_members_sql})
        )
        SELECT event_id, pvname, time, value FROM ranked WHERE rn = 1
        """
    )

    # mm_features oracle: re-derive the DeterministicFakeCodec chunk sums in
    # SQL. Text is ASCII (verified: octet_length == length for every row), so
    # unicode(char) == payload byte value; np.array_split boundaries are
    # lo_j = j*(n//8) + min(j, n%8), size_j = n//8 + (j < n%8).
    _kcols = []

    for _j in range(8):
        _kcols.append(
            f"CAST(coalesce(list_aggregate(list_slice(codes, "
            f"{_j}*(n//8) + least({_j}, n%8) + 1, "
            f"{_j}*(n//8) + least({_j}, n%8) + (n//8) + (CASE WHEN {_j} < n%8 THEN 1 ELSE 0 END)"
            f"), 'sum'), 0) % 997 AS BIGINT) AS k{_j}"
        )

    o["mm_features"] = (
        """
        WITH media AS (
          SELECT CAST(doc_id AS VARCHAR) AS media_id,
                 ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 list_transform(string_split_regex(text, ''), x -> unicode(x)) AS codes,
                 length(text) AS n
          FROM documents
        )
        SELECT media_id, kind, n_bytes, """
        + ", ".join(_kcols)
        + " FROM media"
    )

    # mm_frame_sample oracle: the fake sampler is pure arithmetic —
    # n_frames = max(1, duration_ms // every_ms); frame i covers payload
    # bytes [floor(n*i/nf), floor(n*(i+1)/nf)).
    o["mm_frame_sample"] = """
        WITH media AS (
          SELECT CAST(doc_id AS VARCHAR) AS media_id,
                 ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                 CASE WHEN doc_id % 3 <> 0 THEN CAST(n_chars * 10 AS INT) END AS duration_ms,
                 octet_length(encode(text)) AS n
          FROM documents
        ),
        f AS (
          SELECT media_id, n, greatest(1, duration_ms // 10000) AS nf
          FROM media
          WHERE kind IN ('audio', 'video') AND duration_ms IS NOT NULL AND duration_ms > 0
        ),
        expanded AS (
          SELECT media_id, n, nf, unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS i
          FROM f
        )
        SELECT media_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * 10000 AS INT) AS offset_ms,
               CAST(CAST(floor(n * (i + 1) / nf) AS BIGINT)
                    - CAST(floor(n * i / nf) AS BIGINT) AS INT) AS frame_bytes
        FROM expanded
    """

    o["cat_wildcard"] = (
        "SELECT c_custkey, c_name, c_mktsegment FROM customer "
        "WHERE c_name LIKE 'Customer#0000001%' ORDER BY c_name"
    )

    o["cat_distinct_series"] = P + "SELECT DISTINCT pvname FROM points ORDER BY pvname"

    # media aHash: 64-chunk average hash over the payload bytes (ASCII
    # text → unicode(char) == byte, the mm_features precedent); chunk j
    # covers [n*j//64, n*(j+1)//64) — all-integer bit test 64·s_j > Σs
    _ah_terms = []

    for _j in range(64):
        _val = "(-9223372036854775807 - 1)" if _j == 63 else str(1 << _j)
        _ah_terms.append(
            f"(CASE WHEN 64 * coalesce(list_aggregate(list_slice(codes, "
            f"(n * {_j}) // 64 + 1, (n * {_j + 1}) // 64), 'sum'), 0) > total "
            f"THEN {_val} ELSE 0 END)"
        )

    _AHASH_CTE = f"""
        media AS (
          SELECT CAST(doc_id AS VARCHAR) AS media_id,
                 ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                 list_transform(string_split_regex(text, ''), x -> unicode(x)) AS codes,
                 length(text) AS n
          FROM documents
        ),
        tot AS (
          SELECT media_id, kind, codes, n,
                 coalesce(list_aggregate(codes, 'sum'), 0) AS total
          FROM media
        ),
        ah AS (
          SELECT media_id, kind, CAST(n AS BIGINT) AS n_bytes,
                 CAST(CASE WHEN n = 0 THEN 0 ELSE {" + ".join(_ah_terms)} END AS BIGINT) AS ahash
          FROM tot
        )
    """

    o["mm_ahash"] = f"WITH {_AHASH_CTE} SELECT media_id, kind, n_bytes, ahash FROM ah"

    o["mm_near_dups"] = f"""
        WITH {_AHASH_CTE},
        blk AS (
          SELECT media_id, ahash, i AS blk, (ahash >> (16 * i)) & 65535 AS val
          FROM ah, range(0, 4) t(i)
        ),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                          a.ahash AS ah_a, b.ahash AS ah_b
          FROM blk a JOIN blk b
            ON a.blk = b.blk AND a.val = b.val AND a.media_id < b.media_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(ah_a, ah_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(ah_a, ah_b)) <= 3
    """

    # --- r6 gate queries for the formerly local-only SURVEY edges ---

    o["ctl_alert_mail"] = (
        P
        + f""",
        latest AS (
          SELECT pvname, event_type, time, value,
                 row_number() OVER (PARTITION BY pvname ORDER BY time DESC, event_id DESC) AS rn
          FROM points
        ),
        rules(event_type, compare, trippoint) AS (VALUES {_rules_sql}),
        look AS (
          SELECT printf('%.2f', value) AS lv FROM latest
          WHERE rn = 1 AND pvname = '{MAIL_LOOKUP_PV}'
        )
        SELECT l.pvname,
               'Alert for ' || l.pvname || '!' || chr(10) ||
               'Value=' || printf('%.2f', l.value) || ' [' || l.event_type || ']' || chr(10) ||
               'Condition: ' || r.compare || ' ' || printf('%.2f', CAST(r.trippoint AS DOUBLE)) || chr(10) ||
               'Monitor EV:0:click=' ||
               coalesce((SELECT lv FROM look), '(unknown PV {MAIL_LOOKUP_PV})') AS mail
        FROM latest l JOIN rules r USING (event_type)
        WHERE l.rn = 1 AND CASE r.compare
          WHEN 'eq' THEN l.value =  r.trippoint
          WHEN 'ne' THEN l.value <> r.trippoint
          WHEN 'le' THEN l.value <= r.trippoint
          WHEN 'lt' THEN l.value <  r.trippoint
          WHEN 'ge' THEN l.value >= r.trippoint
          WHEN 'gt' THEN l.value >  r.trippoint
          ELSE FALSE END
        """
    )

    # the same two-batch MERGE the Spark query runs, as two chained
    # full-join CTE stages (m1, m2); the within-batch duplicate edit is
    # collapsed by the l1/l2 row_number exactly as upsert_alerts does;
    # b.status IS NULL marks a key with no existing rule, so an 'edit'
    # of a missing key is a no-op (never a new row), mirroring the
    # operator's status-notnull fence
    _au_merge = """
        SELECT pvname, compare,
               coalesce(e.name, b.name) AS name,
               coalesce(e.mailto, b.mailto) AS mailto,
               coalesce(e.mailmsg, b.mailmsg) AS mailmsg,
               coalesce(e.trippoint, b.trippoint) AS trippoint,
               coalesce(e.timeout, b.timeout, 30.0) AS timeout,
               coalesce(e.active, b.active, 'yes') AS active,
               coalesce(b.status, 'ok') AS status
        FROM {base} b FULL JOIN {lat} e USING (pvname, compare)
        WHERE (e.action IS NULL OR e.action <> 'drop')
          AND (e.action IS NULL OR e.action <> 'edit' OR b.status IS NOT NULL)
    """

    o["ctl_alert_upsert"] = (
        P
        + f""",
        pvr AS (
          SELECT pvname, row_number() OVER (ORDER BY pvname) AS rnk
          FROM (SELECT DISTINCT pvname FROM points)
        ),
        base AS (
          SELECT pvname, 'gt' AS compare, 'hi:' || pvname AS name,
                 CAST(NULL AS VARCHAR) AS mailto, CAST(NULL AS VARCHAR) AS mailmsg,
                 50.0 AS trippoint, 30.0 AS timeout, 'yes' AS active, 'ok' AS status
          FROM pvr WHERE rnk <= 10
          UNION ALL
          SELECT pvname, 'lt', 'lo:' || pvname, NULL, NULL, 5.0, 30.0, 'yes', 'ok'
          FROM pvr WHERE rnk <= 3
        ),
        e1 AS (
          SELECT rnk AS id, 1.0 AS ts, 'add' AS action, pvname, 'gt' AS compare,
                 'hi2:' || pvname AS name, 'ops@example.com' AS mailto,
                 CAST(NULL AS VARCHAR) AS mailmsg, 75.0 AS trippoint,
                 CAST(NULL AS DOUBLE) AS timeout, CAST(NULL AS VARCHAR) AS active
          FROM pvr WHERE rnk BETWEEN 6 AND 12
          UNION ALL
          SELECT 100, 2.0, 'edit', pvname, 'gt', NULL, NULL, NULL, 80.0, NULL, NULL
          FROM pvr WHERE rnk = 6
        ),
        l1 AS (
          SELECT * FROM (
            SELECT e.*, row_number() OVER (
              PARTITION BY pvname, compare ORDER BY ts DESC, id DESC) AS rn
            FROM e1 e) WHERE rn = 1
        ),
        m1 AS ({_au_merge.format(base="base", lat="l1")}),
        e2 AS (
          SELECT rnk AS id, 3.0 AS ts, 'drop' AS action, pvname, 'gt' AS compare,
                 CAST(NULL AS VARCHAR) AS name, CAST(NULL AS VARCHAR) AS mailto,
                 CAST(NULL AS VARCHAR) AS mailmsg, CAST(NULL AS DOUBLE) AS trippoint,
                 CAST(NULL AS DOUBLE) AS timeout, CAST(NULL AS VARCHAR) AS active
          FROM pvr WHERE rnk <= 3
          UNION ALL
          SELECT 200, 3.0, 'edit', pvname, 'gt', NULL, NULL, NULL, 99.0, NULL, 'no'
          FROM pvr WHERE rnk = 7
          UNION ALL
          SELECT 300, 3.0, 'edit', pvname, 'gt', NULL, NULL, NULL, 55.0, NULL, NULL
          FROM pvr WHERE rnk = 13
        ),
        l2 AS (
          SELECT * FROM (
            SELECT e.*, row_number() OVER (
              PARTITION BY pvname, compare ORDER BY ts DESC, id DESC) AS rn
            FROM e2 e) WHERE rn = 1
        ),
        m2 AS ({_au_merge.format(base="m1", lat="l2")})
        SELECT pvname, compare, name, mailto, mailmsg, trippoint, timeout,
               active, status
        FROM m2 ORDER BY pvname, compare
        """
    )

    o["cat_null_norm"] = """
        WITH dirty AS (
          SELECT CASE CAST(o_orderkey % 4 AS INT)
                   WHEN 0 THEN ''
                   WHEN 1 THEN 'None'
                   WHEN 2 THEN NULL
                   ELSE o_orderpriority END AS raw
          FROM orders
        )
        SELECT CASE WHEN raw IS NULL OR lower(raw) IN ('', 'none') THEN NULL
                    ELSE raw END AS cleaned,
               count(*) AS n
        FROM dirty GROUP BY 1
        """

    o["cat_recent_runs"] = (
        P
        + f"""
        SELECT 'pvarch_' || strftime(to_timestamp(time), '%Y%m%d') AS run,
               min(time) AS t0, max(time) AS t1, count(*) AS n
        FROM points GROUP BY 1
        ORDER BY run DESC LIMIT {RECENT_RUNS_LIMIT}
        """
    )

    o["cat_row_kv"] = (
        P
        + f""",
        win AS (
          SELECT event_id, pvname, event_type, value_str FROM points
          WHERE time BETWEEN {T0} AND {T0 + 2 * 86400}
        )
        SELECT event_id, 'pvname' AS key, pvname AS value FROM win
        UNION ALL
        SELECT event_id, 'event_type' AS key, event_type AS value FROM win
        UNION ALL
        SELECT event_id, 'value_str' AS key, value_str AS value FROM win
        """
    )

    o["cache_upsert_readback"] = (
        P
        + f""",
        ranked AS (
          SELECT pvname, value, time,
                 row_number() OVER (PARTITION BY pvname ORDER BY time DESC) AS rn
          FROM points WHERE time <= {T1}
        )
        SELECT pvname, value, time FROM ranked WHERE rn = 1
        """
    )

    o["sink_ascii_roundtrip"] = (
        P
        + """
        SELECT pvname,
               CAST(printf('%.3f', floor(time * 1000 + 0.5) / 1000.0)
                    AS DOUBLE) AS time,
               printf('%.2f', value) AS value_raw,
               CAST(printf('%.2f', value) AS DOUBLE) AS value,
               strftime(make_timestamp(
                          CAST(floor(time * 1000 + 0.5) AS BIGINT) * 1000),
                        '%Y%m%d %H%M%S') AS stamp
        FROM points WHERE pvname = 'EV:0:click'
        """
    )
