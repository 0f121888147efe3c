"""Shared constants of the driver gate: every literal that BOTH the
Spark queries() registry and the DuckDB oracle_sql() registry
interpolate (time bounds, rule tables, query-term sets, thresholds).
One definition site so the two sides can never drift — the split of
the former __spark_entry__.py monolith (VERDICT r9 task 9)."""

from __future__ import annotations

# Fixed query constants (UTC epoch seconds; events span 2024-01-01..30).
T0 = 1704672000.0  # 2024-01-08
T1 = 1705881600.0  # 2024-01-22
T_ASOF = 1705276800.0  # 2024-01-15
GRID_STEP = 86400.0
DEADTIME = 3600.0
DEADBAND = 25.0
# W1 exact-compression constants: ~4-day window vs the data's ~1.5-day median
# event spacing, so the limbo path genuinely collapses bursts (6212 of 10000
# rows survive at sf0.01) instead of degenerating to keep-everything
COMPRESS_DEADTIME = 4 * 86400.0
COMPRESS_DEADBAND = 25.0
HEARTBEAT = 172800.0  # 2-day forced-heartbeat floor (24 h in the reference)
ASOF_LOOKBACK = 2 * HEARTBEAT  # heartbeat-bounded as-of seed scan (W3-exact)
SESSION_GAP = 2 * 86400.0  # sessionization gap (burst/quiet segmentation)
ALARM_TRIP = 150.0
RELATED_NODE = "S:1"
ENUM_LABELS = ("OFF", "LOW", "MED", "HIGH")


# instrument member list for the J8 position-restore query (a saved PV
# group; membership is data, not schema — arbitrary deterministic picks)
INSTRUMENT = ["EV:0:click", "EV:1:click", "EV:2:view", "EV:3:view", "EV:4:purchase"]
# alert rules keyed by event_type: (key, compare op, trippoint) — C16
ALERT_RULES = [("click", "gt", 80.0), ("view", "le", 10.0), ("purchase", "ne", 0.0)]
# ordered-funnel steps for the clickstream analytics family
FUNNEL_STEPS = ("view", "click", "purchase")
BM25_QUERY = ["spark", "merge", "window", "quantum"]  # 'quantum' absent on purpose
# standing-query set for doc_bm25_multi: a shared term ('spark' in two
# queries — its df counts once), an absent term, a single-term query
MULTI_QUERIES = {
    "engine": ["spark", "join"],
    "storage": ["table", "scan", "spark"],
    "ghost": ["quantum"],
    "solo": ["filter"],
}
# keyword-taxonomy for the doc_keyword_labels gate: overlapping term
# sets ('data' in two labels — df must count it once) + an absent term
KEYWORD_TAXONOMY = {
    "compute": ["spark", "query", "join", "data"],
    "storage": ["table", "row", "column", "data"],
    "ops": ["batch", "stream", "plasma"],
}
HIST_BINS = 20  # per-series auto-ranged value histogram bins
OUTLIER_K = 3.0  # median/MAD outlier threshold (≈2σ-equivalent for gaussians)
PROJ_DIM = 16  # signed-random-projection output dims (JL sketch of the 64-dim space)
CORR_MIN_R = 0.5  # series-correlation report threshold
RAMP_MIN_STEPS = 3  # monotone-ramp detection: min consecutive same-sign steps
BLOCKWORDS = ["error", "slow", "big"]  # C4-style blocklist (corpus vocab picks)
BLOCK_MAX_RATIO = 0.02  # keep docs at/below this blocklist hit fraction
HH_MIN_COUNT = 800  # heavy-hitter threshold (exact; CMS only prefilters)
SHIFT_WINDOW = 5  # level-shift detection: samples per side
SHIFT_THRESHOLD = 50.0  # level-shift detection: min |mean_after − mean_before|
WINNOW_MIN_SHARED = 2  # winnowing: min shared fingerprints per reported pair
WINNOW_MAX_DF = 20  # winnowing: ignore fingerprints in more docs (boilerplate)
# C17/C18 alert-mail gate: a stored template with escaped newlines (C18
# unescapes) plus every standard field and one %PV(name)% cache lookup
# (ref epicsarchiver/cache.py:662-690). Values pre-formatted %.2f so the
# Python and SQL renders agree digit-for-digit.
MAIL_LOOKUP_PV = "EV:0:click"
MAIL_TEMPLATE = (
    "Alert for %PV%!\\nValue=%VALUE% [%LABEL%]\\n"
    "Condition: %COMP% %TRIP%\\nMonitor EV:0:click=%PV(EV:0:click)%"
)
RECENT_RUNS_LIMIT = 12  # O4 recent-runs listing depth (ref pvarch.py:297-306)

# iSAX indexed series similarity (ts_sax_topk): query series, word
# shape (4 segments × 4 letters → sf0.01 nomination buckets of 10-40
# series), candidate fence, re-rank depth
SAX_QUERY_PV = "EV:0:click"
SAX_SEGMENTS = 4
SAX_ALPHABET = 4
SAX_NCAND = 128
SAX_EXPAND = 2  # iSAX neighbor radius: <=2 differing segments, adjacent letters
SAX_TOPK = 5
# incremental word-refresh gate: artifact built on points <= SAX_CUT
# (mid-window), refreshed against the full table — must equal a full
# rebuild row-for-row
SAX_CUT = 1705276800.0  # 2024-01-15, the window midpoint
# adaptive-branch gates (VERDICT r12 task 7): parameters where the
# sax_auto_params derivation CHANGES the plan at gate scale —
# fence=4 on the 750-series corpus derives (5 segments, fence 4)
# (the segment-growth branch); a 3-instant grid with fence=64 derives
# (2 segments, fence 94) (the grid-cap + fence-growth branch). The
# oracles encode the DERIVED values, so the driver certifies the
# derivation itself, not just the fixed-point case.
SAX_ADAPT_FENCE = 4
SAX_COARSE_STEP = 604800.0  # (T1-T0)/2 -> 3 grid instants
SAX_GROW_FENCE = 64
# CUSUM changepoints (ts_cusum): slack/threshold in value units vs the
# series' exact mean; (20, 200) yields a ~60-crossing list at sf0.01
CUSUM_K = 20.0
CUSUM_H = 200.0
# the explicit-reference lane (the one cusum_stream mirrors): fixed
# target near the corpus level, wider slack/threshold -> ~265 crossings
CUSUM_TARGET = 100.0
CUSUM_TK = 30.0
CUSUM_TH = 400.0
# warm-start lane (ts_cusum_warm): per-series targets from the
# backfill half (time <= CUSUM_WARM_CUT, the cusum_targets exact
# half-up grid mean), crossings detected on the live half — the batch
# twin of cusum_stream(targets=...) warm-started from a backfill
CUSUM_WARM_CUT = 1705276800.0  # 2024-01-15, the window midpoint
CUSUM_WK = 20.0
CUSUM_WH = 200.0
# HOT-SAX discords: window short enough that sf0.01's 13-point median
# series still yield full windows (window % segments == 0)
DISCORD_WINDOW = 8
DISCORD_K = 3

# boilerplate scoring on the stream-of-words corpus: fixed 16-word
# windows (no line structure to split on), corpus function words as
# the stopword set — segments with ≥2 of 16 stopwords score 'good'
BOILER_SEG_WORDS = 16
BOILER_MIN_WORDS = 8
BOILER_STOPWORDS = ("a", "the")

# related-PV probe pairs for the cross-correlation gate
_XCORR_PAIRS = [
    ("EV:0:click", "EV:0:view"),
    ("EV:0:click", "EV:100:click"),
    ("EV:101:error", "EV:0:purchase"),
    ("EV:7:view", "EV:7:click"),
]


# lineitem-derived edge list, SQL twin of __spark_entry__._edges
_EDGES_CTE = """
edges AS (
  SELECT 'P:' || l_partkey AS pv1,
         'S:' || l_suppkey AS pv2,
         l_quantity        AS score
  FROM lineitem
)
"""

