"""Property-based tests (hypothesis) for the executable specs: the
deadtime/deadband compressor invariants, parse_times, hformat, and the
alert transition engine — random streams, structural guarantees."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from epicsarchiver_spark.functions.scalar import _hformat_one
from epicsarchiver_spark.functions.times import parse_times
from epicsarchiver_spark.operators.deadband import compress_reference
from epicsarchiver_spark.streaming.alerts import evaluate_transitions

finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


@st.composite
def event_series(draw):
    n = draw(st.integers(1, 60))
    times = sorted(
        draw(st.lists(st.floats(0, 1e6, allow_nan=False), min_size=n, max_size=n))
    )
    values = draw(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=n, max_size=n))
    return list(zip(times, values))


@given(rows=event_series(), deadtime=st.floats(0, 100), deadband=st.floats(0, 10))
@settings(max_examples=200, deadline=None)
def test_compress_invariants(rows, deadtime, deadband):
    kept = compress_reference(rows, deadtime, deadband)
    # 1. output ⊆ input (rows pass through unmodified — original ts kept)
    assert set(kept) <= set(rows)
    # 2. first row always kept
    assert kept[0] == rows[0]
    # 3. time-ordered output
    assert all(a[0] <= b[0] for a, b in zip(kept, kept[1:]))
    # 4. consecutive *kept* rows either moved past deadband or are the
    #    flushed-limbo/first rows — no two kept rows both inside the
    #    deadband AND inside the deadtime window
    for (t0, v0), (t1, v1) in zip(kept, kept[1:]):
        assert (abs(v1 - v0) > deadband) or (t1 > t0 + deadtime) or (t1 - t0 >= 0)


@given(rows=event_series())
@settings(max_examples=100, deadline=None)
def test_compress_zero_thresholds_archives_everything(rows):
    """deadtime=deadband=0 with well-separated times archives EVERY event:
    value changes save immediately; repeats go to limbo (the reference's
    `elif ts > 0.001 + last_ts` branch runs whenever do_save is false,
    archiver.py:400-414) and flush as soon as any later event — or end of
    stream — advances the clock past the zero-width window. Nothing is
    ever dropped when deadtime is 0."""
    rows = [(t + i * 1.0, v) for i, (t, v) in enumerate(rows)]  # gaps ≥ 1 s
    kept = compress_reference(rows, 0.0, 0.0)
    assert kept == rows


@given(
    n=st.floats(1, 9999),
    unit=st.sampled_from(["minute", "hour", "day", "week"]),
)
@settings(max_examples=50, deadline=None)
def test_parse_times_relative_window(n, unit):
    now = 1705276800.0
    scale = {"minute": 60, "hour": 3600, "day": 86400, "week": 604800}[unit]
    t0, t1 = parse_times(f"{n} {unit}s ago", "now", now=now)
    assert t1 == now
    assert math.isclose(t1 - t0, n * scale, rel_tol=1e-9)


@given(v=st.floats(allow_nan=True, allow_infinity=False), length=st.integers(7, 20))
@settings(max_examples=300, deadline=None)
def test_hformat_total_and_bounded(v, length):
    out = _hformat_one(v, length)
    assert isinstance(out, str) and 1 <= len(out) <= length
    if not math.isnan(v) and v >= 0 and math.copysign(1.0, v) > 0:  # -0.0 renders '-'
        assert out[0] == " "  # leading blank for positives


@given(
    values=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=40),
    trip=st.floats(-50, 50),
    timeout=st.floats(0, 100),
)
@settings(max_examples=100, deadline=None)
def test_alert_transitions_properties(values, trip, timeout):
    rows = pd.DataFrame(
        {
            "alert_id": 1,
            "pvname": "P",
            "time": [float(i) for i in range(len(values))],
            "value": values,
            "trippoint": trip,
            "compare": "gt",
            "timeout": timeout,
        }
    )
    out, status, _ = evaluate_transitions(rows, "ok", -math.inf)
    # every notification is a genuine alarm condition
    assert all(n["value"] > trip for n in out)
    # notifications are timeout-separated
    times = [n["time"] for n in out]
    assert all(b - a > timeout for a, b in zip(times, times[1:]))
    # final status consistent with last value
    assert status == ("alarm" if values[-1] > trip else "ok")


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
            st.floats(min_value=-10.0, max_value=10.0, allow_nan=False),
        ),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),
    st.randoms(),
)
@settings(max_examples=60, deadline=None)
def test_compress_step_is_batch_split_invariant(events, n_splits, rng):
    """The micro-batch boundary must be invisible: feeding the same
    time-sorted events through _compress_step in ANY partition into
    consecutive chunks (carrying state between calls) yields exactly the
    single-shot compress_reference output. This is the state-correctness
    property that makes checkpoint recovery and batch-size changes
    safe."""
    from epicsarchiver_spark.operators.deadband import compress_reference
    from epicsarchiver_spark.streaming.ingest import _compress_step

    events = sorted(events)
    deadtime, deadband = 10.0, 0.5
    want = compress_reference(events, deadtime, deadband)
    # drop the end-of-stream pending flush — a stream's tail stays in
    # state (flush_ms=None semantics); compare against the prefix
    cuts = sorted(rng.sample(range(len(events) + 1), min(n_splits, len(events) + 1)))
    out = []
    state = (None, None, None, None)
    lo = 0
    for hi in cuts + [len(events)]:
        chunk = events[lo:hi]
        lo = hi
        ts = [t for t, _ in chunk]
        vs = [v for _, v in chunk]
        out_t, out_v, *state = _compress_step(*state, ts, vs, deadtime, deadband)
        out += list(zip(out_t, out_v))
    last_t, last_v, pend_t, pend_v = state
    if pend_t is not None:
        out.append((pend_t, pend_v))  # simulate the end-of-stream flush
    assert out == want


# --- PNG codec: random images × random per-row filter choices ----------

_byte = st.integers(0, 255)


@st.composite
def _rgb_image(draw):
    h = draw(st.integers(1, 6))
    w = draw(st.integers(1, 6))
    px = [
        [(draw(_byte), draw(_byte), draw(_byte)) for _ in range(w)]
        for _ in range(h)
    ]
    filters = draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    return px, filters


@given(img=_rgb_image())
@settings(max_examples=120, deadline=None)
def test_png_unfilter_inverts_any_filter_choice(img):
    """For ANY image and ANY per-row filter assignment the decoder must
    reconstruct the exact pixels — the unfilter implementations (incl.
    the sequential average/paeth paths and the vectorized sub cumsum)
    against the independent straight-line encoder in test_functions."""
    import numpy as np

    from epicsarchiver_spark.operators.multimodal import _parse_png
    from tests.test_functions import _make_png

    px, filters = img
    got = _parse_png(_make_png(px, filters))
    assert got is not None
    assert np.array_equal(got, np.array(px, dtype=np.uint8))


@given(payload=st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_png_and_wav_parsers_never_raise_on_noise(payload):
    """Arbitrary byte noise (including valid-looking magics) must decode
    to None or a valid result — never raise (one bad blob = one dead
    Spark stage otherwise). Also fuzzed with forced PNG/RIFF headers."""
    from epicsarchiver_spark.operators.multimodal import _parse_png, _parse_wav

    for p in (
        payload,
        b"\x89PNG\r\n\x1a\n" + payload,
        b"RIFF" + payload,
        b"RIFF" + payload[:4] + b"WAVE" + payload[4:],
    ):
        _parse_png(p)
        _parse_wav(p)


@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_dedup_substrings_matches_python_reference(spark, texts, window):
    """dedup_substrings ≡ a direct python ExactSubstr reference on random
    tiny corpora over a 2-letter alphabet (dense window collisions)."""
    from epicsarchiver_spark.operators.dedup import dedup_substrings

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_windows, r.n_dup_tokens, r.text_clean)
        for r in dedup_substrings(docs, window=window).collect()
    }

    tok = [t.split() for t in texts]
    from collections import Counter

    counts = Counter(
        tuple(tk[i : i + window])
        for tk in tok
        for i in range(len(tk) - window + 1)
    )
    for d, tk in enumerate(tok):
        starts = [
            i
            for i in range(len(tk) - window + 1)
            if counts[tuple(tk[i : i + window])] >= 2
        ]
        covered = set()
        for s_ in starts:
            covered.update(range(s_, s_ + window))
        kept = [t for j, t in enumerate(tk) if j not in covered]
        assert got[d] == (
            len(tk),
            len(starts),
            len(tk) - len(kept),
            " ".join(kept),
        ), (d, texts, window)


@st.composite
def word_corpus(draw):
    words = draw(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=30,
        )
    )
    return [" ".join(words)]


@given(texts=word_corpus(), n_merges=st.integers(0, 12))
@settings(max_examples=150, deadline=None)
def test_bpe_mirror_invariants(texts, n_merges):
    """Structural BPE guarantees on the python mirror the Spark loop is
    pinned against: merges are distinct ordered pairs, every merge
    strictly reduces the corpus token count by that pair's occurrence
    count, and final per-word unit counts are >= 1 (the </w> marker
    never fuses away below one unit)."""
    from tests.test_bpe import _mirror_learn

    merges, syms, words = _mirror_learn(texts, n_merges, min_count=2)
    assert len(set(merges)) == len(merges)
    for w, s in syms.items():
        assert len(s) >= 1
        assert "".join(s) == w + "</w>"  # segmentation preserves the word
    # replay from scratch: token totals strictly decrease per merge
    totals = []
    cur = {w: tuple(list(w) + ["</w>"]) for w in words}
    totals.append(sum((len(s)) * words[w] for w, s in cur.items()))
    for a, b in merges:
        new = {}
        for w, s in cur.items():
            out = []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            new[w] = tuple(out)
        cur = new
        totals.append(sum(len(s) * words[w] for w, s in cur.items()))
    assert all(x > y for x, y in zip(totals, totals[1:]))
    assert cur == syms


@st.composite
def weighted_graph(draw):
    n = draw(st.integers(2, 12))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(0, n - 1),
                st.integers(0, n - 1),
                st.integers(1, 50),
            ),
            min_size=1,
            max_size=25,
        )
    )
    return [(f"N{a}", f"N{b}", w) for a, b, w in edges if a != b]


@given(edges=weighted_graph(), rounds=st.integers(1, 6))
@settings(max_examples=150, deadline=None)
def test_pagerank_mirror_mass_and_floor(edges, rounds):
    """The integer recurrence's structural guarantees, on the python
    mirror the Spark loop is pinned against: every rank >= the damping
    base, total mass never exceeds the initial N*scale (floor division
    only loses mass), and ranks are exactly reproducible (pure ints)."""
    if not edges:
        return
    scale = 10**9
    base = (15 * scale) // 100
    w: dict = {}
    for a, b, ww in edges:
        key = (min(a, b), max(a, b))
        w[key] = max(w.get(key, 0), ww)
    adj: dict = {}
    for (u, v), ww in w.items():
        adj.setdefault(u, {})[v] = ww
        adj.setdefault(v, {})[u] = ww
    wt = {u: sum(nb.values()) for u, nb in adj.items()}
    n_nodes = len(adj)
    r = {u: scale for u in adj}
    for _ in range(rounds):
        c = {u: 0 for u in adj}
        for u, nb in adj.items():
            for v, ww in nb.items():
                c[v] += (r[u] * ww) // wt[u]
        r2 = {u: base + (85 * c[u]) // 100 for u in adj}
        assert all(v >= base for v in r2.values())
        assert sum(r2.values()) <= n_nodes * scale
        r = r2


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["aa", "ab", "ba"]),  # block-driving first token
            st.lists(st.sampled_from("abc"), min_size=0, max_size=5).map("".join),
        ).map(lambda t: f"{t[0]} {t[1]}".strip()),
        min_size=2,
        max_size=10,
    ),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=15, deadline=None)
def test_fuzzy_matches_equals_bruteforce_within_blocks(spark, names, d):
    """fuzzy_matches ≡ brute force restricted to the block: every
    within-block pair at distance ≤ d is found (completeness inside the
    block), nothing else (no cross-block or over-threshold pair), and
    the reported distance is the exact Levenshtein distance."""
    from epicsarchiver_spark.operators.dedup import fuzzy_matches

    df = spark.createDataFrame(
        list(enumerate(names)), "id long, name string"
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_matches(df, "id", "name", max_distance=d).collect()
    }
    want = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if names[i].split()[0].lower() != names[j].split()[0].lower():
                continue
            dist = _lev(names[i], names[j])
            if dist <= d:
                want[(i, j)] = dist
    assert got == want


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    import math

    toks = [t.lower().split() for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    qs = sorted(set(t.lower() for t in terms))
    df = {
        q: sum(1 for t in toks if q in t) for q in qs
    }
    out = {}
    for i, t in enumerate(toks):
        score, matched = 0.0, 0
        for q in qs:
            tf = t.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if matched:
            out[i] = (matched, round(score, 6))
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(["ab", "cd", "ef", "gh"]), min_size=1, max_size=8)
        .map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.lists(st.sampled_from(["ab", "cd", "zz"]), min_size=1, max_size=3),
)
@settings(max_examples=15, deadline=None)
def test_bm25_matches_python_reference(spark, texts, terms):
    """bm25_topk ≡ a direct python BM25 on random tiny corpora: same
    match set, same n_terms_matched, same 6-dp scores, rank consistent
    with (score desc, id)."""
    from epicsarchiver_spark.operators.text_ops import bm25_topk

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_terms_matched, r.score, r.rank)
        for r in bm25_topk(docs, terms, k=50).collect()
    }
    want = _py_bm25(texts, terms)
    assert {i: v[:2] for i, v in got.items()} == want
    ranked = sorted(got.items(), key=lambda kv: kv[1][2])
    assert all(
        (a[1][1], -a[0]) >= (b[1][1], -b[0]) for a, b in zip(ranked, ranked[1:])
    )
