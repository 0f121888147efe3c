"""The bench stdout contract — broken in r4 (raw runs on the line) and
r5 (88-entry medians dict on the line, 2,489 chars vs the driver's
2,000-char tail capture). This pins the contract so it cannot regress a
third time: the final stdout line must stay under 1,500 chars no matter
how many headline queries exist."""

import json

import bench


def _fake_timings(n: int) -> dict[str, float]:
    # worst-case realistic names/values: long-ish keys, 4-decimal floats
    return {f"doc_substring_dedup_variant_{i:03d}": 1234.5678 for i in range(n)}


def test_final_line_under_driver_window_at_current_headline_count():
    timings = {name: 12.3456 for name in bench.HEADLINE}
    timings["stream_ingest_pipeline"] = 3.4567
    timings["emb_topk_lsh_d768"] = 5.1234
    line = bench.final_stdout_line(timings, 0.1)
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == len(timings)
    assert abs(parsed["value"] - round(sum(timings.values()), 4)) < 1e-6


def test_final_line_bounded_even_at_500_queries():
    line = bench.final_stdout_line(_fake_timings(500), 1.0)
    assert len(line) < 1500, len(line)
    json.loads(line)


def test_final_line_shows_slowest_queries_first():
    timings = _fake_timings(100)
    slow_name = "doc_substring_dedup_variant_007"
    timings[slow_name] = 99999.9
    parsed = json.loads(bench.final_stdout_line(timings, 0.1))
    assert slow_name in parsed["queries"]
    assert 0 < len(parsed["queries"]) < len(timings)


def test_final_line_handles_empty_timings():
    parsed = json.loads(bench.final_stdout_line({}, 0.01))
    assert parsed["value"] == 0
    assert parsed["n_queries"] == 0


def test_every_headline_name_resolves_to_a_query():
    """bench.py silently skips unknown names (qs.get) — a typo'd
    headline entry would drop a query from the record without any
    signal. Pin the list against the registry."""
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no duplicates
