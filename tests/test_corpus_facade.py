"""CorpusPipeline facade: the release-loop call pattern end-to-end on a
small frame — artifact build-once, read-back consumers, survivor set
consistency with the verdict view, leakage gate."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epicsarchiver_spark.corpus import CorpusPipeline


@pytest.fixture(scope="module")
def docs(spark):
    words = (
        "the quick brown fox jumps over a lazy dog while morning light "
        "settles on the quiet river and small boats drift past old stone "
        "bridges carrying baskets of fresh bread toward the market square "
        "where traders call out prices and children watch the painter mix "
        "his colors beside the fountain"
    )
    rows = []
    for i in range(40):
        if i % 5 == 0 and i > 0:
            text = rows[i - 1][1]  # exact duplicate of the previous doc
        else:
            text = f"{words} chapter {i} continues with verse {i * 7} today."
        rows.append((i, text, "en", "web" if i % 2 else "code"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    return spark.createDataFrame(pdf)


def test_release_loop(spark, docs, tmp_path):
    cp = CorpusPipeline(spark, docs)

    out = cp.build_artifacts(str(tmp_path / "artifacts"))
    assert cp.artifacts == out
    # with artifacts set, shards read the persisted labels and match the
    # inline build of a fresh pipeline
    fresh = CorpusPipeline(spark, docs)
    got = {(r.shard, r.n_docs, r.n_groups) for r in cp.shards(4).collect()}
    inline = {(r.shard, r.n_docs, r.n_groups) for r in fresh.shards(4).collect()}
    assert got == inline

    v = cp.verdicts()
    surv = cp.survivors()
    assert surv.count() == v.filter(F.col("kept")).count()
    assert set(surv.columns) == set(docs.columns)
    # every exact duplicate was removed from the survivor set
    texts = [r.text for r in surv.select("text").collect()]
    assert len(texts) == len(set(texts))

    fn = {r.stage: r.n_docs for r in cp.funnel().collect()}
    assert sum(fn.values()) == 40 and fn.get("exact_dup", 0) >= 6

    # dashboards come back with the expected keying
    assert {r.source for r in cp.report().collect()} == {"web", "code"}
    mix = {r.source: r.mix_weight for r in cp.mixture().collect()}
    assert set(mix) == {"web", "code"}
    tiers = cp.perplexity_tiers().select("bucket_label").distinct().collect()
    assert {r.bucket_label for r in tiers} <= {"head", "middle", "tail"}

    # leakage audit runs over the same pair lane; the minhash read-back
    # lane answers from the persisted signatures
    cp.leakage().count()
    assert cp.near_dup_pairs(lane="minhash").count() >= 0
    with pytest.raises(ValueError):
        cp.near_dup_pairs(lane="bogus")


def test_budget_prefix_matches_operator(spark, docs):
    from epicsarchiver_spark.operators.text_ops import budget_selection

    cp = CorpusPipeline(spark, docs)
    a = {(r.doc_id, r.selected) for r in cp.budget(500).collect()}
    b = {(r.doc_id, r.selected) for r in budget_selection(docs, 500).collect()}
    assert a == b


def test_splits_and_packing_views(spark, docs, tmp_path):
    """splits: every near-dup group shares one split (empty leakage by
    construction) and the artifact read-back path agrees with the
    inline build; packing: offsets tile the token stream exactly."""
    cp = CorpusPipeline(spark, docs)
    sp = cp.splits()
    assert set(sp.columns) == {"doc_id", "root", "split"}
    by_root = sp.groupBy("root").agg(F.countDistinct("split").alias("ns")).collect()
    assert all(r.ns == 1 for r in by_root)
    # the exact-dup docs (i, i-1 for i % 5 == 0) must share a split
    rows = {r.doc_id: r.split for r in sp.collect()}
    for i in range(5, 40, 5):
        assert rows[i] == rows[i - 1]

    # artifact lane reproduces the inline assignment
    art = cp.build_artifacts(str(tmp_path / "bases"))
    cp2 = CorpusPipeline(spark, docs, artifacts=art)
    assert sorted(map(tuple, cp2.splits().collect())) == sorted(
        map(tuple, sp.collect())
    )

    packs = cp.packing(seq_tokens=32, chunk_tokens=16).collect()
    # chunk stream is a contiguous tiling: offsets within a sequence
    # stay under the width, and total tokens are preserved
    assert all(0 <= r.seq_offset < 32 for r in packs)
    # reconstruct each chunk's stream offset: sorted, they must tile the
    # token stream exactly (exclusive prefix sum of chunk sizes)
    laid = sorted((r.seq_id * 32 + r.seq_offset, r.n_tokens) for r in packs)
    acc = 0
    for off, n in laid:
        assert off == acc
        acc += n


def test_perplexity_tiers_survives_pre_lm_artifacts(spark, docs, tmp_path):
    """An artifacts dir written before the bigram-LM lane (components
    only) must self-train instead of crashing on the missing tables."""
    from epicsarchiver_spark.operators import curation, dedup

    art = str(tmp_path / "old_bases")
    curation.write_components(
        dedup.connected_components_star(
            spark.createDataFrame([(0, 1)], "id_a long, id_b long")
        ),
        f"{art}/components",
    )
    cp = CorpusPipeline(spark, docs, artifacts=art)
    tiers = cp.perplexity_tiers()
    assert tiers.count() == docs.count()


def test_graph_profile_view(spark, docs):
    """The facade's graph dashboard agrees with the operator on the
    same pair lane, and its component sizes sum to the number of
    labeled (clustered) docs."""
    from epicsarchiver_spark.operators import dedup

    cp = CorpusPipeline(spark, docs)
    rows = {(r.metric, r.k): r.n for r in cp.graph().collect()}
    comp = dedup.connected_components_star(cp.near_dup_pairs())
    clustered = comp.count()
    assert sum(n * k for (m, k), n in rows.items() if m == "component") == clustered
    assert any(m == "degree" for (m, _k) in rows)


def test_leakage_audits_shipped_splits(spark, docs):
    """ADVICE r7: the release gate must be able to audit the SAME
    assignment the release ships. leakage(of_splits=True) audits the
    component-rooted splits() output and is empty by construction;
    an explicit assignment= frame that deliberately straddles a dup
    pair is caught."""
    cp = CorpusPipeline(spark, docs)
    assert cp.leakage(of_splits=True).count() == 0
    # component_splits-only kwargs must reach splits() without leaking
    # into split_leakage's signature (review r8)
    assert cp.leakage(of_splits=True, buckets=5000).count() == 0

    # adversarial explicit assignment: split every near-dup pair apart
    pairs = cp.near_dup_pairs()
    first = pairs.select("id_a", "id_b").first()
    if first is not None:
        assignment = docs.select(
            F.col("doc_id"),
            F.when(F.col("doc_id") == first.id_a, F.lit("test"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        leaks = cp.leakage(assignment=assignment).collect()
        assert sum(r.n_pairs for r in leaks) >= 1
        # a typo'd split kwarg with an explicit assignment must raise,
        # not silently vanish (review r8)
        with pytest.raises(TypeError):
            cp.leakage(assignment=assignment, buckets=5)


def test_soft_dedup_facade(spark, docs, tmp_path):
    """soft_dedup: rank caps hold per group, m=1 equals hard dedup's
    keep-min-id, and the artifact lane matches the inline components."""
    cp = CorpusPipeline(spark, docs)
    sd = cp.soft_dedup(max_per_group=2)
    assert set(sd.columns) == {"doc_id", "group_root", "rank_in_group", "kept"}
    rows = sd.collect()
    assert all(r.kept == (r.rank_in_group <= 2) for r in rows)
    # exact-dup pairs (i, i-1 for i % 5 == 0) share a group, and every
    # group keeps exactly min(2, |group|) members
    by_id = {r.doc_id: r for r in rows}
    for i in range(5, 40, 5):
        assert by_id[i].group_root == by_id[i - 1].group_root
    sizes: dict = {}
    kept_n: dict = {}
    for r in rows:
        sizes[r.group_root] = sizes.get(r.group_root, 0) + 1
        kept_n[r.group_root] = kept_n.get(r.group_root, 0) + int(r.kept)
    assert all(kept_n[g] == min(2, sz) for g, sz in sizes.items())
    # m=1 keeps exactly the min id of every group
    hard = cp.soft_dedup(max_per_group=1)
    kept1 = {r.doc_id for r in hard.collect() if r.kept}
    roots = {}
    for r in rows:
        roots.setdefault(r.group_root, []).append(r.doc_id)
    assert kept1 == {min(v) for v in roots.values()}
