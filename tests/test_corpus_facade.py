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
