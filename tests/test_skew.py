"""Salted aggregation must be result-identical to the direct aggregate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from epicsarchiver_spark.operators.skew import skew_safe_counts
from epicsarchiver_spark.operators.timeseries import minmax_times


def test_skew_safe_counts_matches_direct(spark):
    # one hot key (90% of rows) + several cold ones
    rows = [("HOT", float(i), float(i % 5)) for i in range(9000)]
    rows += [(f"COLD:{j}", float(i), 1.0) for j in range(10) for i in range(100)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["pvname", "time", "value"]))
    df = df.withColumn("event_id", df["time"].cast("long"))

    direct = {
        (r.pvname): (r.t_first, r.t_last, r.n_points) for r in minmax_times(df).collect()
    }
    salted = {
        (r.pvname): (r.t_first, r.t_last, r.n_points)
        for r in skew_safe_counts(df).collect()
    }
    assert direct == salted
    assert salted["HOT"] == (0.0, 8999.0, 9000)


def test_fuzzy_matches_hot_block_fence(spark):
    """A block over max_block contributes NO pairs (whole-block drop —
    MOSS max_df discipline, row-order-independent), cool blocks are
    unaffected, the report lane lists exactly the fenced blocks, and
    max_block=None disables the fence."""
    from epicsarchiver_spark.operators.dedup import (
        fuzzy_blocks_oversize,
        fuzzy_matches,
    )

    rows = [(i, f"maria v{i:03d}") for i in range(50)]  # hot block: 50 rows
    rows += [(100, "zed a01"), (101, "zed a02")]        # cool block: 1 pair
    df = spark.createDataFrame(rows, "id long, name string")

    fenced = fuzzy_matches(df, "id", "name", max_distance=2, max_block=10)
    got = {(r.id_a, r.id_b) for r in fenced.collect()}
    assert got == {(100, 101)}  # every maria-pair fenced out

    report = fuzzy_blocks_oversize(df, "id", "name", max_block=10).collect()
    assert [(r.block_key, r.n_records) for r in report] == [("maria", 50)]

    unfenced = fuzzy_matches(df, "id", "name", max_distance=2, max_block=None)
    n_maria = unfenced.filter("name_a LIKE 'maria%'").count()
    assert n_maria > 0 and unfenced.count() == n_maria + 1

    # fence boundary is inclusive: a block of exactly max_block survives
    at_cap = fuzzy_matches(df, "id", "name", max_distance=2, max_block=50)
    assert at_cap.count() == unfenced.count()


def test_resolve_entities_transitive_chains_and_singletons(spark):
    """A~B~C resolves into ONE cluster even though d(A,C)=2 exceeds the
    per-pair bound; unmatched records canonicalize to themselves."""
    from pyspark.sql import functions as F

    from epicsarchiver_spark.operators.dedup import resolve_entities

    rows = [
        (10, "smith aa"),  # chain: 10~11 (1 edit), 11~12 (1 edit), 10!~12
        (11, "smith ab"),
        (12, "smith bb"),
        (20, "jones xx"),  # singleton
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = resolve_entities(
        df, id_col="id", name_col="name",
        block=F.expr("substr(name, 1, 5)"), max_distance=1,
    ).collect()
    got = {r.id: (r.canonical_id, r.cluster_size) for r in out}
    assert got[10] == (10, 3) and got[11] == (10, 3) and got[12] == (10, 3)
    assert got[20] == (20, 1)
    assert len(out) == 4  # full spine, no drops


def test_triangle_stats_known_graphs(spark):
    """Hand graphs: a triangle (coefficient 1 everywhere), a path
    (0 everywhere), and a clique-plus-tail (the tail drops the hub's
    coefficient below 1)."""
    from epicsarchiver_spark.operators.dedup import triangle_stats

    def run(edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {r.id: (r.degree, r.n_triangles, r.clustering)
                for r in triangle_stats(df).collect()}

    tri = run([(1, 2), (2, 3), (3, 1)])
    assert tri == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}

    path = run([(1, 2), (2, 3), (3, 4)])
    assert all(v[1] == 0 and v[2] == 0.0 for v in path.values())
    assert path[2][0] == 2

    # K3 {1,2,3} plus tail 3-4; duplicate/reversed edges must not
    # double-count
    hub = run([(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 3)])
    assert hub[3] == (3, 1, round(2 * 1 / (3 * 2), 6))
    assert hub[4] == (1, 0, 0.0)


def test_triangle_stats_super_node_fence(spark):
    """A hub wired to everything would generate deg² wedges; the fence
    removes it WITH its edges, leaving the residual graph's triangles
    intact and auditable via triangle_supernodes."""
    from epicsarchiver_spark.operators.dedup import (
        triangle_stats,
        triangle_supernodes,
    )

    # hub 99 touches 10 nodes; besides it, only the triangle {1,2,3}
    edges = [(99, i) for i in range(1, 11)] + [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fenced = {r.id: (r.degree, r.n_triangles)
              for r in triangle_stats(df, max_degree=5).collect()}
    assert 99 not in fenced
    assert fenced[1] == (2, 1) and fenced[2] == (2, 1) and fenced[3] == (2, 1)
    dropped = triangle_supernodes(df, max_degree=5).collect()
    assert [(r.id, r.degree) for r in dropped] == [(99, 10)]
    # unfenced still counts hub triangles (99-1-2 etc. are NOT triangles
    # here since 1..10 are only wired to the hub and the {1,2,3} ring)
    full = {r.id: r.n_triangles for r in triangle_stats(df).collect()}
    assert full[99] == 3  # 99 closes {99,1,2},{99,2,3},{99,1,3}


def test_triangle_stats_from_edge_artifact_matches_inline(spark, tmp_path):
    """The write_edges → read-back lane (doc_triangles_indexed's shape)
    answers identically to the inline pair lane — messy input (dups,
    reversed orientation) canonicalizes at write time."""
    from epicsarchiver_spark.operators.dedup import triangle_stats, write_edges

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 4), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    path = str(tmp_path / "edges")
    write_edges(df, path)
    art = spark.read.parquet(path)
    assert set(art.columns) == {"u", "v"}
    # canonical: u < v, distinct
    assert art.filter(F.col("u") >= F.col("v")).count() == 0
    assert art.count() == art.distinct().count() == 6

    inline = {r.id: (r.degree, r.n_triangles, r.clustering)
              for r in triangle_stats(df).collect()}
    indexed = {r.id: (r.degree, r.n_triangles, r.clustering)
               for r in triangle_stats(art, id_a="u", id_b="v").collect()}
    assert inline == indexed
