"""Driver-style correctness gate: every queries() entry with an oracle is
run on Spark AND DuckDB at sf0.01 and compared exactly (row count, column
names, order-insensitive values) — a local mirror of CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE, normalize_rows

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    import pandas as pd

    def _rows(pdf):
        # null → None uniformly (itertuples yields NaN, and NaN != NaN)
        obj = pdf.astype(object).where(pd.notna(pdf), None)
        return [tuple(r) for r in obj.itertuples(index=False, name=None)]

    spdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    scols = list(spdf.columns)
    srows = _rows(spdf)

    dpdf = duck.execute(ORACLES[name]).df()
    dcols = list(dpdf.columns)
    drows = _rows(dpdf)

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    # The driver's value-hash runs over pandas frames, so dtype differences
    # (int64 vs float64 from a DuckDB HUGEINT sum, say) fail its hash even
    # when the values compare equal in python — pin dtypes exactly.
    sdt = {c: str(spdf[c].dtype) for c in scols}
    ddt = {c: str(dpdf[c].dtype) for c in dcols}
    assert sdt == ddt, f"{name}: pandas dtype mismatch {sdt} vs {ddt}"

    snorm = normalize_rows(scols, srows)
    dnorm = normalize_rows(dcols, drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(snorm, dnorm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
