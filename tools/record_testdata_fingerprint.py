"""Re-record tests/testdata_fingerprint.json after an intentional
driver-side testdata regeneration."""
import json
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "testdata_fingerprint.json")

fps = {}
for sf in ("0.001", "0.01", "0.1"):
    fps[sf] = {}
    for t in TABLES:
        path = f"/root/testdata/sf{sf}/{t}.parquet"
        try:
            fps[sf][t] = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{path}')"
            ).fetchone()[0]
        except duckdb.Error:
            fps[sf][t] = None
json.dump(fps, open(OUT, "w"), indent=1)
print(json.dumps(fps))
