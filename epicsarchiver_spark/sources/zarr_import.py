"""Legacy-store import: the reference's zipped-zarr snapshot format.

The reference exports each run database to ``<dbname>_zarr.zip`` — a zarr
v2 group hierarchy ``pvarch/<pvname>/{ts, data}`` with per-PV attrs
(description, type, deadtime, deadband, graph_*), gzip-compressed chunks
(ref epicsarchiver/archiver.py:542-608 save_zarr; read back at
archiver.py:152-175). A migrating user's day-one task is pulling those
archives into the engine's points store.

The zarr library is not a dependency: zarr v2 on a ZipStore is a plain
zip whose members are ``<path>/.zarray`` JSON metadata, ``<path>/.zattrs``
JSON attributes, and numbered chunk files of compressed C-order bytes
(zarr v2 spec, https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html)
— stdlib ``zipfile``/``json``/``gzip`` + numpy decode it exactly.

Scale shape: one zip is one file, so parallelism is per-PV *within* the
zip — the PV list is read from the zip directory on the driver (cheap,
central-directory only), distributed, and each task opens the zip locally
and decodes only its PVs' chunks (``mapInPandas``; a zip member read is
seek + inflate, no full-file scan). Many runs import in parallel by
unioning per-zip frames. The zip must be visible on executors (shared
storage) — true of any distributed ingest of a single archive file.
"""

from __future__ import annotations

import gzip
import io
import json
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINTS_IMPORT_SCHEMA = (
    "pvname string, time double, value double, value_str string"
)


def _decompress(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "gzip":
        return gzip.decompress(raw)
    if cid == "zlib":
        return zlib.decompress(raw)
    raise ValueError(f"unsupported zarr compressor {cid!r} (gzip/zlib/none)")


def _read_zarr_array(zf, prefix: str) -> np.ndarray:
    """Decode a 1-D zarr v2 array from an open zipfile: .zarray metadata +
    numbered chunk files; edge chunks are padded to full chunk shape per
    the spec, so the tail is trimmed to the declared length."""
    meta = json.loads(zf.read(f"{prefix}/.zarray"))
    dtype = np.dtype(meta["dtype"])
    (n,), (c,) = meta["shape"], meta["chunks"]
    comp = meta.get("compressor")
    out = np.empty(n, dtype=dtype)
    for ci in range((n + c - 1) // c if n else 0):
        chunk = np.frombuffer(_decompress(zf.read(f"{prefix}/{ci}"), comp), dtype=dtype)
        lo = ci * c
        out[lo : min(lo + c, n)] = chunk[: min(c, n - lo)]
    return out


def zarr_zip_pvnames(zip_path: str) -> list[str]:
    """PV list from the zip central directory — no chunk reads."""
    import zipfile

    with zipfile.ZipFile(zip_path) as zf:
        return sorted(
            {
                name.split("/")[1]
                for name in zf.namelist()
                if name.startswith("pvarch/") and name.endswith("/ts/.zarray")
            }
        )


def read_zarr_zip(
    spark: SparkSession, zip_path: str, pvnames: list[str] | None = None
) -> DataFrame:
    """The reference archive as a points DataFrame ``(pvname, time,
    value, value_str)``: numeric data lands in ``value`` (double), string
    PVs keep their text in ``value_str`` with ``value`` null — the same
    split the reference makes when it tries float() per row
    (archiver.py:594-600). Times are sorted per PV (the reference argsorts
    on read, archiver.py:156-158). Decode is distributed per-PV."""
    names = pvnames if pvnames is not None else zarr_zip_pvnames(zip_path)
    name_df = spark.createDataFrame([(n,) for n in names], "pvname string")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zipfile

        with zipfile.ZipFile(zip_path) as zf:
            for pdf in batches:
                for pv in pdf["pvname"]:
                    ts = _read_zarr_array(zf, f"pvarch/{pv}/ts").astype(np.float64)
                    data = _read_zarr_array(zf, f"pvarch/{pv}/data")
                    order = ts.argsort(kind="stable")
                    ts, data = ts[order], data[order]
                    if data.dtype.kind in ("f", "i", "u"):
                        val = data.astype(np.float64)
                        val_s = pd.Series([None] * len(ts), dtype=object)
                    else:
                        text = pd.Series(data).map(
                            lambda b: b.decode("utf-8", "replace")
                            if isinstance(b, bytes)
                            else str(b)
                        )
                        num = pd.to_numeric(text, errors="coerce")
                        val = num.to_numpy(dtype=np.float64)
                        val_s = text.where(num.isna(), None)
                    yield pd.DataFrame(
                        {
                            "pvname": pv,
                            "time": ts,
                            "value": val,
                            "value_str": val_s,
                        }
                    )

    return name_df.repartition(max(1, min(len(names), 64))).mapInPandas(
        decode, schema=POINTS_IMPORT_SCHEMA
    )


def read_zarr_metadata(spark: SparkSession, zip_path: str) -> DataFrame:
    """Per-PV attrs (description, type, deadtime, deadband, graph_*) as a
    small dimension frame — the reference's pv-table columns carried in
    .zattrs (archiver.py:568-583). Tiny: read on the driver."""
    import zipfile

    rows = []
    with zipfile.ZipFile(zip_path) as zf:
        for pv in zarr_zip_pvnames(zip_path):
            try:
                attrs = json.loads(zf.read(f"pvarch/{pv}/.zattrs"))
            except KeyError:
                attrs = {}
            rows.append(
                (
                    pv,
                    attrs.get("description"),
                    attrs.get("type"),
                    float(attrs["deadtime"]) if attrs.get("deadtime") not in (None, "") else None,
                    float(attrs["deadband"]) if attrs.get("deadband") not in (None, "") else None,
                )
            )
    return spark.createDataFrame(
        rows, "pvname string, description string, type string, deadtime double, deadband double"
    )


def import_zarr_zip(
    spark: SparkSession,
    zip_path: str,
    store_path: str,
    run: str,
    n_buckets: int = 128,
) -> None:
    """zarr archive → engine points store: decode distributed, numeric
    points only (string PVs have no double value; keep them via
    read_zarr_zip directly if needed), written run/bucket-partitioned."""
    from epicsarchiver_spark.sources.points_store import write_points

    pts = read_zarr_zip(spark, zip_path).filter(F.col("value").isNotNull()).select(
        "pvname", "time", "value"
    )
    write_points(pts, store_path, run=run, n_buckets=n_buckets)


def write_zarr_zip(
    points_pdf: pd.DataFrame,
    zip_path: str,
    attrs: dict[str, dict] | None = None,
    chunk: int = 4096,
) -> None:
    """Driver-side writer of the same zarr v2 zip layout (test fixtures +
    export-back-to-reference). Mirrors save_zarr's structure: group
    ``pvarch/<pv>`` with gzip'd ``ts``/``data`` arrays and attrs
    (archiver.py:542-608). Not distributed — the reference format is a
    single zip; use the points store for engine-scale data."""
    import zipfile

    def zarray_meta(n: int, dtype: str) -> bytes:
        return json.dumps(
            {
                "zarr_format": 2,
                "shape": [n],
                "chunks": [min(chunk, max(n, 1))],
                "dtype": dtype,
                "compressor": {"id": "gzip", "level": 5},
                "fill_value": 0,
                "order": "C",
                "filters": None,
            }
        ).encode()

    def chunks_of(arr: np.ndarray, csize: int):
        for ci in range((len(arr) + csize - 1) // csize if len(arr) else 0):
            block = arr[ci * csize : (ci + 1) * csize]
            if len(block) < csize:  # zarr pads edge chunks to full shape
                pad = np.zeros(csize, dtype=arr.dtype)
                pad[: len(block)] = block
                block = pad
            yield ci, gzip.compress(block.tobytes(), 5)

    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr(".zgroup", json.dumps({"zarr_format": 2}))
        zf.writestr("pvarch/.zgroup", json.dumps({"zarr_format": 2}))
        for pv, grp in points_pdf.groupby("pvname"):
            grp = grp.sort_values("time")
            ts = grp["time"].to_numpy(dtype=np.float64)
            data = grp["value"].to_numpy(dtype=np.float64)
            base = f"pvarch/{pv}"
            zf.writestr(f"{base}/.zgroup", json.dumps({"zarr_format": 2}))
            if attrs and pv in attrs:
                zf.writestr(f"{base}/.zattrs", json.dumps(attrs[pv]))
            csize = min(chunk, max(len(ts), 1))
            for name, arr in (("ts", ts), ("data", data)):
                zf.writestr(f"{base}/{name}/.zarray", zarray_meta(len(arr), "<f8"))
                for ci, blob in chunks_of(arr, csize):
                    zf.writestr(f"{base}/{name}/{ci}", blob)
