"""Hash-family machinery for MinHash / SimHash dedup — all JVM-side.

Performance-critical layout note: higher-order functions (transform/
aggregate) are interpreted, not codegen'd, and Spark does no
common-subexpression elimination across separate project expressions — so
the shingle construction MUST be materialized once (its own projection)
and the 64-function family must operate on that materialized
``array<long>`` attribute. Referencing the base column from 64 sibling
expressions is safe: CollapseProject refuses to inline non-cheap
expressions referenced more than once. Doing it wrong (family over the
raw shingle expression) recomputes shingling 64× — measured 196 s vs 8 s
on 5 000 docs.

The hash family itself is multiplication-free (xorshift mixing over
xxhash64 ⊕ salt): a bijective permutation per salt, valid for MinHash,
and immune to ANSI-mode long-overflow errors that kill an affine
(a·h+b) mod p family in Spark SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

LONG_MAX = (1 << 63) - 1
MERSENNE31 = (1 << 31) - 1  # modulus of the SQL-portable affine family


def family_salts(num_hashes: int, seed: int = 42) -> list[int]:
    """Deterministic 63-bit salts from a small LCG — no RNG state."""
    salts, x = [], seed
    for _ in range(num_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        salts.append(x)
    return salts


def affine31_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a_i, b_i) pairs for the SQL-portable MinHash family
    v = (a·(h mod p) + b) mod p, p = 2³¹−1. With a < p and h mod p < p the
    product stays < 2⁶² — exact in plain BIGINT arithmetic in BOTH Spark
    (ANSI-safe, no long overflow) and any SQL oracle engine, which is the
    whole point of this family (the xorshift family needs 64-bit
    wraparound that portable SQL cannot express)."""
    salts = family_salts(2 * num_hashes, seed)
    return [
        (salts[2 * i] % (MERSENNE31 - 1) + 1, salts[2 * i + 1] % MERSENNE31)
        for i in range(num_hashes)
    ]


def md5_hash60(c: Column) -> Column:
    """60-bit non-negative hash: first 15 hex digits of md5, base-16 →
    long. Reproducible in any SQL engine with md5() (DuckDB: fold hex
    digits with shifts) — the *oracle-portable* hash basis. JVM-side
    (md5/conv/substring are builtins); prefer xxhash64 when cross-engine
    reproducibility is not required."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# Two-lane sliding shingle fold over per-TOKEN md5 hashes — the
# oracle-portable analog of the xxhash rotl-combine. Lane math is exact
# BIGINT everywhere: lane values < 2³⁰, multipliers < 2³⁰ → products
# < 2⁶⁰. One md5 per token (never one per shingle, and no shingle-string
# materialization — that costs ~5× at sf0.1; see the module note).
P30_LO = 1073741789  # largest prime < 2^30
P30_HI = 1073741783  # second-largest prime < 2^30
R_LO = 756607081  # fold multipliers: arbitrary fixed constants < p
R_HI = 368040403
LANE_MASK = (1 << 30) - 1


def lane_lo(th: Column) -> Column:
    """Low 30-bit lane of per-token 60-bit hashes."""
    return F.transform(th, lambda h: h.bitwiseAND(F.lit(LANE_MASK)))


def lane_hi(th: Column) -> Column:
    """High 30-bit lane of per-token 60-bit hashes."""
    return F.transform(th, lambda h: F.shiftrightunsigned(h, 30))


def window_fold(lo: Column, hi: Column, k: int) -> Column:
    """Two-lane k-window rolling fold over MATERIALIZED lane arrays →
    POSITIONAL array<long>: element i (0-based) is the packed 60-bit hash
    (lo-fold + hi-fold·2³⁰) of the token window starting at i; length =
    max(n−k+1, 0). Each lane folds as acc = (acc·R + next) mod p —
    order-sensitive, exact BIGINT everywhere (lane < 2³⁰, R < 2³⁰ →
    products < 2⁶⁰), so any SQL engine reproduces it.

    ``lo``/``hi`` MUST be attributes of a child projection, not inline
    expressions: the fold references each lane k times, and CollapseProject
    would otherwise clone the whole per-token md5 pipeline into every
    reference — measured 18.7 s vs 2 s at sf0.1 for k=8 (the same pitfall
    as the module-note signature family)."""
    n = F.size(lo)
    acc_lo, acc_hi = lo, hi
    for step in range(1, k):
        tail = F.greatest(n - step, F.lit(0))
        sh_lo = F.slice(lo, step + 1, tail)
        sh_hi = F.slice(hi, step + 1, tail)
        # zip_with pads the shorter side with nulls → tail combines null
        # out; the slice below drops them while keeping position alignment
        acc_lo = F.zip_with(acc_lo, sh_lo, lambda a, b: (a * F.lit(R_LO) + b) % F.lit(P30_LO))
        acc_hi = F.zip_with(acc_hi, sh_hi, lambda a, b: (a * F.lit(R_HI) + b) % F.lit(P30_HI))
    packed = F.zip_with(acc_lo, acc_hi, lambda a, b: a + b * F.lit(1 << 30))
    return F.slice(packed, 1, F.greatest(n - (k - 1), F.lit(0)))


def window_hashes_md5(tokens_col: Column, k: int) -> Column:
    """array<string> tokens → positional array<long> k-window hashes on
    the SQL-portable md5 basis, as ONE expression. Convenient for small k
    (the k=2 MinHash shingle basis); for larger k use ``window_fold``
    over lane columns materialized in a child projection — this inline
    form re-evaluates the per-token md5 pipeline at every lane reference
    (~k× overwork; see ``window_fold``)."""
    th = F.transform(tokens_col, md5_hash60)
    return window_fold(lane_lo(th), lane_hi(th), k)


def shingle_hashes_md5(tokens_col: Column, k: int) -> Column:
    """array<string> tokens → array<long> DISTINCT k-shingle hashes on
    the SQL-portable md5 basis (the MinHash/Jaccard set); see
    ``window_hashes_md5`` for the fold mechanics."""
    return F.array_distinct(window_hashes_md5(tokens_col, k))


def hashed_shingles(shingles: Column) -> Column:
    """array<string> shingles → array<long> of xxhash64 values over the
    DISTINCT shingle set (MinHash is a set similarity). Materialize this
    as its own column before applying a signature family."""
    return F.transform(F.array_distinct(shingles), lambda s: F.xxhash64(s))


def _rotl(x: Column, r: int) -> Column:
    return F.shiftleft(x, r).bitwiseOR(F.shiftrightunsigned(x, 64 - r))


def shingle_fold_xx(th: Column, k: int) -> Column:
    """Sliding k-window hash-combine over MATERIALIZED per-token xxhash64
    values: h(i..i+k-1) = rotl(h(i..i+k-2), 13) ⊕ h(i+k-1) via zip_with.
    ``th`` should be an attribute of a child projection — the fold
    references it k+1 times (size + acc + k−1 slices), and an inline
    expression would be cloned into every reference (the
    ``window_fold``/module-note pitfall)."""
    n = F.size(th)
    acc = th
    for step in range(1, k):
        shifted = F.slice(th, step + 1, F.greatest(n - step, F.lit(0)))
        # zip_with pads the shorter side with nulls → tail combines null
        # out, filtered below
        acc = F.zip_with(acc, shifted, lambda a, b: _rotl(a, 13).bitwiseXOR(b))
    return F.filter(acc, lambda x: x.isNotNull())


def shingle_hashes_all(tokens_col: Column, k: int) -> Column:
    """array<string> tokens → array<long> of ALL k-shingle hashes (one
    per window position, duplicates kept — the multiset the repetition
    statistics need) WITHOUT materializing shingle strings: per-token
    xxhash64 once, then the ``shingle_fold_xx`` sliding combine — O(n)
    integer ops per doc instead of O(n·k) string builds (the string path
    measured ~5.6 s / 5 000 docs; this is <1 s). Rotation keeps the
    combine order-sensitive ("a b" ≠ "b a"). Single-expression form: the
    per-token hash pipeline re-evaluates at each of the fold's k+1
    references — fine for small k in one-shot stats; dedup operators use
    the layered-projection path (``operators.dedup._shingle_basis_frame``)."""
    return shingle_fold_xx(F.transform(tokens_col, lambda t: F.xxhash64(t)), k)


def shingle_hashes(tokens_col: Column, k: int) -> Column:
    """Distinct k-shingle hashes (the SET for MinHash / Jaccard); see
    ``shingle_hashes_all`` for the mechanics."""
    return F.array_distinct(shingle_hashes_all(tokens_col, k))


def _xorshift_mix(salt: int):
    """Bijective mixer: h ⊕ salt, then two xorshift rounds."""

    def f(h: Column) -> Column:
        x = h.bitwiseXOR(F.lit(salt))
        x = x.bitwiseXOR(F.shiftrightunsigned(x, 33))
        x = x.bitwiseXOR(F.shiftright(x, 17))
        return x

    return f


def minhash_signature(base_hashes: Column, num_hashes: int = 64, seed: int = 42) -> Column:
    """array<long> base hashes (a *materialized column*, see module note)
    → array<long> MinHash signature: sig_i = min over shingles of
    mix_i(h). Empty shingle sets get a Long.MaxValue sentinel."""
    return F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(base_hashes, _xorshift_mix(salt))), F.lit(LONG_MAX)
            )
            for salt in family_salts(num_hashes, seed)
        ]
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Split a signature into band-hash structs for the LSH bucket join:
    array<struct<band:int, bucket:long>>. Docs sharing any (band, bucket)
    become candidate pairs."""
    entries = []
    for band in range(bands):
        chunk = F.slice(signature, band * rows_per_band + 1, rows_per_band)
        entries.append(
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(F.concat_ws(",", F.transform(chunk, lambda x: x.cast("string")))).alias(
                    "bucket"
                ),
            )
        )
    return F.array(*entries)


def simhash64(base_hashes: Column) -> Column:
    """array<long> base hashes (materialized column) → 64-bit SimHash:
    bit j is set when Σ over shingles of ±1 (by bit j of the hash) > 0."""

    def _bit_sum(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(64):
        s = F.aggregate(base_hashes, F.lit(0), _bit_sum(j))
        bit_val = -(1 << 63) if j == 63 else (1 << j)  # bit 63 = sign bit
        out = out + F.when(s > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Arrow-vectorized fast paths
#
# The expression formulations above are pure-SQL and serve as the semantic
# reference, but a 64-function family over a shingle array is interpreted
# (higher-order fns don't codegen): ~96M expression evals for 5k docs.
# The same math over Arrow batches in numpy is ~20× faster. Shingle
# hashing stays JVM-side (xxhash64); only the salt-family min/bit-count
# runs in Python, vectorized per batch.
# ---------------------------------------------------------------------------


def minhash_signature_udf(num_hashes: int = 64, seed: int = 42, family: str = "xorshift"):
    """pandas_udf: array<long> base hashes → array<long> signature.

    family="xorshift" (default): the xorshift-mix permutation family above
    (uint64 wraparound) over 64-bit bases — fastest, not SQL-portable.
    family="affine31": v_i = (a_i·(h mod p) + b_i) mod p over p = 2³¹−1 —
    every step exact in BIGINT, so an independent SQL engine reproduces
    the signature bit-for-bit (the oracle mode; pair with md5_hash60
    bases). Empty shingle sets get a sentinel (LONG_MAX / p)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    if family == "xorshift":
        salts = np.array(family_salts(num_hashes, seed), dtype=np.uint64)

        @F.pandas_udf(ArrayType(LongType()))
        def fn(bh: pd.Series) -> pd.Series:
            sentinel = np.uint64(LONG_MAX)

            def sig(arr) -> list[int]:
                if arr is None or len(arr) == 0:
                    return [int(sentinel)] * num_hashes
                h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
                x = h[None, :] ^ salts[:, None]
                x ^= x >> np.uint64(33)
                # match the expression path: arithmetic shift on signed values
                x = (x.view(np.int64) ^ (x.view(np.int64) >> np.int64(17))).view(np.uint64)
                return x.min(axis=1).astype(np.int64).tolist()

            return bh.map(sig)

        return fn

    if family != "affine31":
        raise ValueError(f"unknown minhash family: {family!r}")

    params = affine31_params(num_hashes, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)
    b = np.array([p[1] for p in params], dtype=np.int64)
    p31 = np.int64(MERSENNE31)

    @F.pandas_udf(ArrayType(LongType()))
    def fn31(bh: pd.Series) -> pd.Series:
        def sig(arr) -> list[int]:
            if arr is None or len(arr) == 0:
                return [int(p31)] * num_hashes
            h = np.asarray(arr, dtype=np.int64) % p31
            # a < p, h < p → a·h < 2⁶² : exact in int64, same as the oracle
            v = (a[:, None] * h[None, :] + b[:, None]) % p31
            return v.min(axis=1).tolist()

        return bh.map(sig)

    return fn31


def simhash64_udf():
    """pandas_udf: array<long> base hashes → 64-bit SimHash (long)."""
    import numpy as np
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def fn(bh: pd.Series) -> pd.Series:
        bits = np.arange(64, dtype=np.uint64)

        def sig(arr) -> int:
            if arr is None or len(arr) == 0:
                return 0
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            ones = ((h[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
            votes = 2 * ones.astype(np.int64) - len(h)
            word = 0
            for j in np.nonzero(votes > 0)[0]:
                word |= 1 << int(j)
            return word - (1 << 64) if word >= (1 << 63) else word

        return bh.map(sig)

    return fn

