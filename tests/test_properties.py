"""Hypothesis property tests over the pure-Python media helpers —
the deterministic seam stubs whose exact arithmetic both the Spark
entries and the DuckDB oracles mirror. Spark stays out of @given
bodies (per-example JVM round-trips would dominate); the Spark-side
plumbing is pinned by the hand-case and oracle tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rag_database_spark.operators import multimodal as mm

payloads = st.binary(min_size=0, max_size=4096)


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_fake_pixels_shape_and_range(payload):
    n = mm.DHASH_ROWS * (mm.DHASH_COLS + 1)
    px = mm._fake_pixels(payload, n)
    assert len(px) == n
    assert all(0 <= v <= 255 for v in px)
    assert px == mm._fake_pixels(payload, n)  # deterministic


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_fake_frame_energies_shape_and_determinism(payload):
    e = mm._fake_frame_energies(payload, mm.AUDIO_FP_FRAMES)
    assert len(e) == mm.AUDIO_FP_FRAMES
    assert all(0.0 <= v <= 255.0 for v in e)
    assert e == mm._fake_frame_energies(payload, mm.AUDIO_FP_FRAMES)


@settings(max_examples=500, deadline=None)
@given(
    payloads,
    st.integers(min_value=16, max_value=4096),
)
def test_resize_clamp_invariants(payload, max_side):
    """For any payload and clamp: output dims are >= 1, the longer
    side never exceeds max(max_side, original longer side), an
    unresized image keeps its payload byte-identical, and a resized
    stub payload is cropped to at most the new pixel budget."""
    w0, h0, nw, nh, resized, out = mm._resize_one(
        payload, "image", max_side, real=False
    )
    assert nw >= 1 and nh >= 1
    if max(w0, h0) > max_side:
        assert resized
        assert max(nw, nh) <= max_side
        # aspect preserved within integer flooring: the floored dims
        # never overshoot the exact ratio
        longer = max(w0, h0)
        assert nw <= w0 * max_side / longer + 1e-9
        assert nh <= h0 * max_side / longer + 1e-9
        assert len(out) <= nw * nh
    else:
        assert not resized and (nw, nh) == (w0, h0)
        assert out == payload


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_dhash_and_audio_fp_fit_signed_long(payload):
    """Both fingerprints stay inside 60 bits (the banded join and the
    parquet long column rely on it) and are pure functions of the
    payload."""
    n_cells = mm.DHASH_ROWS * (mm.DHASH_COLS + 1)
    px = mm._fake_pixels(payload, n_cells)
    fp = 0
    for r in range(mm.DHASH_ROWS):
        for c in range(mm.DHASH_COLS):
            row0 = r * (mm.DHASH_COLS + 1)
            if px[row0 + c + 1] > px[row0 + c]:
                fp |= 1 << (r * mm.DHASH_COLS + c)
    assert 0 <= fp < 1 << 60

    e = mm._fake_frame_energies(payload, mm.AUDIO_FP_FRAMES)
    afp = 0
    for i in range(mm.AUDIO_FP_FRAMES - 1):
        if e[i + 1] > e[i]:
            afp |= 1 << i
    assert 0 <= afp < 1 << 60


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 60) - 1))
def test_gumbel_from_60bit_hash_is_finite(h):
    """dsir_resample's noise map: EVERY 60-bit hash yields u strictly
    inside (0,1), so −ln(−ln(u)) is always finite. (The original
    60-bit map failed this: hashes within 64 of 2^60 rounded u to
    exactly 1.0 and the Gumbel blew up to +inf — hypothesis found it,
    the 52-bit map fixed it.)"""
    import math

    from rag_database_spark.operators.text_analytics import (
        DSIR_GUMBEL_DENOM, DSIR_GUMBEL_SHIFT,
    )

    u = ((h >> DSIR_GUMBEL_SHIFT) + 0.5) / DSIR_GUMBEL_DENOM
    assert 0.0 < u < 1.0
    g = -math.log(-math.log(u))
    assert math.isfinite(g)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**12),
       st.integers(min_value=1, max_value=10**6))
def test_kmeans_k_for_bounds(n, target):
    """k is at least the floor K, covers the corpus (k·target ≥ n),
    and never overshoots by more than one cluster's worth."""
    from rag_database_spark.operators.clustering import (
        KMEANS_K, kmeans_k_for,
    )

    k = kmeans_k_for(n, target)
    assert k >= KMEANS_K
    assert k * target >= n
    assert k == KMEANS_K or (k - 1) * target < n


@settings(max_examples=500, deadline=None)
@given(st.floats(min_value=-2.0, max_value=2.0,
                 allow_nan=False, allow_infinity=False))
def test_round6_pure_invariants(x):
    """_round6 (the MMR local impl's replica of Spark Round): within
    half an ulp-of-grid of the input, idempotent, sign-preserving for
    |x| >= 1e-6."""
    from rag_database_spark.operators.diversify import _round6

    r = _round6(x)
    assert abs(r - x) <= 5e-7 + 1e-12
    assert _round6(r) == r


def test_round6_matches_spark_round_on_adversarial_batch(spark):
    """One batched Spark comparison (JVM stays out of @given): exact
    agreement with F.round(col, 6) including dyadic .5-boundary
    values (0.0078125 = 2^-7 has an exact trailing 5 at the 7th
    decimal) and a seeded random sweep."""
    import random

    from pyspark.sql import functions as F

    from rag_database_spark.operators.diversify import _round6

    rng = random.Random(13)
    xs = [
        0.0078125, -0.0078125, 0.0000005, -0.0000005, 1.0000005,
        0.1, -0.1, 0.3333333333333333, 1.0 - 0.7, 0.0, 1.0, -1.0,
    ] + [rng.uniform(-1.5, 1.5) for _ in range(3000)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(xs)],
                               "i long, x double")
    got = {r["i"]: r["r"]
           for r in df.select("i", F.round("x", 6).alias("r")).collect()}
    for i, v in enumerate(xs):
        assert got[i] == _round6(v), (v, got[i], _round6(v))


def test_fold_cosine_matches_jvm_expression_batch(spark):
    """_fold_cosine (the MMR local impl's cosine) equals the JVM
    aggregate-fold expression bit-for-bit on a seeded random batch,
    including zero vectors (both sides emit 0.0)."""
    import random

    from pyspark.sql import functions as F

    from rag_database_spark.functions.vector import cosine
    from rag_database_spark.operators.diversify import _fold_cosine

    rng = random.Random(29)
    rows = []
    for i in range(400):
        a = [rng.uniform(-1, 1) for _ in range(17)]
        b = [rng.uniform(-1, 1) for _ in range(17)]
        if i % 50 == 0:
            a = [0.0] * 17
        rows.append((i, a, b))
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>"
    )
    got = {r["i"]: r["c"] for r in df.select(
        "i", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    for i, a, b in rows:
        assert got[i] == _fold_cosine(a, b), (i, got[i], _fold_cosine(a, b))


def test_exact_sum_order_free_and_matches_duckdb_batch(spark):
    """functions/exact.py contract on a seeded adversarial batch of
    2dp values: exact_sum is identical across partitionings (1/7/32),
    equals Python's Decimal total exactly, and equals DuckDB's
    DECIMAL-cast sum — the order-independence the 6dp twin rounding
    relies on at 100 TB group sizes. exact_avg = exact total / the
    NON-NULL count on both engines (r16 divisor contract)."""
    import random
    from decimal import Decimal

    import duckdb
    from pyspark.sql import functions as F

    from rag_database_spark.functions.exact import exact_avg, exact_sum

    rng = random.Random(16)
    # adversarial: many x.x5 boundary values + magnitudes spanning 6
    # orders, all exactly 2dp; a few NULLs exercise the avg divisor
    vals = [round(rng.uniform(-1e4, 1e4), 2) for _ in range(5000)]
    vals += [0.05, -0.05, 123.45, -123.45, 0.01, -0.01, 1e6 - 0.01]
    rows = [(i, v) for i, v in enumerate(vals)] + [
        (len(vals), None), (len(vals) + 1, None)
    ]
    df = spark.createDataFrame(rows, "i long, v double")
    got = {}
    for parts in (1, 7, 32):
        row = (
            df.repartition(parts)
            .agg(exact_sum("v").alias("s"), exact_avg("v").alias("a"))
            .first()
        )
        got[parts] = (row["s"], row["a"])
    assert got[1] == got[7] == got[32]
    py_total = sum(
        (Decimal(str(v)) for v in vals), start=Decimal("0")
    )
    assert got[1][0] == float(py_total)
    assert got[1][1] == float(py_total) / len(vals)  # non-null count
    duck = duckdb.sql(
        "SELECT CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s, "
        "CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(v) AS a "
        "FROM (SELECT unnest(?) AS v)",
        params=[vals + [None, None]],
    ).fetchone()
    assert duck[0] == got[1][0]
    assert duck[1] == got[1][1]
