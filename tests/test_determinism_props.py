"""Property-based cross-engine tests for the determinism primitives.

Every oracle comparison in this repo rests on four primitives producing
BIT-IDENTICAL results in Spark and DuckDB: `rnd` (floor-based round),
`dsum` (scaled-int64 exact sums), `md5_int64` (portable hashing), and
`affine_hash` (MinHash families). Hypothesis drives them with random
inputs — including rounding-boundary shapes — and asserts exact
equality, with the Spark side repartitioned so partial-aggregation
order actually varies.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pypers_spark.functions.hashing import (
    affine_hash,
    duck_affine_hash,
    duck_md5_int64,
    md5_int64,
)
from pypers_spark.functions.rounding import dsum, duck_dsum, duck_rnd, rnd

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Magnitudes inside dsum's documented envelope (1e-6 quantum, int64 sums).
FLOATS = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e6, max_value=1e6
)
# Include x.5-at-the-rounding-digit shapes that historically diverge.
BOUNDARY = st.integers(min_value=-10**7, max_value=10**7).map(lambda n: n / 2e4)
TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40
)


def _duck(pdf: pd.DataFrame, sql: str):
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(sql).fetchall()


@given(xs=st.lists(FLOATS | BOUNDARY, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_rnd_bit_identical(spark, xs):
    pdf = pd.DataFrame({"i": range(len(xs)), "x": xs})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: (r["r2"], r["r4"])
        for r in sdf.select(
            "i", rnd(F.col("x"), 2).alias("r2"), rnd(F.col("x"), 4).alias("r4")
        ).collect()
    }
    want = {
        i: (r2, r4)
        for i, r2, r4 in _duck(
            pdf,
            f"SELECT i, {duck_rnd('x', 2)} AS r2, {duck_rnd('x', 4)} AS r4 FROM t",
        )
    }
    assert got == want


@given(xs=st.lists(FLOATS | BOUNDARY, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_dsum_order_free_and_bit_identical(spark, xs):
    pdf = pd.DataFrame({"x": xs})
    # repartition so Spark's partial-aggregation order differs from any
    # single-node left-to-right sum
    sdf = spark.createDataFrame(pdf).repartition(4)
    got = sdf.agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    (want,) = _duck(pdf, f"SELECT {duck_dsum('x')} AS s FROM t")[0]
    assert got == want


@given(texts=st.lists(TEXTS, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_md5_int64_bit_identical(spark, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    sdf = spark.createDataFrame(pdf)
    got = {r["i"]: r["h"] for r in sdf.select("i", md5_int64(F.col("s")).alias("h")).collect()}
    want = dict(_duck(pdf, f"SELECT i, {duck_md5_int64('s')} AS h FROM t"))
    assert got == want


@given(
    hs=st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=1, max_size=20),
    seed=st.integers(min_value=0, max_value=63),
)
@settings(**SETTINGS)
def test_affine_hash_bit_identical(spark, hs, seed):
    pdf = pd.DataFrame({"i": range(len(hs)), "h": hs})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["a"]
        for r in sdf.select("i", affine_hash(F.col("h"), seed).alias("a")).collect()
    }
    want = dict(_duck(pdf, f"SELECT i, {duck_affine_hash('h', seed)} AS a FROM t"))
    assert got == want


# PII-bearing-ish text: letters, digits, separators, @, dots — shapes that
# brush against the email/phone/IPv4 patterns without being drawn from them.
PII_ISH = st.text(
    alphabet=st.sampled_from(list("abcXY012345679 .@-_%+")), max_size=48
)


@given(texts=st.lists(PII_ISH, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_pii_patterns_cross_engine(spark, texts):
    """scrub_pii / pii_count rest on Java-regex and RE2 agreeing on the
    three PII patterns — drive both engines with adversarial near-miss
    strings and assert identical counts AND identical scrubbed text."""
    from pypers_spark.functions.text import _PII_ORDER, PII_PATTERNS, pii_count, scrub_pii

    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: (r["ne"], r["np"], r["ni"], r["scrubbed"])
        for r in sdf.select(
            "i",
            pii_count(F.col("s"), "email").alias("ne"),
            pii_count(F.col("s"), "phone").alias("np"),
            pii_count(F.col("s"), "ipv4").alias("ni"),
            scrub_pii(F.col("s")).alias("scrubbed"),
        ).collect()
    }
    scrub_sql = "s"
    for kind in _PII_ORDER:
        scrub_sql = (
            f"regexp_replace({scrub_sql}, '{PII_PATTERNS[kind]}',"
            f" '[{kind.upper()}]', 'g')"
        )
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(s, '{PII_PATTERNS[k]}')) AS INT)"
        for k in ("email", "phone", "ipv4")
    )
    want = {
        i: (ne, np_, ni, sc)
        for i, ne, np_, ni, sc in _duck(
            pdf, f"SELECT i, {counts}, {scrub_sql} FROM t"
        )
    }
    assert got == want


# --- sketch bit-primitives ---------------------------------------------------
#
# The HLL register path adds two more cross-engine primitives: the
# bucket/remainder split (mod + arithmetic shift) and rho (trailing
# zeros via lowest-set-bit + log2). Random 60-bit hashes — including
# all-trailing-zero shapes — must produce identical registers in both
# engines AND match a pure-Python bit-twiddling reference.

H60 = st.integers(min_value=0, max_value=(1 << 60) - 1)
POW2 = st.integers(min_value=0, max_value=53).map(lambda k: 1 << k)


@given(hs=st.lists(H60 | POW2, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_hll_rho_bit_identical(spark, hs):
    from pypers_spark.operators.sketches import HLL_M, HLL_P, HLL_RHO_MAX, hll_rho

    pdf = pd.DataFrame({"i": range(len(hs)), "h": hs})
    sdf = spark.createDataFrame(pdf)
    h = F.col("h")
    got = {
        r["i"]: (r["bucket"], r["rho"])
        for r in sdf.select(
            "i",
            (h % HLL_M).alias("bucket"),
            hll_rho(F.shiftright(h, HLL_P)).alias("rho"),
        ).collect()
    }

    def py_rho(h: int) -> int:
        w = h >> HLL_P
        if w == 0:
            return HLL_RHO_MAX
        return (w & -w).bit_length()  # trailing zeros + 1

    for i, h_val in enumerate(hs):
        assert got[i] == (h_val % HLL_M, py_rho(h_val)), (i, h_val)

    want = {
        i: (b, r)
        for i, b, r in _duck(
            pdf,
            f"""SELECT i, h % {HLL_M} AS bucket,
                 CASE WHEN (h >> {HLL_P}) = 0 THEN {HLL_RHO_MAX}
                      ELSE CAST(floor(log2((h >> {HLL_P}) & (-(h >> {HLL_P}))) + 0.5)
                                AS BIGINT) + 1 END AS rho
                 FROM t""",
        )
    }
    assert got == want


@given(hs=st.lists(H60, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_cms_bucket_bit_identical(spark, hs):
    """The CMS (depth, bucket) mapping — affine family mod width — is
    identical across engines for every depth."""
    from pypers_spark.operators.sketches import CMS_SEED, CMS_WIDTH

    pdf = pd.DataFrame({"i": range(len(hs)), "h": hs})
    sdf = spark.createDataFrame(pdf)
    cols = [
        (affine_hash(F.col("h"), CMS_SEED + d) % CMS_WIDTH).alias(f"b{d}")
        for d in range(4)
    ]
    got = {r["i"]: tuple(r[f"b{d}"] for d in range(4)) for r in sdf.select("i", *cols).collect()}
    sel = ", ".join(
        f"({duck_affine_hash('h', CMS_SEED + d)}) % {CMS_WIDTH} AS b{d}"
        for d in range(4)
    )
    want = {row[0]: tuple(row[1:]) for row in _duck(pdf, f"SELECT i, {sel} FROM t")}
    assert got == want


# Three more cross-engine primitives underneath the dedup/ANN families:
# normalize_text (every dedup canonical form), char_ngrams (every
# shingle-based signature), and cosine_similarity (every embedding
# operator). Alphabet is printable ASCII plus two Latin-1 letters —
# the corpus contract for the text fixtures; lower() on exotic unicode
# (e.g. U+0130) legitimately differs between ICU and the JVM and is out
# of scope for the oracle discipline.

CORPUS_TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126) | st.sampled_from("éß"),
    max_size=40,
)


@given(texts=st.lists(CORPUS_TEXTS, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_normalize_text_bit_identical(spark, texts):
    from pypers_spark.functions.text import duck_normalize_text, normalize_text

    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["n"]
        for r in sdf.select("i", normalize_text(F.col("s")).alias("n")).collect()
    }
    want = {
        i: n
        for i, n in _duck(pdf, f"SELECT i, {duck_normalize_text('s')} AS n FROM t")
    }
    assert got == want


@given(
    texts=st.lists(CORPUS_TEXTS, min_size=1, max_size=10),
    n=st.sampled_from([2, 3, 5]),
)
@settings(**SETTINGS)
def test_char_ngrams_bit_identical(spark, texts, n):
    from pypers_spark.functions.text import char_ngrams, duck_char_ngrams

    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: list(r["g"])
        for r in sdf.select("i", char_ngrams(F.col("s"), n).alias("g")).collect()
    }
    want = {
        i: list(g)
        for i, g in _duck(pdf, f"SELECT i, {duck_char_ngrams('s', n)} AS g FROM t")
    }
    assert got == want


VEC_COMPONENT = st.floats(
    allow_nan=False, allow_infinity=False, width=32, min_value=-100, max_value=100
)


@given(
    dim=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
@settings(**SETTINGS)
def test_cosine_bit_identical(spark, dim, data):
    """Left-fold dot + sqrt norms produce the SAME IEEE double in both
    engines — including the zero-norm guard — so rnd-ed cosine columns
    and τ-threshold filters cannot flip cross-engine."""
    from pypers_spark.functions.vectors import cosine_similarity, duck_cosine

    n_rows = data.draw(st.integers(min_value=1, max_value=8))
    vec = st.lists(VEC_COMPONENT, min_size=dim, max_size=dim)
    zero = st.just([0.0] * dim)
    rows = data.draw(
        st.lists(st.tuples(vec | zero, vec | zero), min_size=n_rows, max_size=n_rows)
    )
    pdf = pd.DataFrame(
        {
            "i": range(len(rows)),
            "a": [a for a, _ in rows],
            "b": [b for _, b in rows],
        }
    )
    sdf = spark.createDataFrame(
        pdf, schema="i bigint, a array<float>, b array<float>"
    )
    got = {
        r["i"]: r["c"]
        for r in sdf.select(
            "i", cosine_similarity(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    want = {
        i: c for i, c in _duck(pdf, f"SELECT i, {duck_cosine('a', 'b')} AS c FROM t")
    }
    for i in got:
        assert got[i] == want[i], (i, got[i], want[i], rows[i])
