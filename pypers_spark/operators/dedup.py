"""Deduplication operators (SURVEY.md §2.D) over the ``documents`` table.

The raw test corpus is dup-free, so every query runs on ``corpus`` =
documents ∪ a deterministically perturbed copy (uppercased + leading
whitespace, doc_id + 1_000_000). Normalization must collapse the copies —
this exercises the real dedup path end-to-end and gives the DuckDB
oracle a known-dup ground truth.

Scale design (100 TB):
- exact dedup: one hash-aggregate shuffle on the md5 fingerprint.
- MinHash+LSH: O(n·bands) — signatures are per-row column expressions
  (whole-stage codegen, no UDF), candidate pairs expand from capped
  band buckets (one groupBy, no self-join), and the quadratic Jaccard
  verify runs only *within* LSH buckets. No all-pairs anywhere.
- SimHash: per-token explode + hash-agg (two shuffles), grouping on the
  32-bit signature.
- n-gram Jaccard: pairwise only within a bounded blocking key — the
  ``source`` variant demonstrates partition-key blocking; the
  production-shaped ``dd_ngram_jaccard_lsh`` blocks on MinHash band
  keys with a bucket-width cap so block width is bounded at any scale.

All hashes go through the portable md5→int64 scheme
(functions/hashing.py) so DuckDB reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pypers_spark.functions.barrier import sort_barrier
from pypers_spark.functions.rounding import duck_rnd, rnd
from pypers_spark.functions.hashing import (
    affine_hash,
    duck_affine_hash,
    duck_md5_int64,
    md5_int64,
)
from pypers_spark.functions.text import duck_normalize_text, normalize_text

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.8
NGRAM_JACCARD_THRESHOLD = 0.5
# Skew guard: LSH buckets wider than this are dropped before pair
# expansion. A hot band key (boilerplate docs sharing a signature band)
# otherwise makes the bucket's pair count quadratic — the classic
# web-scale LSH failure. Dropping is lossy only for pathological buckets
# (a 64-wide bucket at 4 bands already implies a near-identical cluster
# you'd handle via exact dedup first); dd_lsh_bucket_stats reports what
# was dropped. The cap is baked into the DuckDB oracles too, so both
# engines compute the identical (capped) result at any data scale.
LSH_MAX_BUCKET_WIDTH = 64

DUCK_CORPUS = """
corpus AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, '  ' || upper(text) AS text, lang, source, n_chars
  FROM documents
)
"""


def corpus(t: dict[str, DataFrame], repartition: bool = True) -> DataFrame:
    """documents ∪ perturbed copy (known duplicates for dedup testing).

    Hash-repartitioned on doc_id before the compute-heavy signature
    stages: a small input file yields 1-2 scan splits, which would pin
    shingling/hashing to 1-2 cores. At 100 TB the scan has thousands of
    splits and AQE coalesces this exchange away; on skinny inputs it is
    what unlocks the cluster's parallelism. Pass ``repartition=False``
    when the caller inserts its own exchange at a better point (see
    ``_signature_table``).
    """
    d = t["documents"].select("doc_id", "text", "lang", "source", "n_chars")
    dup = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.col("text"))).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    both = d.unionByName(dup)
    if not repartition:
        return both
    # Explicit count: AQE would coalesce a bare repartition(col) down to
    # one partition for byte-small inputs, re-serializing the compute.
    n = int(d.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return both.repartition(n, F.col("doc_id"))


def _repartitioned(df: DataFrame) -> DataFrame:
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, F.col("doc_id"))


def _set_isize(a, b):
    """``size(array_intersect(a, b))`` with an equal-array fast path.

    Exact-duplicate docs produce IDENTICAL gram/shingle arrays (same
    normalization, same construction order), and at web scale exact
    dups dominate the LSH candidate stream (measured at sf0.1: 5032 of
    6056 minhash candidates are equal-array pairs). Array equality is a
    codegen'd element compare with early exit and NO allocation;
    ``array_intersect`` builds a hash set and materializes the result
    array per evaluation. CaseWhen branches evaluate lazily, so equal
    pairs skip the intersect entirely and unequal pairs pay one extra
    O(first-mismatch) compare. |A ∩ A| = |A| — value-identical.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    # Size guard first: near-dup (non-equal) pairs usually differ in
    # cardinality, so the common miss case is two int compares, not an
    # element scan up to the first mismatch.
    return F.when((F.size(a) == F.size(b)) & (a == b), F.size(a)).otherwise(
        F.size(F.array_intersect(a, b))
    )


def _duck_word_ngrams(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 1} + 1), i -> {parts}) "
        f"ELSE []::VARCHAR[] END"
    )


# --- exact dedup -------------------------------------------------------------


def dd_exact(t: dict[str, DataFrame]) -> DataFrame:
    """Exact dedup: md5 fingerprint of normalized text → group, keep min id."""
    c = corpus(t).withColumn("fp", F.md5(normalize_text(F.col("text"))))
    return (
        c.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_id")
    )


ORACLE_DD_EXACT = f"""
WITH {DUCK_CORPUS}
SELECT md5({duck_normalize_text('text')}) AS fp,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM corpus GROUP BY 1 ORDER BY keep_id
"""


def dd_exact_keep(t: dict[str, DataFrame]) -> DataFrame:
    """Exact dedup keeping the full surviving row (first writer wins).

    min_by aggregation, not a row_number window (r11, guide §2.3):
    partial aggregation ships one candidate per fingerprint per map
    partition and skips the per-group sort; doc_id is unique, so the
    winner is identical to the window's rank-1 row."""
    c = corpus(t)
    return (
        c.groupBy(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "source", "n_chars"), F.col("doc_id")
            ).alias("row")
        )
        .select("row.*")
        .orderBy("doc_id")
    )


ORACLE_DD_EXACT_KEEP = f"""
WITH {DUCK_CORPUS}
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY md5({duck_normalize_text('text')}) ORDER BY doc_id) AS rn
  FROM corpus
) WHERE rn = 1 ORDER BY doc_id
"""


# --- MinHash + LSH -----------------------------------------------------------


def _signature_table(t: dict[str, DataFrame]) -> DataFrame:
    """doc_id + hashed word-3-shingle set, persisted.

    Two structural rules make this pass fast and scalable:

    1. Tokenization happens BELOW the repartition exchange, so the
       n-gram/hash lambdas reference a materialized array column. If the
       ``split(normalize(text))`` expression were inlined into the
       ``transform`` lambda (which Catalyst's project-collapsing does to
       adjacent projections), the whole normalize+split subtree would be
       re-evaluated per array ELEMENT — a measured ~16x slowdown.
    2. The table is parquet-checkpointed (functions/checkpoint.py): the
       LSH band join, the Jaccard verify, and the band-blocked ngram
       variant all consume it — the first consumer in ANY driver run
       writes it once (one int64 per distinct shingle, tiny next to the
       raw text); everyone after that reads columnar parquet instead of
       re-running the scan→normalize→shingle→md5 pipeline.
    """
    from pypers_spark.functions.checkpoint import table_checkpoint

    toks = corpus(t, repartition=False).select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("tk")
    )
    toks = _repartitioned(toks)  # exchange = parallelism + collapse barrier
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(F.col("tk"), i), F.element_at(F.col("tk"), i + 1),
        F.element_at(F.col("tk"), i + 2),
    )
    hs = F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.size("tk") - 2), lambda i: md5_int64(gram(i)))
    )
    # Filter on tk BEFORE projecting hs: a filter on size(hs) would be
    # pushed below the projection and re-evaluate the whole transform
    # expression a second time per row (measured ~20x cost).
    return table_checkpoint(
        toks.filter(F.size("tk") >= 3).select("doc_id", hs.alias("hs")),
        "dedup.signature_table",
    )


def _duck_shingles(expr: str) -> str:
    toks = f"string_split({duck_normalize_text(expr)}, ' ')"
    return f"list_distinct({_duck_word_ngrams(toks, 3)})"


# A band's key is its ROWS_PER_BAND minhash values packed pairwise into
# int64s (mh_i·P + mh_j < P² < 2^63 — no overflow): numeric join/group
# keys, no per-row string building, and ~28 fewer bytes per band row in
# the shuffle than the CSV-string key used previously. DuckDB mirrors
# the same arithmetic exactly.
N_BAND_KEYS = (ROWS_PER_BAND + 1) // 2
BAND_KEY_COLS = [f"k{q}" for q in range(N_BAND_KEYS)]

# Production-scale LSH parameters (r5 verdict "What's wrong #3"): the
# module constants above are the GATE-scale defaults, chosen so every
# DuckDB oracle stays tractable; a real near-dup pass runs 64+
# permutations over 16+ bands. dd_minhash_lsh_prod runs the identical
# pipeline at these parameters, resolved through the orchestration
# Config so a deployment overrides them per-task without code changes.
PROD_N_HASHES = 64
PROD_N_BANDS = 16


def lsh_params(config=None) -> tuple[int, int]:
    """Resolve ``(n_hashes, n_bands)`` from a pipeline ``Config``.

    Keys ``dedup/n_hashes`` and ``dedup/n_bands`` (the same ``/``-path
    convention every Stage uses); unset keys fall back to the gate-scale
    module constants. n_hashes must divide evenly into bands.
    """
    from pypers_spark.config import Config

    c = config if config is not None else Config()
    n_hashes = int(c.get("dedup/n_hashes", N_HASHES))
    n_bands = int(c.get("dedup/n_bands", N_BANDS))
    if n_hashes % n_bands:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a multiple of n_bands ({n_bands})"
        )
    return n_hashes, n_bands


def band_key_cols(rows_per_band: int = ROWS_PER_BAND) -> list[str]:
    """Packed-key column names for a given band width."""
    return [f"k{q}" for q in range((rows_per_band + 1) // 2)]


def _packed_band_keys(b: int, mh_at, rows_per_band: int = ROWS_PER_BAND):
    """Packed key Columns for band ``b``; ``mh_at(i)`` = i-th minhash Column."""
    from pypers_spark.functions.hashing import MINHASH_P

    ks = []
    for q in range((rows_per_band + 1) // 2):
        i = b * rows_per_band + 2 * q
        if 2 * q + 1 < rows_per_band:
            ks.append((mh_at(i) * F.lit(MINHASH_P) + mh_at(i + 1)).alias(f"k{q}"))
        else:  # odd rows-per-band: last minhash rides alone
            ks.append(mh_at(i).alias(f"k{q}"))
    return ks


def _duck_packed_band_keys(
    b: int, mh_at, rows_per_band: int = ROWS_PER_BAND
) -> list[str]:
    """DuckDB fragments mirroring :func:`_packed_band_keys`."""
    from pypers_spark.functions.hashing import MINHASH_P

    ks = []
    for q in range((rows_per_band + 1) // 2):
        i = b * rows_per_band + 2 * q
        if 2 * q + 1 < rows_per_band:
            ks.append(f"{mh_at(i)} * {MINHASH_P} + {mh_at(i + 1)} AS k{q}")
        else:
            ks.append(f"{mh_at(i)} AS k{q}")
    return ks


def _bands_of(
    docs: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS
) -> DataFrame:
    """(doc_id, band, k0..k{n}) rows from a signature table.

    One row per band via explode — a per-band union here would re-run
    the whole scan→shingle→hash subtree once per band.
    """
    rows_per_band = n_hashes // n_bands

    def _min_affine(j: int):
        # NB: a plain unary lambda — a two-parameter lambda would make
        # Spark's transform() pass the array index as the second arg.
        return F.array_min(F.transform(F.col("hs"), lambda h: affine_hash(h, j)))

    mh = docs.select(
        "doc_id",
        *[_min_affine(j).alias(f"mh{j}") for j in range(n_hashes)],
    )
    # Checkpoint the MINHASH table, not just the shingle sets (r11,
    # guide §5): the n_hashes affine min-reductions over every doc's
    # shingle array are the single heaviest stage of the whole LSH
    # family (22 executor-cpu-s at sf0.1) and were re-run by EVERY
    # consumer (dd_minhash_lsh, _prod, dd_lsh_bucket_stats,
    # dd_ngram_jaccard_lsh, lsh_candidate_pairs). The table is n_hashes
    # int64s per doc — tiny next to the signature sets — and the
    # digest separates different source plans under the same key.
    from pypers_spark.functions.checkpoint import table_checkpoint

    mh = table_checkpoint(mh, f"dedup.minhash_{n_hashes}")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *_packed_band_keys(b, lambda i: F.col(f"mh{i}"), rows_per_band),
            )
            for b in range(n_bands)
        ]
    )
    return mh.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band", *[f"bk.{k}" for k in band_key_cols(rows_per_band)]
    )


def _band_candidates(bands: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from capped band buckets.

    Aggregate-and-expand, not a self-join: collect the bucket's doc ids
    into a sorted array (ONE exchange on the band key), drop buckets
    wider than LSH_MAX_BUCKET_WIDTH (skew guard — the cap doubles as the
    per-group bound on collect_list, so no unbounded state), then emit
    the C(w,2) ordered pairs with a nested array transform — all
    whole-stage codegen. A band self-join computes the minhash/band
    subtree twice (Catalyst does not CSE across self-join branches) and
    needs a width window on top; this shape pays the signature pass
    once and caps state by construction. Pair count per bucket is
    ≤ C(cap, 2) = 2016, bounded at any corpus size.
    """
    key_cols = [c for c in bands.columns if c not in ("doc_id",)]
    buckets = (
        bands.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= F.lit(LSH_MAX_BUCKET_WIDTH)))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def lsh_candidate_pairs(
    t: dict[str, DataFrame], n_hashes: int = N_HASHES, n_bands: int = N_BANDS
) -> DataFrame:
    """The PRE-VERIFY candidate-pair DataFrame of the banded LSH family
    — exactly the set whose size the cap-knee growth law
    Θ(Σ min(k·g, W)²) predicts (tools/scale_check.py DESIGN_LAWS).

    Exposed so the scale adjudication (tools/scale_adjudicate.py) can
    COUNT the volume per replica factor and turn the law from a
    narrative into a measured predictor of the wall step (r10 verdict
    item #1). Same plan subtree the production queries execute; the
    count adds one aggregation on top.
    """
    return _band_candidates(_bands_of(_signature_table(t), n_hashes, n_bands))


def dd_minhash_lsh(t: dict[str, DataFrame]) -> DataFrame:
    """MinHash + LSH near-dup pairs, Jaccard-verified.

    signature: ONE md5 base hash per distinct word 3-shingle, then 16
    affine-family min-hashes (``(a_j·h + b_j) mod p`` — integer-only,
    whole-stage codegen; computing 16 separate md5 digests per shingle
    would dominate the whole pipeline). 4 bands × 4 rows; candidates =
    pair expansion within band buckets (see _band_candidates) with
    bucket width capped at
    LSH_MAX_BUCKET_WIDTH (skew guard); exact Jaccard ≥ 0.8 verified on
    the hashed shingle sets within candidates only — no all-pairs.

    The verify joins carry NO broadcast hint: the candidate set is
    usually tiny, but at web scale it is not guaranteed
    driver-broadcastable. AQE's runtime size stats convert the join to a
    broadcast when candidates are in fact small, and keep a shuffle join
    keyed on doc id otherwise — no driver-side materialization either
    way (tests/test_skew_stages.py asserts the shuffle fallback).
    """
    return _minhash_lsh_pairs(t, N_HASHES, N_BANDS)


def _minhash_lsh_pairs_unsorted(
    t: dict[str, DataFrame], n_hashes: int, n_bands: int
) -> DataFrame:
    """The dd_minhash_lsh verify pipeline WITHOUT the readout ordering —
    what internal consumers (component labels → drop list / apply /
    soft weights) want: caching the sorted form embeds a
    rangepartitioning sort nobody downstream uses (see
    _embedding_cos_pairs_unsorted). The signature table (base shingle
    hashes) is parameter-independent and shared across all
    configurations via its checkpoint key."""
    docs = _signature_table(t)
    cand = _band_candidates(_bands_of(docs, n_hashes, n_bands))
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    b_ = docs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = _set_isize("hs_a", "hs_b")
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        a.join(cand, "id_a")
        .join(b_, "id_b")
        .withColumn("jaccard", rnd(inter / union, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_lsh_pairs(
    t: dict[str, DataFrame], n_hashes: int, n_bands: int
) -> DataFrame:
    """Declared-query form: ordered readout over the unsorted core.

    sort_barrier: the verify chain (two joins + per-pair intersect)
    sits directly under the final sort; without a boundary the range
    sampler executes it twice (guide §8.3 / functions/barrier.py).
    """
    out = _minhash_lsh_pairs_unsorted(t, n_hashes, n_bands)
    return sort_barrier(out, "id_a").orderBy("id_a", "id_b")


def dd_minhash_lsh_prod(t: dict[str, DataFrame]) -> DataFrame:
    """dd_minhash_lsh at PRODUCTION LSH parameters (64 permutations ×
    16 bands), resolved through the orchestration ``Config`` — the
    knob a deployment turns per-task (``dedup/n_hashes``,
    ``dedup/n_bands``) without code changes.

    Same plan family as the gate-scale entry: one md5 base hash per
    shingle, 64 affine min-hashes (integer-only, codegen), 16 packed
    band keys per doc, capped aggregate-and-expand candidates, exact
    Jaccard verify on candidates only. At 4 rows per band the S-curve
    catch probability at J = 0.8 rises from 0.87 (4 bands) to 0.9998
    (16 bands) — the recall-vs-cost trade dd_lsh_curve quantifies, and
    tests/test_round6_ops.py asserts empirically against planted
    overlap pairs. Cost scales linearly in both parameters: 4× the
    minhash arithmetic, 4× the band-shuffle rows, same verify stage.
    """
    from pypers_spark.config import Config

    cfg = Config({"dedup": {"n_hashes": PROD_N_HASHES, "n_bands": PROD_N_BANDS}})
    return _minhash_lsh_pairs(t, *lsh_params(cfg))


CURVE_MIN_J = 0.5


def dd_threshold_curve(t: dict[str, DataFrame]) -> DataFrame:
    """Dedup-rate sensitivity curve: candidate-pair counts per Jaccard
    decile over the LSH candidate set, verified down to τ={CURVE_MIN_J}.

    The tuning artifact you compute BEFORE committing to a production
    threshold: how many pairs (and how much of the corpus) each τ would
    merge. One extra pass over the same capped candidate set as
    dd_minhash_lsh — the signature table and band pipeline are shared
    (plan-reuse persist + parquet checkpoint), so the marginal cost is
    the verify join at the lower cutoff.
    """
    docs = _signature_table(t)
    cand = _band_candidates(_bands_of(docs))
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    b_ = docs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = _set_isize("hs_a", "hs_b")
    union = F.size("hs_a") + F.size("hs_b") - inter
    jac = rnd(inter / union, 4)
    bucket = (F.floor(F.col("jaccard") * 10) / 10.0).alias("j_bucket")
    return (
        a.join(cand, "id_a")
        .join(b_, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(CURVE_MIN_J))
        .select(bucket)
        .groupBy("j_bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("j_bucket")
    )


def _duck_threshold_curve_sql() -> str:
    jac = duck_rnd(
        "len(list_intersect(a.hs, b.hs)) * 1.0 / "
        "(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))",
        4,
    )
    return f"""
WITH {DUCK_CORPUS},
{_duck_band_ctes()},
j AS (
  SELECT {jac} AS jaccard
  FROM cand
  JOIN docs a ON a.doc_id = id_a
  JOIN docs b ON b.doc_id = id_b
  WHERE {jac} >= {CURVE_MIN_J}
)
SELECT floor(jaccard * 10) / 10.0 AS j_bucket, count(*) AS n_pairs
FROM j GROUP BY 1 ORDER BY j_bucket
"""


def _minhash_component_labels(t: dict[str, DataFrame]) -> DataFrame:
    """(node, lbl) for every member of the MinHash pair graph after
    min-label propagation with pointer jumping converges — the
    component assignment shared by the drop list (keep = min id) and
    the SoftDeDup weights. O(log diameter) rounds, no diameter cap
    (see functions/components.py — long boilerplate-drift chains in
    web-scale near-dup graphs are handled, not failed)."""
    from pypers_spark.functions.caching import tracked_persist
    from pypers_spark.functions.components import min_label_components

    # Unsorted pair plan (r11): the cached edge list must not embed the
    # declared query's rangepartitioning sort + barrier exchange.
    pairs = _minhash_lsh_pairs_unsorted(t, N_HASHES, N_BANDS).select(
        "id_a", "id_b"
    )
    edges = tracked_persist(
        pairs.unionByName(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        "dedup.droplist_edges",
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    return min_label_components(edges, labels, "dedup.droplist_labels")


def dd_minhash_drop_list(t: dict[str, DataFrame]) -> DataFrame:
    """The dedup DECISION: (drop_id, keep_id) per near-duplicate group.

    Pair lists don't dedup a corpus — the applied artifact is the drop
    list: connected components over the MinHash+LSH pair graph
    (A~B, B~C ⟹ one group even when A,C never pair directly), keep the
    min doc id per component, drop everyone else. Components come from
    iterative min-label propagation over the pair members only (nodes
    outside any pair keep themselves and are not emitted); near-dup
    components have tiny diameters, so rounds stay in single digits at
    any corpus size — each round one shuffle keyed on the edge
    endpoint (same design as similarity.dd_cluster, which walks the
    embedding pair graph; oracle is the same recursive CTE shape).
    """
    return (
        _minhash_component_labels(t)
        .filter(F.col("node") != F.col("lbl"))
        .select(F.col("node").alias("drop_id"), F.col("lbl").alias("keep_id"))
        .orderBy("drop_id")
    )


def _duck_drop_ctes() -> str:
    """The full minhash pair CTE chain (corpus → docs → mh → bands →
    capped → cand), then verify + walk components down to ``cl``."""
    return f"""{DUCK_CORPUS},
{_duck_band_ctes()},
verified AS (
  SELECT id_a, id_b
  FROM cand
  JOIN docs a ON a.doc_id = id_a
  JOIN docs b ON b.doc_id = id_b
  WHERE {duck_rnd('len(list_intersect(a.hs, b.hs)) * 1.0 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))', 4)} >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM verified
),
reach(node, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
cl AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY 1)"""


def _duck_drop_list_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_drop_ctes()}
SELECT node AS drop_id, lbl AS keep_id
FROM cl WHERE node != lbl
ORDER BY drop_id
"""


def dd_minhash_apply(t: dict[str, DataFrame]) -> DataFrame:
    """Apply the dedup decision: the SURVIVING corpus after dropping
    every non-minimal member of each near-duplicate component, rolled
    up per source (doc counts + char totals before/after).

    The last leg of the dedup story pairs→components→drop-list→applied:
    one left-anti join of the corpus against the drop list (broadcast —
    the drop list is components-only, ≪ corpus), then a hash-agg
    rollup. This is the shape of the actual curation job that writes
    the deduplicated training set.
    """
    drops = dd_minhash_drop_list(t).select(F.col("drop_id").alias("doc_id"))
    c = corpus(t)
    kept = c.join(drops, "doc_id", "left_anti")
    before = c.groupBy("source").agg(
        F.count("*").alias("n_docs_before"),
        F.sum("n_chars").alias("chars_before"),
    )
    after = kept.groupBy("source").agg(
        F.count("*").alias("n_docs_after"),
        F.sum("n_chars").alias("chars_after"),
    )
    return (
        before.join(after, "source")
        .select(
            "source", "n_docs_before", "n_docs_after",
            (F.col("n_docs_before") - F.col("n_docs_after")).alias("n_dropped"),
            "chars_before", "chars_after",
        )
        .orderBy("source")
    )


def _duck_apply_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_drop_ctes()},
drops AS (SELECT node AS doc_id FROM cl WHERE node != lbl),
kept AS (
  SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM drops)
),
before_agg AS (
  SELECT source, count(*) AS n_docs_before,
         CAST(sum(n_chars) AS BIGINT) AS chars_before
  FROM corpus GROUP BY source
),
after_agg AS (
  SELECT source, count(*) AS n_docs_after,
         CAST(sum(n_chars) AS BIGINT) AS chars_after
  FROM kept GROUP BY source
)
SELECT source, n_docs_before, n_docs_after,
       n_docs_before - n_docs_after AS n_dropped,
       chars_before, chars_after
FROM before_agg JOIN after_agg USING (source)
ORDER BY source
"""


def _duck_band_ctes(n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> str:
    """Shared CTE chain: docs → mh → bands → capped → cand (skew-capped).

    The QUALIFY mirrors _band_candidates' width cap exactly so both engines agree on
    which buckets were dropped. Parameterized like the Spark side — the
    prod-scale gate entry interpolates 64/16 here.
    """
    rows_per_band = n_hashes // n_bands
    key_cols = band_key_cols(rows_per_band)
    mh_cols = ",\n       ".join(
        f"list_min(list_transform(hs, h -> {duck_affine_hash('h', j)})) AS mh{j}"
        for j in range(n_hashes)
    )
    key_list = ", ".join(key_cols)
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, {keys} FROM mh".format(
            b=b,
            keys=", ".join(
                _duck_packed_band_keys(b, lambda i: f"mh{i}", rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    on_keys = " AND ".join(f"l.{k} = r.{k}" for k in ["band", *key_cols])
    return f"""docs AS (
  SELECT doc_id, list_transform({_duck_shingles('text')}, s -> {duck_md5_int64('s')}) AS hs
  FROM corpus
  WHERE len({_duck_shingles('text')}) > 0
),
mh AS (
  SELECT doc_id, hs,
       {mh_cols}
  FROM docs
),
bands AS (
{band_selects}
),
capped AS (
  SELECT doc_id, band, {key_list} FROM bands
  QUALIFY count(*) OVER (PARTITION BY band, {key_list}) <= {LSH_MAX_BUCKET_WIDTH}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM capped l JOIN capped r ON {on_keys}
  WHERE l.doc_id < r.doc_id
)"""


def _duck_minhash_sql(n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> str:
    return f"""
WITH {DUCK_CORPUS},
{_duck_band_ctes(n_hashes, n_bands)}
SELECT id_a, id_b,
       {duck_rnd('len(list_intersect(a.hs, b.hs)) * 1.0 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))', 4)} AS jaccard
FROM cand
JOIN docs a ON a.doc_id = id_a
JOIN docs b ON b.doc_id = id_b
WHERE {duck_rnd('len(list_intersect(a.hs, b.hs)) * 1.0 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))', 4)} >= {JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


def dd_minhash_est(t: dict[str, DataFrame]) -> DataFrame:
    """Sketch accuracy: estimated (minhash-agreement) vs exact Jaccard
    for every LSH candidate pair.

    The estimator is the textbook one — the fraction of the 16 minhash
    components on which the two signatures agree — computed with a
    zip_with/filter fold over the signature arrays (codegen, no UDF).
    Emitting both estimates lets a pipeline calibrate band/row counts
    against measured error before running at full scale.
    """
    docs = _signature_table(t)

    def _min_affine(j: int):
        return F.array_min(F.transform(F.col("hs"), lambda h: affine_hash(h, j)))

    mh = docs.select(
        "doc_id",
        F.array(*[_min_affine(j) for j in range(N_HASHES)]).alias("mh"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *_packed_band_keys(
                    b, lambda i: F.element_at(F.col("mh"), i + 1)
                ),
            )
            for b in range(N_BANDS)
        ]
    )
    from pypers_spark.functions.caching import tracked_persist

    mh = tracked_persist(mh, "dedup.minhash_est_signatures")
    bands = mh.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band", *[f"bk.{k}" for k in BAND_KEY_COLS]
    )
    cand = _band_candidates(bands)
    a_sig = mh.select(F.col("doc_id").alias("id_a"), F.col("mh").alias("mh_a"))
    b_sig = mh.select(F.col("doc_id").alias("id_b"), F.col("mh").alias("mh_b"))
    a_hs = docs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    b_hs = docs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    inter = _set_isize("hs_a", "hs_b")
    union = F.size("hs_a") + F.size("hs_b") - inter
    # No broadcast hints: the signature table is O(corpus) — hinting it
    # broadcast would ship the whole corpus to every executor at scale.
    # AQE decides at runtime from actual sizes (see dd_minhash_lsh note).
    out = (
        cand.join(a_sig, "id_a")
        .join(b_sig, "id_b")
        .join(a_hs, "id_a")
        .join(b_hs, "id_b")
        .select(
            "id_a",
            "id_b",
            rnd(agree / F.lit(float(N_HASHES)), 4).alias("est_jaccard"),
            rnd(inter / union, 4).alias("jaccard"),
        )
    )
    # sort_barrier: four verify joins under the final sort; without a
    # boundary the range sampler executes them all twice (barrier.py).
    return sort_barrier(out, "id_a").orderBy("id_a", "id_b")


def _duck_minhash_est_sql() -> str:
    mh_elems = ", ".join(
        f"list_min(list_transform(hs, h -> {duck_affine_hash('h', j)}))"
        for j in range(N_HASHES)
    )
    key_list = ", ".join(BAND_KEY_COLS)
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, {keys} FROM mh".format(
            b=b,
            keys=", ".join(_duck_packed_band_keys(b, lambda i: f"mh[{i + 1}]")),
        )
        for b in range(N_BANDS)
    )
    on_keys = " AND ".join(f"l.{k} = r.{k}" for k in ["band", *BAND_KEY_COLS])
    return f"""
WITH {DUCK_CORPUS},
docs AS (
  SELECT doc_id, list_transform({_duck_shingles('text')}, s -> {duck_md5_int64('s')}) AS hs
  FROM corpus
  WHERE len({_duck_shingles('text')}) > 0
),
mh AS (
  SELECT doc_id, hs, [{mh_elems}] AS mh FROM docs
),
bands AS (
{band_selects}
),
capped AS (
  SELECT doc_id, band, {key_list} FROM bands
  QUALIFY count(*) OVER (PARTITION BY band, {key_list}) <= {LSH_MAX_BUCKET_WIDTH}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM capped l JOIN capped r ON {on_keys}
  WHERE l.doc_id < r.doc_id
)
SELECT id_a, id_b,
       {duck_rnd(f'len(list_filter(range(1, {N_HASHES} + 1), i -> a.mh[i] = b.mh[i])) * 1.0 / {N_HASHES}', 4)} AS est_jaccard,
       {duck_rnd('len(list_intersect(a.hs, b.hs)) * 1.0 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))', 4)} AS jaccard
FROM cand
JOIN mh a ON a.doc_id = id_a
JOIN mh b ON b.doc_id = id_b
ORDER BY id_a, id_b
"""


def dd_incremental(t: dict[str, DataFrame]) -> DataFrame:
    """Incremental dedup: admit only new-batch documents whose content
    fingerprint is absent from the existing corpus.

    The streaming-ingest counterpart of ``dd_exact``: base corpus =
    documents, incoming batch = the perturbed copy (whose normalized
    text collides with the base). One anti-join keyed on the md5
    fingerprint — at 100 TB the base fingerprints live as a bucketed
    table so the join is co-located, and the admitted batch appends
    with its fingerprints for the next increment. Also dedups WITHIN
    the batch (min doc_id wins) so admissions are self-consistent.
    """
    d = t["documents"].select("doc_id", "text", "source")
    fp = lambda c: F.md5(normalize_text(c))  # noqa: E731
    base_fps = d.select(fp(F.col("text")).alias("fp")).distinct()
    batch = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        # half the batch collides with the base (same normalized text),
        # half is genuinely new (suffixed)
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("  "), F.upper(F.col("text")))
        ).otherwise(F.concat(F.col("text"), F.lit(" fresh"))).alias("text"),
        "source",
    ).withColumn("fp", fp(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    batch_unique = batch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        batch_unique.join(base_fps, "fp", "left_anti")
        .select("doc_id", "source", "fp")
        .orderBy("doc_id")
    )


ORACLE_DD_INCREMENTAL = f"""
WITH base_fps AS (
  SELECT DISTINCT md5({duck_normalize_text('text')}) AS fp FROM documents
),
batch AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 2 = 0 THEN '  ' || upper(text)
              ELSE text || ' fresh' END AS text,
         source
  FROM documents
),
batch_unique AS (
  SELECT doc_id, source, fp FROM (
    SELECT doc_id, source, md5({duck_normalize_text('text')}) AS fp,
           row_number() OVER (PARTITION BY md5({duck_normalize_text('text')})
                              ORDER BY doc_id) AS rn
    FROM batch
  ) WHERE rn = 1
)
SELECT doc_id, source, fp
FROM batch_unique
WHERE fp NOT IN (SELECT fp FROM base_fps)
ORDER BY doc_id
"""


# --- SimHash -----------------------------------------------------------------


def dd_simhash(t: dict[str, DataFrame]) -> DataFrame:
    """32-bit SimHash groups: identical signatures cluster near-dups.

    Per-token explode → hash-agg on doc → signature from 32 majority
    bits; output one row per signature group.
    """
    toks = (
        corpus(t)
        .select("doc_id", F.explode(F.array_distinct(F.split(normalize_text(F.col("text")), " "))).alias("tok"))
        .withColumn("h", md5_int64(F.col("tok")))
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
            for b in range(32)
        ]
    )
    sig = None
    for b in range(32):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    per_doc = sums.select("doc_id", sig.cast("bigint").alias("simhash"))
    return (
        per_doc.groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .orderBy("keep_id")
    )


def _duck_simhash_sql() -> str:
    sum_cols = ",\n         ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(32)
    )
    sig = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    return f"""
WITH {DUCK_CORPUS},
toks AS (
  SELECT doc_id, {duck_md5_int64('tok')} AS h
  FROM (
    SELECT doc_id, unnest(list_distinct(string_split({duck_normalize_text('text')}, ' '))) AS tok
    FROM corpus
  )
),
sums AS (
  SELECT doc_id,
         {sum_cols}
  FROM toks GROUP BY doc_id
),
per_doc AS (
  SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums
)
SELECT simhash, min(doc_id) AS keep_id, count(*) AS n_docs
FROM per_doc GROUP BY simhash ORDER BY keep_id
"""


# --- n-gram Jaccard within blocking buckets ----------------------------------


def _gram_table(t: dict[str, DataFrame]) -> DataFrame:
    """doc_id + source + hashed char-4-gram set, persisted.

    Normalize below the exchange so the per-offset substring lambda
    slices a materialized string column, not a re-evaluated regex
    subtree (see _signature_table note 1). Hashed grams: the pairwise
    intersect compares int64s instead of strings — same Jaccard, far
    cheaper compares. Distinct the cheap substrings FIRST, md5 only the
    survivors (~1.7x fewer digests on this corpus; md5 dominates substr
    by orders of magnitude). Pre-filter on nt (not on size(g)) — see
    _signature_table note. Parquet-checkpointed like the signature
    table: the source-blocked and LSH-blocked ngram variants share it
    across invocations and driver runs.
    """
    from pypers_spark.functions.checkpoint import table_checkpoint

    norm = corpus(t, repartition=False).select(
        "doc_id", "source", normalize_text(F.col("text")).alias("nt")
    )
    norm = _repartitioned(norm)
    gram_strs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("nt") - 3),
            lambda i: F.col("nt").substr(i, F.lit(4)),
        )
    )
    grams = F.transform(gram_strs, lambda s: md5_int64(s))
    return table_checkpoint(
        norm.filter(F.length("nt") >= 4).select("doc_id", "source", grams.alias("g")),
        "dedup.gram_sets",
    )


def dd_ngram_jaccard(t: dict[str, DataFrame]) -> DataFrame:
    """Char-4-gram Jaccard near-dup pairs within a blocking key (source).

    Jaccard is a function of the gram SET, so exact-duplicate sets are
    collapsed first (md5 of the sorted hashed-gram array): the quadratic
    compare runs once per distinct set pair, and member pairs expand
    back afterwards (same-set pairs are J = 1.0 by construction, no
    intersect at all). Exact-dup collapse before near-dup search is the
    standard curation ordering — at 100 TB web scale the collapse
    factor is far larger than this corpus's 2x. The remaining pairwise
    compare is bounded to one block (swap source for an LSH band or
    URL-domain key in production) and size-ratio pruned.
    """
    sets = _gram_table(t)
    from pypers_spark.functions.caching import tracked_persist

    # Set signature: md5 over the sorted hashed grams. docs is persisted:
    # the rep table, both expansion joins, and the self-pair join read it.
    docs = tracked_persist(
        sets.withColumn(
            "sig",
            F.md5(F.concat_ws(",", F.transform(F.array_sort("g"), lambda x: x.cast("string")))),
        ),
        "dedup.ngram_grams",
    )
    # One representative row per distinct (source, set).
    reps = tracked_persist(
        docs.groupBy("source", "sig").agg(
            F.first("g").alias("g"), F.count("*").alias("n_members")
        ).withColumn("ng", F.size("g")),
        "dedup.ngram_reps",
    )
    a = reps.select(F.col("sig").alias("sig_a"), "source", F.col("g").alias("g_a"),
                    F.col("ng").alias("ng_a"))
    b = reps.select(F.col("sig").alias("sig_b"), "source", F.col("g").alias("g_b"),
                    F.col("ng").alias("ng_b"))
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    union = F.col("ng_a") + F.col("ng_b") - inter
    # Lossless size-ratio prune: J >= tau forces
    # min(|A|,|B|) >= tau * max(|A|,|B|) — filter on the cheap set sizes
    # BEFORE paying for the intersect on each candidate pair.
    # (A size-banded join key — join on (source, log_{1/tau} size band)
    # same+adjacent — was tried and REVERTED: it cuts candidate
    # generation 2.6x, but 1/3 of candidates survive this size filter
    # and pay the intersect either way, so the op is intersect-bound and
    # the second join branch + union cost more than the cheap filter
    # evaluations saved. Same family as the PPJoin prefix-filter lesson.)
    size_ok = F.least("ng_a", "ng_b") >= NGRAM_JACCARD_THRESHOLD * F.greatest("ng_a", "ng_b")
    sig_pairs = (
        a.join(b, "source")
        .filter((F.col("sig_a") < F.col("sig_b")) & size_ok)
        .withColumn("jaccard", rnd(inter / union, 4))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .select("source", "sig_a", "sig_b", "jaccard")
    )
    # Expand distinct-set pairs back to doc pairs (either orientation of
    # the doc ids can occur, so re-order with least/greatest).
    ma = docs.select(F.col("sig").alias("ma_sig"), F.col("source").alias("ma_src"),
                     F.col("doc_id").alias("m_a"))
    mb = docs.select(F.col("sig").alias("mb_sig"), F.col("source").alias("mb_src"),
                     F.col("doc_id").alias("m_b"))
    cross = (
        sig_pairs
        .join(ma, (F.col("sig_a") == F.col("ma_sig")) & (F.col("source") == F.col("ma_src")))
        .join(mb, (F.col("sig_b") == F.col("mb_sig")) & (F.col("source") == F.col("mb_src")))
        .select(
            "source",
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "jaccard",
        )
    )
    # Same-set doc pairs are exact dups: J = 1.0 without any intersect.
    twins = (
        ma.join(mb, (F.col("ma_sig") == F.col("mb_sig")) & (F.col("ma_src") == F.col("mb_src")))
        .filter(F.col("m_a") < F.col("m_b"))
        .select(
            F.col("ma_src").alias("source"),
            F.col("m_a").alias("id_a"),
            F.col("m_b").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # sort_barrier: both union branches end in joins over the persisted
    # gram tables; the range sampler would re-run them (barrier.py).
    return sort_barrier(cross.unionByName(twins), "id_a").orderBy(
        "source", "id_a", "id_b"
    )


def _duck_ngram_sql() -> str:
    from pypers_spark.functions.text import duck_char_ngrams

    grams = (
        f"list_distinct(list_transform({duck_char_ngrams('text', 4)}, "
        f"s -> {duck_md5_int64('s')}))"
    )
    return f"""
WITH {DUCK_CORPUS},
docs AS (
  SELECT doc_id, source, {grams} AS g FROM corpus WHERE len({grams}) > 0
)
SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
       {duck_rnd('len(list_intersect(a.g, b.g)) * 1.0 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))', 4)} AS jaccard
FROM docs a JOIN docs b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE {duck_rnd('len(list_intersect(a.g, b.g)) * 1.0 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))', 4)} >= {NGRAM_JACCARD_THRESHOLD}
ORDER BY source, id_a, id_b
"""


def dd_ngram_jaccard_lsh(t: dict[str, DataFrame]) -> DataFrame:
    """Char-4-gram Jaccard near-dup pairs, MinHash-LSH band-blocked.

    The production-shaped variant of dd_ngram_jaccard: instead of a
    corpus-partition blocking key (``source`` — a handful of enormous
    blocks at web scale), candidate pairs come from the MinHash band
    table (pair expansion within band buckets, width capped at
    LSH_MAX_BUCKET_WIDTH), so block width is bounded at ANY corpus
    size. The expensive char-4-gram intersect runs per candidate pair
    only; candidate recall is governed by the LSH band/row config
    exactly as in dd_minhash_lsh. Verify joins shuffle on doc id (AQE
    may broadcast small candidate sets at runtime — no hard hint).
    """
    docs = _signature_table(t)
    cand = _band_candidates(_bands_of(docs))
    gsets = _gram_table(t)
    a = gsets.select(F.col("doc_id").alias("id_a"), F.col("g").alias("g_a"))
    b_ = gsets.select(F.col("doc_id").alias("id_b"), F.col("g").alias("g_b"))
    inter = _set_isize("g_a", "g_b")
    union = F.size("g_a") + F.size("g_b") - inter
    out = (
        a.join(cand, "id_a")
        .join(b_, "id_b")
        .withColumn("jaccard", rnd(inter / union, 4))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )
    # sort_barrier: the char-4-gram intersect verify is the measured
    # cost of this key (12.2 cpu-s); without a boundary the range
    # sampler ran it twice (12.2 + 10.1 cpu-s at sf0.1).
    return sort_barrier(out, "id_a").orderBy("id_a", "id_b")


def _duck_ngram_lsh_sql() -> str:
    from pypers_spark.functions.text import duck_char_ngrams

    grams = (
        f"list_distinct(list_transform({duck_char_ngrams('text', 4)}, "
        f"s -> {duck_md5_int64('s')}))"
    )
    jac = (
        "len(list_intersect(a.g, b.g)) * 1.0 / "
        "(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))"
    )
    return f"""
WITH {DUCK_CORPUS},
{_duck_band_ctes()},
gsets AS (
  SELECT doc_id, {grams} AS g FROM corpus WHERE len({grams}) > 0
)
SELECT id_a, id_b, {duck_rnd(jac, 4)} AS jaccard
FROM cand
JOIN gsets a ON a.doc_id = id_a
JOIN gsets b ON b.doc_id = id_b
WHERE {duck_rnd(jac, 4)} >= {NGRAM_JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


def dd_lsh_bucket_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-band LSH bucket-width profile + what the skew cap dropped.

    The observability side of the LSH_MAX_BUCKET_WIDTH guard: before a
    100 TB run you look at max_width / n_dropped_rows per band to size
    the cap (and to spot a boilerplate-heavy corpus that needs exact
    dedup first). One groupBy over the band table — O(n·bands).
    """
    docs = _signature_table(t)
    widths = (
        _bands_of(docs)
        .groupBy("band", *BAND_KEY_COLS)
        .agg(F.count("*").alias("w"))
    )
    over = F.col("w") > F.lit(LSH_MAX_BUCKET_WIDTH)
    return (
        widths.groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("w").alias("max_width"),
            F.sum(over.cast("bigint")).alias("n_dropped_buckets"),
            F.sum(F.when(over, F.col("w")).otherwise(F.lit(0))).alias("n_dropped_rows"),
        )
        .orderBy("band")
    )


def _duck_bucket_stats_sql() -> str:
    return f"""
WITH {DUCK_CORPUS},
{_duck_band_ctes()},
widths AS (
  SELECT band, {", ".join(BAND_KEY_COLS)}, count(*) AS w
  FROM bands GROUP BY ALL
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(w) AS BIGINT) AS max_width,
       CAST(sum(CASE WHEN w > {LSH_MAX_BUCKET_WIDTH} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_buckets,
       CAST(sum(CASE WHEN w > {LSH_MAX_BUCKET_WIDTH} THEN w ELSE 0 END) AS BIGINT) AS n_dropped_rows
FROM widths GROUP BY band ORDER BY band
"""


QUERIES = {
    "dd_minhash_lsh": dd_minhash_lsh,
    "dd_minhash_lsh_prod": dd_minhash_lsh_prod,
    "dd_minhash_est": dd_minhash_est,
    "dd_ngram_jaccard_lsh": dd_ngram_jaccard_lsh,
    "dd_lsh_bucket_stats": dd_lsh_bucket_stats,
    "dd_exact": dd_exact,
    "dd_exact_keep": dd_exact_keep,
    "dd_incremental": dd_incremental,
    "dd_simhash": dd_simhash,
    "dd_ngram_jaccard": dd_ngram_jaccard,
    "dd_minhash_drop_list": dd_minhash_drop_list,
    "dd_minhash_apply": dd_minhash_apply,
    "dd_threshold_curve": dd_threshold_curve,
}

ORACLES = {
    "dd_exact": ORACLE_DD_EXACT,
    "dd_exact_keep": ORACLE_DD_EXACT_KEEP,
    "dd_minhash_lsh": _duck_minhash_sql(),
    "dd_minhash_lsh_prod": _duck_minhash_sql(PROD_N_HASHES, PROD_N_BANDS),
    "dd_minhash_est": _duck_minhash_est_sql(),
    "dd_ngram_jaccard_lsh": _duck_ngram_lsh_sql(),
    "dd_lsh_bucket_stats": _duck_bucket_stats_sql(),
    "dd_incremental": ORACLE_DD_INCREMENTAL,
    "dd_simhash": _duck_simhash_sql(),
    "dd_ngram_jaccard": _duck_ngram_sql(),
    "dd_minhash_drop_list": _duck_drop_list_sql(),
    "dd_minhash_apply": _duck_apply_sql(),
    "dd_threshold_curve": _duck_threshold_curve_sql(),
}


# --- dd_lsh_curve ------------------------------------------------------------

# Alternative (bands, rows) splits of the N_HASHES-permutation signature
# considered when tuning the LSH stage (b·r = 16 in every config).
LSH_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))
LSH_CURVE_STEPS = 19  # s = 0.05 … 0.95


def _pow_chain(col, n: int):
    """Left-associated multiply chain — identical IEEE order across engines."""
    out = col
    for _ in range(n - 1):
        out = out * col
    return out


def _duck_pow_chain(expr: str, n: int) -> str:
    out = f"({expr})"
    for _ in range(n - 1):
        out = f"({out} * ({expr}))"
    return out


def dd_lsh_curve(t: dict[str, DataFrame]) -> DataFrame:
    """The LSH banding S-curve — the tuning artifact that picks (bands,
    rows) before a production dedup run: for each candidate split of the
    {N_HASHES}-hash signature and each Jaccard similarity s, the
    probability a pair becomes a candidate, p = 1 − (1 − s^r)^b.

    dd_threshold_curve measures the corpus's pair-count sensitivity to
    τ; this is the a-priori half — where each config's collision curve
    crosses its τ knee (s* ≈ (1/b)^(1/r): (4,4) → 0.71, (8,2) → 0.35).
    Powers are integer-exponent multiply chains (no pow(), which isn't
    bit-reproducible across libms). The chains are evaluated DRIVER-side
    in Python — IEEE-754 binary64 left-fold multiplies, bit-identical to
    the DuckDB oracle's — and shipped as one 76-row literal DataFrame;
    only the final half-up rounding stays in Spark so both engines round
    through their own (matched) ROUND. The previous form built the
    chains as a nested Column expression: ~2.4 s of py4j plan
    construction plus ~3.5 s of whole-stage-codegen compile for a
    closed-form, input-independent table (r9 verdict item #4). Takes
    `t` for registry-signature uniformity only.
    """
    from pypers_spark.session import get_session

    def py_pow_chain(x: float, n: int) -> float:
        out = x
        for _ in range(n - 1):
            out = out * x
        return out

    spark = get_session()
    s_vals = [round(0.05 * (i + 1), 2) for i in range(LSH_CURVE_STEPS)]
    # Literal inline(array(...)) keeps the 76 rows entirely JVM-side (a
    # createDataFrame from Python tuples would route through pickled
    # RDD slices — one Python-worker roundtrip per slice) AND costs ONE
    # py4j call: building the same grid as 76 F.struct/F.lit trees paid
    # ~0.8 s of driver-side py4j roundtrips per invocation. Doubles are
    # shipped as repr() strings CAST to DOUBLE — shortest-roundtrip
    # decimal, so the JVM parses back the exact same binary64.
    structs = ", ".join(
        "named_struct('bands', {b}, 'rows_per_band', {r}, "
        "'s', CAST('{s!r}' AS DOUBLE), 'p_raw', CAST('{p!r}' AS DOUBLE))".format(
            b=b,
            r=r,
            s=float(s),
            p=1 - py_pow_chain(1 - py_pow_chain(float(s), r), b),
        )
        for s in s_vals
        for b, r in LSH_CONFIGS
    )
    # range(..., numPartitions=1): the whole table lives in ONE
    # partition, so sortWithinPartitions IS the global order and the
    # orderBy range-exchange (sampling job + shuffle — ~0.8 s of pure
    # job tax for 76 rows) disappears.
    grid = spark.range(0, 1, 1, 1).selectExpr(f"inline(array({structs}))")
    return grid.select(
        "bands", "rows_per_band", rnd(F.col("s"), 2).alias("s"),
        rnd(F.col("p_raw"), 6).alias("p_candidate"),
    ).sortWithinPartitions("bands", "s")


def _duck_lsh_curve_sql() -> str:
    s_vals = [round(0.05 * (i + 1), 2) for i in range(LSH_CURVE_STEPS)]
    s_list = ", ".join(str(v) for v in s_vals)
    cases = " ".join(
        f"WHEN bands = {b} THEN "
        + _duck_pow_chain(f"1 - {_duck_pow_chain('s', r)}", b)
        for b, r in LSH_CONFIGS
    )
    cfgs = ", ".join(f"({b}, {r})" for b, r in LSH_CONFIGS)
    return f"""
WITH svals AS (SELECT unnest([{s_list}]::DOUBLE[]) AS s),
cfgs(bands, rows_per_band) AS (VALUES {cfgs})
SELECT bands, rows_per_band, {duck_rnd('s', 2)} AS s,
       {duck_rnd('1 - (CASE ' + cases + ' END)', 6)} AS p_candidate
FROM svals CROSS JOIN cfgs
ORDER BY bands, s
"""


QUERIES["dd_lsh_curve"] = dd_lsh_curve
ORACLES["dd_lsh_curve"] = _duck_lsh_curve_sql()


# --- dd_bloom_admit ----------------------------------------------------------

BLOOM_BITS = 4096  # demo size; production sizes ~10 bits/key at the corpus scale
BLOOM_K = 2        # hash functions


def dd_bloom_admit(t: dict[str, DataFrame]) -> DataFrame:
    """Bloom-prefiltered incremental admit: the dd_incremental anti-join
    with a broadcast Bloom filter in front of it — the explicit form of
    the runtime row-level filtering a 100 TB ingest needs.

    The base corpus's fingerprint Bloom filter is materialized as a
    DISTINCT bit-position table (≤ {BLOOM_BITS} rows no matter how big
    the corpus — that is the point), which broadcasts to every executor.
    A batch document touches the expensive exact fingerprint anti-join
    ONLY if all {BLOOM_K} of its probe positions hit (two broadcast
    semi-joins, map-side); definite-new docs (any probe missing) admit
    without shuffling the base table at all. The gate row reports the
    filter's work: batch size, bloom-pass count, true duplicates,
    false positives (bloom-pass but genuinely new — the cost knob the
    {BLOOM_BITS}-bit size controls), and exact-checks avoided.
    """
    d = t["documents"].select("doc_id", "text", "source")
    fp_s = F.md5(normalize_text(F.col("text")))
    base = d.select(fp_s.alias("fp")).distinct()
    pos = [
        (md5_int64(F.concat(F.lit(f"bf{j}:"), F.col("fp"))) % BLOOM_BITS).alias(
            f"pos{j}"
        )
        for j in range(BLOOM_K)
    ]
    bloom = (
        base.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )
    batch = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("  "), F.upper(F.col("text")))
        ).otherwise(F.concat(F.col("text"), F.lit(" fresh"))).alias("text"),
    ).select("doc_id", fp_s.alias("fp"))
    # Single-pass accounting: the bloom membership tests are two
    # broadcast LEFT joins producing flags (not two semi-joins feeding
    # four separate count branches), the exact check is ONE left join of
    # just the bloom-passed sliver against the base fingerprints, and
    # every output count is a conditional aggregate of the same row
    # stream — one corpus join, one aggregation, no crossJoined scalar
    # subplans. (The first cut used semi/anti joins + four agg branches:
    # 7 exchanges and the base join paid twice; this shape halves both.)
    probed = batch.select("doc_id", "fp", *pos)
    flagged = probed
    for j in range(BLOOM_K):
        b = bloom.select(F.col("pos").alias(f"bpos{j}"))
        flagged = flagged.join(
            F.broadcast(b), flagged[f"pos{j}"] == b[f"bpos{j}"], "left"
        )
    bloom_pass = F.lit(True)
    for j in range(BLOOM_K):
        bloom_pass = bloom_pass & F.col(f"bpos{j}").isNotNull()
    flagged = flagged.withColumn("bloom_pass", bloom_pass)
    dup_mark = base.withColumn("is_dup", F.lit(1))
    checked = flagged.join(
        dup_mark.hint("shuffle_hash"),
        (F.col("bloom_pass")) & (flagged["fp"] == dup_mark["fp"]),
        "left",
    )
    return checked.agg(
        F.count("*").alias("n_batch"),
        F.count(F.when(F.col("bloom_pass"), 1)).alias("n_bloom_pass"),
        F.count(F.when(F.col("bloom_pass") & F.col("is_dup").isNotNull(), 1)).alias(
            "n_true_dup"
        ),
        F.count(F.when(F.col("bloom_pass") & F.col("is_dup").isNull(), 1)).alias(
            "n_false_pos"
        ),
        F.count(F.when(~F.col("bloom_pass"), 1)).alias("n_exact_checks_avoided"),
    )


def _duck_bloom_admit_sql() -> str:
    probes = ", ".join(
        f"({duck_md5_int64(chr(39) + f'bf{j}:' + chr(39) + ' || fp')} % {BLOOM_BITS}) AS pos{j}"
        for j in range(BLOOM_K)
    )
    pass_cond = " AND ".join(
        f"pos{j} IN (SELECT pos FROM bloom)" for j in range(BLOOM_K)
    )
    return f"""
WITH base AS (
  SELECT DISTINCT md5({duck_normalize_text('text')}) AS fp FROM documents
),
bloom AS (
  SELECT DISTINCT unnest([
    {", ".join(f"({duck_md5_int64(chr(39) + f'bf{j}:' + chr(39) + ' || fp')} % {BLOOM_BITS})" for j in range(BLOOM_K))}
  ]) AS pos
  FROM base
),
batch AS (
  SELECT doc_id + 1000000 AS doc_id,
         md5({duck_normalize_text("CASE WHEN doc_id % 2 = 0 THEN '  ' || upper(text) ELSE text || ' fresh' END")}) AS fp
  FROM documents
),
probed AS (SELECT doc_id, fp, {probes} FROM batch),
passed AS (SELECT * FROM probed WHERE {pass_cond})
SELECT (SELECT count(*) FROM batch) AS n_batch,
       (SELECT count(*) FROM passed) AS n_bloom_pass,
       (SELECT count(*) FROM passed WHERE fp IN (SELECT fp FROM base)) AS n_true_dup,
       (SELECT count(*) FROM passed WHERE fp NOT IN (SELECT fp FROM base)) AS n_false_pos,
       (SELECT count(*) FROM batch) - (SELECT count(*) FROM passed) AS n_exact_checks_avoided
"""


QUERIES["dd_bloom_admit"] = dd_bloom_admit
ORACLES["dd_bloom_admit"] = _duck_bloom_admit_sql()


# --- dd_containment ----------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8


def dd_containment(t: dict[str, DataFrame]) -> DataFrame:
    """Asymmetric containment near-dup pairs: C(A→B) = |A∩B| / |A| on
    char-4-gram sets, flagged when either direction ≥
    {CONTAINMENT_THRESHOLD} — the near-SUPERSET case symmetric Jaccard
    misses (a short article pasted into a long boilerplate page scores
    J ≈ |A|/|B| ≈ 0 but containment ≈ 1; Broder's original resemblance
    /containment split).

    Reuses the checkpointed gram table; pairwise only within the
    blocking key (source — the bounded demo blocking). No size-ratio
    prune — asymmetric sizes are exactly the target — so block
    boundedness is the entire cost control. NOTE: LSH banding is NOT a
    valid blocking here (MinHash approximates Jaccard, and the target
    pairs have low Jaccard by definition); the production shape is the
    inverted-index candidate generation of ``dd_containment_idx``.
    Emits both directions' containment plus Jaccard for contrast,
    small-into-big orientation.
    """
    sets = _gram_table(t)
    a = sets.select(
        F.col("doc_id").alias("id_a"), "source", F.col("g").alias("g_a")
    ).withColumn("ng_a", F.size("g_a"))
    b = sets.select(
        F.col("doc_id").alias("id_b"), "source", F.col("g").alias("g_b")
    ).withColumn("ng_b", F.size("g_b"))
    # _set_isize: the corpus's exact-dup pairs (orig vs normalized copy)
    # sit in the same source block with identical gram arrays — they skip
    # the intersect; non-dup pairs pay one early-exit compare.
    inter = _set_isize("g_a", "g_b")
    pairs = (
        a.join(b, "source")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("inter", inter)
        .withColumn("cont_max", rnd(F.col("inter") / F.least("ng_a", "ng_b"), 4))
        .filter(F.col("cont_max") >= CONTAINMENT_THRESHOLD)
    )
    return pairs.select(
        "source",
        "id_a",
        "id_b",
        rnd(F.col("inter") / F.col("ng_a"), 4).alias("cont_a_in_b"),
        rnd(F.col("inter") / F.col("ng_b"), 4).alias("cont_b_in_a"),
        rnd(
            F.col("inter") / (F.col("ng_a") + F.col("ng_b") - F.col("inter")), 4
        ).alias("jaccard"),
        F.when(F.col("ng_a") <= F.col("ng_b"), F.lit("a_in_b"))
        .otherwise(F.lit("b_in_a"))
        .alias("direction"),
    ).orderBy("source", "id_a", "id_b")


def _duck_containment_sql() -> str:
    from pypers_spark.functions.text import duck_char_ngrams

    grams = (
        f"list_distinct(list_transform({duck_char_ngrams('text', 4)}, "
        f"s -> {duck_md5_int64('s')}))"
    )
    return f"""
WITH {DUCK_CORPUS},
sets AS (
  SELECT doc_id, source, {grams} AS g
  FROM corpus
  WHERE length({duck_normalize_text('text')}) >= 4
),
pairs AS (
  SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.g, b.g)) AS inter,
         len(a.g) AS ng_a, len(b.g) AS ng_b
  FROM sets a JOIN sets b ON a.source = b.source AND a.doc_id < b.doc_id
)
SELECT source, id_a, id_b,
       {duck_rnd('inter * 1.0 / ng_a', 4)} AS cont_a_in_b,
       {duck_rnd('inter * 1.0 / ng_b', 4)} AS cont_b_in_a,
       {duck_rnd('inter * 1.0 / (ng_a + ng_b - inter)', 4)} AS jaccard,
       CASE WHEN ng_a <= ng_b THEN 'a_in_b' ELSE 'b_in_a' END AS direction
FROM pairs
WHERE {duck_rnd('inter * 1.0 / least(ng_a, ng_b)', 4)} >= {CONTAINMENT_THRESHOLD}
ORDER BY source, id_a, id_b
"""


QUERIES["dd_containment"] = dd_containment
ORACLES["dd_containment"] = _duck_containment_sql()


# --- dd_containment_idx ------------------------------------------------------

CONT_IDX_TAU = 0.5      # containment threshold for the indexed variant
CONT_IDX_DF_CAP = 64    # drop postings of grams shared by > CAP docs (skew guard)
CONT_IDX_PREFILTER = 0.5  # candidate needs shared_uncapped >= PREFILTER·τ·|min|


def dd_containment_idx(t: dict[str, DataFrame]) -> DataFrame:
    """Production-shaped containment: candidates from an INVERTED WORD-
    3-GRAM INDEX instead of within-block pairwise — the scale path for
    asymmetric near-superset detection, where MinHash banding is the
    WRONG tool (a short doc inside a long one has low Jaccard, so LSH
    bands won't collide exactly on the target pairs).

    Plan: postings = (gram hash → doc) with hot grams capped at df ≤
    {CONT_IDX_DF_CAP} (the same skew discipline as the LSH bucket cap,
    QUALIFY-mirrored in the oracle); candidate pairs come from a
    postings self-join whose per-gram fan-out is bounded by the cap;
    the shared-gram COUNT falls out of the same aggregation (grams are
    distinct per doc — no array_intersect during candidate generation);
    a lossless-given-the-cap prefilter (shared ≥
    {CONT_IDX_PREFILTER}·τ·min size) shrinks the verify set; exact
    array-intersect containment runs only on survivors. Corpus-wide —
    no metadata blocking at all, unlike dd_containment's source-blocked
    demo. Cost: O(Σ_gram df²) with df ≤ cap, linear in corpus size.
    """
    from pypers_spark.functions.caching import tracked_persist

    c = corpus(t, repartition=False)
    n_part = int(c.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    toks = c.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("tk")
    ).repartition(n_part, F.col("doc_id"))
    tri = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 2),
        lambda i: md5_int64(
            F.concat_ws(
                " ",
                F.element_at(F.col("tk"), i.cast("int")),
                F.element_at(F.col("tk"), (i + 1).cast("int")),
                F.element_at(F.col("tk"), (i + 2).cast("int")),
            )
        ),
    )
    sets = tracked_persist(
        toks.filter(F.size("tk") >= 3)
        .select("doc_id", F.array_distinct(tri).alias("g"))
        .withColumn("ng", F.size("g")),
        "dedup.containment_idx_sets",
    )
    # Aggregate-and-expand, not a postings self-join (r11, guide
    # §2.3/§2.4 — the _band_candidates shape): collect each gram's
    # posting list into a sorted array on the SAME hash(gh)
    # partitioning the explode's exchange established (no window, no
    # re-shuffle), drop hot grams wider than the df cap, and emit the
    # C(df,2) ordered pairs with a nested in-row transform. The r10
    # self-join form shuffled the windowed 47 MB posting table once and
    # read it on BOTH join sides — 27 of the operator's 50 executor-
    # cpu-seconds at sf0.1; this form's widest exchange is the 6 MB
    # posting stream and the pair counts.
    post = sets.select("doc_id", F.explode("g").alias("gh"))
    # Explicit repartition (not a bare groupBy): AQE coalesces the 7 MB
    # posting exchange to ~6 partitions, but THIS stage expands 7 MB of
    # postings into ~47 MB of candidate pairs — the explicit count keeps
    # the C(df,2) expansion on the full machine (measured 6 -> 32 tasks).
    buckets = (
        post.repartition(n_part, F.col("gh"))
        .groupBy("gh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= CONT_IDX_DF_CAP))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size("ds")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    ga = sets.select(F.col("doc_id").alias("id_a"), F.col("g").alias("g_a"), F.col("ng").alias("ng_a"))
    gb = sets.select(F.col("doc_id").alias("id_b"), F.col("g").alias("g_b"), F.col("ng").alias("ng_b"))
    # Explicit broadcast of the doc-cardinality gram-set side (r11,
    # guide §3.1): size ESTIMATES made the planner broadcast the
    # candidate-pair AGGREGATION instead (BuildLeft over Exchange →
    # the 48 MB pair shuffle was read twice, once to build the
    # broadcast and once more downstream — 2×20 executor-cpu-s at
    # sf0.1). With the hint the pair stream is read ONCE and flows
    # through two broadcast hash joins in the same stage.
    verified = (
        cand.join(F.broadcast(ga), "id_a")
        .join(F.broadcast(gb), "id_b")
        .filter(
            F.col("shared")
            >= CONT_IDX_PREFILTER * CONT_IDX_TAU * F.least("ng_a", "ng_b")
        )
        .withColumn("inter", _set_isize("g_a", "g_b"))
        .withColumn("cont_max", rnd(F.col("inter") / F.least("ng_a", "ng_b"), 4))
        .filter(F.col("cont_max") >= CONT_IDX_TAU)
    )
    out = verified.select(
        "id_a",
        "id_b",
        "inter",
        "ng_a",
        "ng_b",
        "cont_max",
        F.when(F.col("ng_a") <= F.col("ng_b"), F.lit("a_in_b"))
        .otherwise(F.lit("b_in_a"))
        .alias("direction"),
    )
    # sort_barrier: without a boundary under the final sort, the range
    # sampler re-ran the whole pair aggregation + verify — both passes
    # reading the 48 MB pair exchange (28.9 + 8.7 cpu-s at sf0.1).
    return sort_barrier(out, "id_a").orderBy("id_a", "id_b")


def _duck_containment_idx_sql() -> str:
    tri = (
        "list_transform(range(1, len(tk) - 2 + 1 - 1 + 1), "
        "i -> " + duck_md5_int64("tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]") + ")"
    )
    return f"""
WITH {DUCK_CORPUS},
toks AS (
  SELECT doc_id, string_split({duck_normalize_text('text')}, ' ') AS tk FROM corpus
),
sets AS (
  SELECT doc_id, list_distinct({tri}) AS g, len(list_distinct({tri})) AS ng
  FROM toks WHERE len(tk) >= 3
),
post AS (SELECT doc_id, unnest(g) AS gh FROM sets),
post_c AS (
  SELECT doc_id, gh FROM post
  QUALIFY count(*) OVER (PARTITION BY gh) <= {CONT_IDX_DF_CAP}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM post_c a JOIN post_c b ON a.gh = b.gh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
verified AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.g, sb.g)) AS inter,
         sa.ng AS ng_a, sb.ng AS ng_b
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE c.shared >= {CONT_IDX_PREFILTER} * {CONT_IDX_TAU} * least(sa.ng, sb.ng)
)
SELECT id_a, id_b, CAST(inter AS INT) AS inter,
       CAST(ng_a AS INT) AS ng_a, CAST(ng_b AS INT) AS ng_b,
       {duck_rnd('inter * 1.0 / least(ng_a, ng_b)', 4)} AS cont_max,
       CASE WHEN ng_a <= ng_b THEN 'a_in_b' ELSE 'b_in_a' END AS direction
FROM verified
WHERE {duck_rnd('inter * 1.0 / least(ng_a, ng_b)', 4)} >= {CONT_IDX_TAU}
ORDER BY id_a, id_b
"""


QUERIES["dd_containment_idx"] = dd_containment_idx
ORACLES["dd_containment_idx"] = _duck_containment_idx_sql()


# --- dd_soft_weights ---------------------------------------------------------


def dd_soft_weights(t: dict[str, DataFrame]) -> DataFrame:
    """SoftDeDup-style training weights: instead of DROPPING near-dup
    group members (dd_minhash_drop_list → dd_minhash_apply), keep every
    document and weight it 1/|group| so each near-duplicate cluster
    contributes one document's worth of gradient — the soft alternative
    training recipes use when hard dedup is too lossy.

    Reuses the converged component labels; the corpus left-joins them
    (docs outside any pair group keep weight 1.0), group sizes come
    from one count per label, and the per-source rollup reports doc
    count vs EFFECTIVE doc count (Σ weights — the gradient-mass
    equivalent the hard drop would have kept). Weight sums go through
    the 1e-6 int quantization, order-independent.
    """
    labels = _minhash_component_labels(t)
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("group_size"))
    member = labels.join(F.broadcast(sizes), "lbl").select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("group_id"),
        "group_size",
    )
    c = corpus(t).select("doc_id", "source")
    joined = c.join(F.broadcast(member), "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("group_size"), F.lit(1)).alias("group_size"),
    )
    w = 1.0 / F.col("group_size").cast("double")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("group_size") > 1, 1)).alias("n_grouped"),
            rnd(
                (F.sum(F.floor(w * 1e6 + F.lit(0.5))) / 1e6), 4
            ).alias("effective_docs"),
        )
        .orderBy("source")
    )


def _duck_soft_weights_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_drop_ctes()},
sizes AS (SELECT lbl, count(*) AS group_size FROM cl GROUP BY lbl),
member AS (
  SELECT cl.node AS doc_id, cl.lbl AS group_id, sizes.group_size
  FROM cl JOIN sizes ON cl.lbl = sizes.lbl
),
joined AS (
  SELECT c.doc_id, c.source, coalesce(m.group_size, 1) AS group_size
  FROM corpus c LEFT JOIN member m ON c.doc_id = m.doc_id
)
SELECT source, count(*) AS n_docs,
       count(CASE WHEN group_size > 1 THEN 1 END) AS n_grouped,
       {duck_rnd('sum(CAST(floor((1.0 / CAST(group_size AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0', 4)}
         AS effective_docs
FROM joined GROUP BY source ORDER BY source
"""


QUERIES["dd_soft_weights"] = dd_soft_weights
ORACLES["dd_soft_weights"] = _duck_soft_weights_sql()


# --- dd_minhash_incremental --------------------------------------------------


def dd_minhash_incremental(t: dict[str, DataFrame]) -> DataFrame:
    """NEAR-dup admit at ingest: dd_incremental's exact-fingerprint gate
    upgraded to MinHash — each batch document's LSH bands probe the
    base corpus's (df-capped) band index; only colliding pairs pay an
    exact Jaccard verify; batch docs with no verified match ≥ τ admit.

    The batch is half near-duplicates (base text + a 3-word suffix —
    J = n/(n+3) on word-3-shingles, above τ={JACCARD_THRESHOLD} for
    docs with ≥ 14 words, deterministically below it for shorter ones,
    so the report shows both outcomes) and half genuinely fresh
    (word-reversed text — near-zero shingle overlap). Per batch doc:
    candidate count, best verified Jaccard, matched base id, admit
    flag. At 100 TB the base band index is the persisted artifact
    (table_checkpoint family); a batch probes it with a broadcast-sized
    band join and the verify touches only collisions — ingest cost is
    O(batch), never O(corpus).
    """
    d = t["documents"].select("doc_id", "text")
    rev = F.concat_ws(
        " ", F.reverse(F.split(normalize_text(F.col("text")), " "))
    )
    batch = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" zq augmented row")))
        .otherwise(rev)
        .alias("text"),
    )
    # ONE tokenization pass for BOTH shingle-set tables (r11, guide
    # §2.1): _shingle_sets_of(d) + _shingle_sets_of(batch) each ran the
    # scan → normalize_text regex → split chain over the whole corpus
    # (10.6 + 10.8 executor-cpu-s at sf0.1). The batch variants are
    # exact TOKEN-level transforms of the base tokens — reversal for
    # odd ids; append ["zq","augmented","row"] for even (normalize is
    # trim+collapse+lower, so tokens(normalize(text + " zq augmented
    # row")) = tokens ++ suffix, with the all-whitespace-text edge case
    # guarded explicitly) — so both gram/md5 chains run in one
    # projection over one tokenize. btk is BOUND as a column before the
    # gram lambdas reference it (the 527011c lesson: an unbound
    # expression inside a transform re-evaluates per element).
    from pypers_spark.functions.caching import tracked_persist

    suffix = F.array(F.lit("zq"), F.lit("augmented"), F.lit("row"))
    toks = _repartitioned(
        d.select(
            "doc_id", F.split(normalize_text(F.col("text")), " ").alias("tk")
        )
    )
    is_blank = (F.size("tk") == 1) & (F.element_at(F.col("tk"), 1) == F.lit(""))
    btk_expr = F.when(
        F.col("doc_id") % 2 == 0,
        F.when(is_blank, suffix).otherwise(F.concat(F.col("tk"), suffix)),
    ).otherwise(F.reverse(F.col("tk")))
    both = toks.select("doc_id", "tk", btk_expr.alias("btk"))

    def _hs(tkc):
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ",
            F.element_at(tkc, i),
            F.element_at(tkc, i + 1),
            F.element_at(tkc, i + 2),
        )
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tkc) - 2), lambda i: md5_int64(gram(i))
            )
        )

    pair_sets = tracked_persist(
        both.select(
            "doc_id",
            F.when(F.size("tk") >= 3, _hs(F.col("tk"))).alias("hs_base"),
            F.when(F.size("btk") >= 3, _hs(F.col("btk"))).alias("hs_batch"),
        ).filter(F.col("hs_base").isNotNull() | F.col("hs_batch").isNotNull()),
        "dedup.incr_sets",
    )
    base_sets = pair_sets.filter(F.col("hs_base").isNotNull()).select(
        "doc_id", F.col("hs_base").alias("hs")
    )
    batch_sets = pair_sets.filter(F.col("hs_batch").isNotNull()).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), F.col("hs_batch").alias("hs")
    )
    # ONE minhash/band chain over the UNION of base and batch sets,
    # then aggregate-and-expand per bucket (r11, guide §2.3): the old
    # form ran _bands_of twice — two 64-affine-minhash passes in two
    # CONCURRENT stages that raced to build the shared sets cache
    # (14.5 + 12.9 executor-cpu-s at sf0.1) — and probed with a band
    # self-join plus a width window. Here the union pays the minhash
    # once, the bucket groupBy is the only exchange, the base-width cap
    # is size() of the collected base ids (identical to the old
    # count(*) window over base rows), and the qid×bid expansion is an
    # in-row explode. collect_list skips the when()'s nulls, so each
    # side's id list is exact.
    ab = _bands_of(base_sets.unionByName(batch_sets))
    buckets = (
        ab.groupBy("band", *BAND_KEY_COLS)
        .agg(
            F.collect_list(
                F.when(F.col("doc_id") < 1000000, F.col("doc_id"))
            ).alias("base_ids"),
            F.collect_list(
                F.when(F.col("doc_id") >= 1000000, F.col("doc_id"))
            ).alias("q_ids"),
        )
        .filter(
            (F.size("base_ids") >= 1)
            & (F.size("base_ids") <= LSH_MAX_BUCKET_WIDTH)
            & (F.size("q_ids") >= 1)
        )
    )
    cand = (
        buckets.select(F.explode("q_ids").alias("qid"), "base_ids")
        .select("qid", F.explode("base_ids").alias("bid"))
        .distinct()
    )
    qhs = batch_sets.select(F.col("doc_id").alias("qid"), F.col("hs").alias("hs_q"))
    bhs = base_sets.select(F.col("doc_id").alias("bid"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_q", "hs_b"))
    union = F.size("hs_q") + F.size("hs_b") - inter
    verified = (
        cand.join(qhs, "qid")
        .join(bhs, "bid")
        .withColumn("jaccard", rnd(inter / union, 4))
    )
    # ONE aggregation pass for candidate count AND verify stats (r11,
    # guide §2.1): cand used to feed two consumers (a bare count and
    # the jaccard readout), and exchange reuse does NOT fire across the
    # two branches (each re-ran the whole minhash/bucket chain — two
    # identical 17 executor-cpu-s stages at sf0.1). The verify joins
    # are LOSSLESS (every cand qid/bid comes from the band explode of
    # the same sets tables they join back to), so count(*) over
    # verified equals the old pre-verify candidate count, and the
    # threshold moves into conditional aggregates.
    qstats = verified.groupBy("qid").agg(
        F.count("*").alias("n_candidates"),
        F.max(
            F.when(F.col("jaccard") >= JACCARD_THRESHOLD, F.col("jaccard"))
        ).alias("best_jaccard"),
        F.min(
            F.when(F.col("jaccard") >= JACCARD_THRESHOLD, F.col("bid"))
        ).alias("matched_base"),
    )
    out = (
        batch.select(F.col("doc_id").alias("qid"))
        .join(qstats, "qid", "left")
        .select(
            F.col("qid").alias("doc_id"),
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
            "best_jaccard",
            "matched_base",
            F.col("matched_base").isNull().cast("int").alias("admitted"),
        )
    )
    # sort_barrier: the batch-probe left join sits directly under the
    # final sort of a batch-cardinality readout; without a boundary the
    # range sampler re-executes it (functions/barrier.py).
    return sort_barrier(out, "doc_id").orderBy("doc_id")


def _duck_minhash_incr_sql() -> str:
    mh_elems = ", ".join(
        f"list_min(list_transform(hs, h -> {duck_affine_hash('h', j)}))"
        for j in range(N_HASHES)
    )
    key_list = ", ".join(BAND_KEY_COLS)

    def band_union(src):
        return "\n  UNION ALL\n".join(
            "  SELECT doc_id, {b} AS band, {keys} FROM {src}".format(
                b=b,
                keys=", ".join(_duck_packed_band_keys(b, lambda i: f"mh[{i + 1}]")),
                src=src,
            )
            for b in range(N_BANDS)
        )

    on_keys = " AND ".join(f"q.{k} = b.{k}" for k in ["band", *BAND_KEY_COLS])
    rev = f"array_to_string(list_reverse(string_split({duck_normalize_text('text')}, ' ')), ' ')"
    return f"""
WITH base AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 2 = 0 THEN text || ' zq augmented row'
              ELSE {rev} END AS text
  FROM documents
),
bsets AS (
  SELECT doc_id, list_transform({_duck_shingles('text')}, s -> {duck_md5_int64('s')}) AS hs
  FROM base
  WHERE len(string_split({duck_normalize_text('text')}, ' ')) >= 3
),
qsets AS (
  SELECT doc_id, list_transform({_duck_shingles('text')}, s -> {duck_md5_int64('s')}) AS hs
  FROM batch
  WHERE len(string_split({duck_normalize_text('text')}, ' ')) >= 3
),
bmh AS (SELECT doc_id, hs, [{mh_elems}] AS mh FROM bsets),
qmh AS (SELECT doc_id, hs, [{mh_elems}] AS mh FROM qsets),
bbands_all AS (
{band_union('bmh')}
),
bbands AS (
  SELECT doc_id, band, {key_list} FROM bbands_all
  QUALIFY count(*) OVER (PARTITION BY band, {key_list}) <= {LSH_MAX_BUCKET_WIDTH}
),
qbands AS (
{band_union('qmh')}
),
cand AS (
  SELECT DISTINCT q.doc_id AS qid, b.doc_id AS bid
  FROM qbands q JOIN bbands b ON {on_keys}
),
verified AS (
  SELECT c.qid, c.bid,
         {duck_rnd('len(list_intersect(q.hs, b.hs)) * 1.0 / (len(q.hs) + len(b.hs) - len(list_intersect(q.hs, b.hs)))', 4)} AS jaccard
  FROM cand c JOIN qsets q ON q.doc_id = c.qid JOIN bsets b ON b.doc_id = c.bid
),
cand_agg AS (SELECT qid, count(*) AS n_candidates FROM cand GROUP BY qid),
ver_agg AS (
  SELECT qid, max(jaccard) AS best_jaccard, min(bid) AS matched_base
  FROM verified WHERE jaccard >= {JACCARD_THRESHOLD} GROUP BY qid
)
SELECT bt.doc_id AS doc_id,
       coalesce(c.n_candidates, 0) AS n_candidates,
       v.best_jaccard,
       v.matched_base,
       CAST(v.matched_base IS NULL AS INT) AS admitted
FROM batch bt
LEFT JOIN cand_agg c ON c.qid = bt.doc_id
LEFT JOIN ver_agg v ON v.qid = bt.doc_id
ORDER BY doc_id
"""


QUERIES["dd_minhash_incremental"] = dd_minhash_incremental
ORACLES["dd_minhash_incremental"] = _duck_minhash_incr_sql()


# --- dd_fuzzy_names ----------------------------------------------------------

FZ_TYPO_MOD = 3  # batch rows with custkey % 3 == 0 get a last-char typo
FZ_MAX_DIST = 2  # edit-distance match threshold
FZ_BLOCK_LEN = 8  # block on the first 8 of the 9 name digits


def dd_fuzzy_names(t: dict[str, DataFrame]) -> DataFrame:
    """Entity resolution by blocked edit distance: a dirty batch of
    customer names (deterministic last-char typo for every third key,
    an un-matchable '-dup' suffix otherwise) is matched against the
    clean registry — block on the digit prefix, verify with
    levenshtein ≤ {FZ_MAX_DIST} inside the block.

    Blocking bounds the pairwise work to |block|² with ~10-name blocks
    (the same discipline as every LSH/IVF operator here: the quadratic
    step runs only inside a bounded block); levenshtein is exact
    integer edit distance, bit-identical across engines. The readout is
    per perturbation kind: candidates generated, rows matched, and the
    ambiguity rate — a typo'd digit matches EVERY sibling in its block
    at distance 1, which is exactly the blocking-ambiguity a production
    resolver must arbitrate (here: min-distance then min-key).
    """
    base = t["customer"].select(F.col("c_name").alias("name"))
    batch = t["customer"].select(
        F.col("c_custkey").alias("key"),
        F.when(
            F.col("c_custkey") % FZ_TYPO_MOD == 0,
            F.concat(F.substring(F.col("c_name"), 1, 17), F.lit("X")),
        )
        .otherwise(F.concat(F.col("c_name"), F.lit("-dup")))
        .alias("dirty"),
        F.when(F.col("c_custkey") % FZ_TYPO_MOD == 0, F.lit("typo"))
        .otherwise(F.lit("suffix"))
        .alias("kind"),
    )
    block = lambda c: F.substring(c, 10, FZ_BLOCK_LEN)  # noqa: E731
    cands = batch.withColumn("blk", block(F.col("dirty"))).join(
        base.withColumn("blk", block(F.col("name"))), "blk"
    )
    scored = cands.select(
        "key", "kind", F.levenshtein(F.col("dirty"), F.col("name")).alias("dist")
    )
    per_row = scored.groupBy("key", "kind").agg(
        F.count("*").alias("n_cand"),
        F.min("dist").alias("best_dist"),
        F.count(F.when(F.col("dist") <= FZ_MAX_DIST, 1)).alias("n_matches"),
    )
    return (
        per_row.groupBy("kind")
        .agg(
            F.count("*").alias("n_batch"),
            F.count(F.when(F.col("best_dist") <= FZ_MAX_DIST, 1)).alias("n_matched"),
            F.sum("n_cand").alias("n_candidates"),
            F.sum("n_matches").alias("n_match_pairs"),
            F.min("best_dist").alias("min_dist"),
            F.max("best_dist").alias("max_dist"),
        )
        .orderBy("kind")
    )


ORACLE_FUZZY_NAMES = f"""
WITH batch AS (
  SELECT c_custkey AS key,
         CASE WHEN c_custkey % {FZ_TYPO_MOD} = 0
              THEN substr(c_name, 1, 17) || 'X'
              ELSE c_name || '-dup' END AS dirty,
         CASE WHEN c_custkey % {FZ_TYPO_MOD} = 0 THEN 'typo'
              ELSE 'suffix' END AS kind
  FROM customer
),
cands AS (
  SELECT b.key AS key, b.kind AS kind,
         levenshtein(b.dirty, c.c_name) AS dist
  FROM batch b JOIN customer c
    ON substr(b.dirty, 10, {FZ_BLOCK_LEN}) = substr(c.c_name, 10, {FZ_BLOCK_LEN})
),
per_row AS (
  SELECT key, kind, count(*) AS n_cand, min(dist) AS best_dist,
         count(CASE WHEN dist <= {FZ_MAX_DIST} THEN 1 END) AS n_matches
  FROM cands GROUP BY 1, 2
)
SELECT kind, count(*) AS n_batch,
       count(CASE WHEN best_dist <= {FZ_MAX_DIST} THEN 1 END) AS n_matched,
       CAST(sum(n_cand) AS BIGINT) AS n_candidates,
       CAST(sum(n_matches) AS BIGINT) AS n_match_pairs,
       min(best_dist) AS min_dist,
       max(best_dist) AS max_dist
FROM per_row
GROUP BY kind
ORDER BY kind
"""

QUERIES["dd_fuzzy_names"] = dd_fuzzy_names
ORACLES["dd_fuzzy_names"] = ORACLE_FUZZY_NAMES


# --- dd_source_overlap -------------------------------------------------------

SRC_OVL_TOP_K = 15


def dd_source_overlap(t: dict[str, DataFrame]) -> DataFrame:
    """Dataset-level overlap matrix: Jaccard similarity of word-3-gram
    vocabularies between SOURCE pairs — the corpus-vs-corpus
    contamination/redundancy readout that decides whether two acquired
    datasets are worth keeping separately (doc-level dedup answers a
    different question). Top-{SRC_OVL_TOP_K} most-overlapping pairs.

    Shape: one distinct (source, gram) postings table; the pair
    intersection is a postings SELF-JOIN keyed on the gram (the
    inverted-index idiom — never |sources|² vocabulary scans), per-pair
    union by inclusion-exclusion from broadcast per-source sizes.
    """
    posts = (
        corpus(t)
        .select("source", F.split(normalize_text(F.col("text")), " ").alias("tk"))
        .select("source", F.explode(_spread_grams(F.col("tk"))).alias("g"))
        .distinct()
    )
    sizes = posts.groupBy("source").agg(F.count("*").alias("n_grams"))
    a = posts.select(F.col("source").alias("src_a"), "g")
    b = posts.select(F.col("source").alias("src_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_grams").alias("nb"))
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select("src_a", "src_b", "n_inter", "na", "nb", rnd(jac, 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "src_a", "src_b")
        .limit(SRC_OVL_TOP_K)
    )


def _spread_grams(tk):
    """Distinct word-3-gram STRINGS of a BOUND token-array column (not
    hashed — the vocabulary table is source-cardinality-bounded).

    ``tk`` must be a projected column (``F.col``), never an inline
    ``F.split(...)`` expression: Catalyst re-evaluates an inline
    argument for every element of the transform's sequence (each gram
    would re-tokenize the whole document — measured ~6x the operator's
    wall at sf0.1)."""
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(tk, i), F.element_at(tk, i + 1), F.element_at(tk, i + 2)
    )
    return F.when(
        F.size(tk) >= 3,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(tk) - 2), lambda i: gram(i))
        ),
    ).otherwise(F.array().cast("array<string>"))


ORACLE_SOURCE_OVERLAP = f"""
WITH {DUCK_CORPUS},
toks AS (
  SELECT source, string_split({duck_normalize_text('text')}, ' ') AS tk FROM corpus
),
posts AS (
  SELECT DISTINCT source, unnest({_duck_word_ngrams('tk', 3)}) AS g
  FROM toks WHERE len(tk) >= 3
),
sizes AS (SELECT source, count(*) AS n_grams FROM posts GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM posts a JOIN posts b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter, sa.n_grams AS na, sb.n_grams AS nb,
       {duck_rnd('CAST(n_inter AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE)', 6)}
         AS jaccard
FROM inter
JOIN sizes sa ON inter.src_a = sa.source
JOIN sizes sb ON inter.src_b = sb.source
ORDER BY jaccard DESC, src_a, src_b
LIMIT {SRC_OVL_TOP_K}
"""

QUERIES["dd_source_overlap"] = dd_source_overlap
ORACLES["dd_source_overlap"] = ORACLE_SOURCE_OVERLAP


# --- dd_source_overlap_kmv ---------------------------------------------------

SRC_KMV_K = 128  # min-K sketch width per source


def dd_source_overlap_kmv(t: dict[str, DataFrame]) -> DataFrame:
    """Sketch-based source-overlap matrix — the 100 TB path for
    dd_source_overlap: per-source KMV (min-K) sketches of the gram
    vocabulary replace the postings self-join entirely.

    Why: the exact version's inverted-index join fans out C(k,2) pairs
    per gram shared by k sources — fine per-gram, but the TOTAL join
    output grows with vocabulary x source-overlap (SCALE_r05 measures
    it ~16x wall at 20x rows vs ~3x here, 15x faster absolute, and the
    10x→20x step is 1.3 vs the exact join's 2.5). Here every source
    collapses to
    {SRC_KMV_K} int64 hashes (one window top-K per source), and ALL
    pairwise estimates are computed on the S·K-row sketch table:
    θ_pair = min(θ_a, θ_b); hashes below θ are a uniform sample of the
    pair's union at rate θ/2^60, so |A∩B| ≈ c·2^60/θ, |A∪B| ≈ u·2^60/θ
    and Jaccard ≈ c/u — the theta-sketch estimator (same algebra as
    sk_kmv_set_ops), all exact integer/double arithmetic, so the
    DuckDB oracle reproduces every estimate bit-for-bit. At 100 TB the
    sketches are mergeable per partition and the pairwise stage is
    S²·K rows of int64 — independent of corpus size.
    """
    posts = (
        corpus(t)
        .select("source", F.split(normalize_text(F.col("text")), " ").alias("tk"))
        .select("source", F.explode(_spread_grams(F.col("tk"))).alias("g"))
        .distinct()
    )
    hs = posts.select("source", md5_int64(F.col("g")).alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = hs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= SRC_KMV_K
    ).select("source", "h")
    from pypers_spark.functions.caching import tracked_persist

    sk = tracked_persist(sk, "dedup.src_kmv_sketches")
    th = sk.groupBy("source").agg(F.max("h").alias("theta"))
    pth = (
        th.select(F.col("source").alias("src_a"), F.col("theta").alias("ta"))
        .join(
            th.select(F.col("source").alias("src_b"), F.col("theta").alias("tb")),
            F.col("src_a") < F.col("src_b"),
        )
        .select("src_a", "src_b", F.least("ta", "tb").alias("theta"))
    )
    ka = sk.select(F.col("source").alias("src_a"), "h")
    kb = sk.select(F.col("source").alias("src_b"), "h")
    c = (
        ka.join(kb, "h")
        .join(F.broadcast(pth), ["src_a", "src_b"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    below_a = (
        F.broadcast(pth)
        .join(ka, "src_a")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.when(F.col("h") < F.col("theta"), 1)).alias("below_a"))
    )
    below_b = (
        F.broadcast(pth)
        .join(kb, "src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.when(F.col("h") < F.col("theta"), 1)).alias("below_b"))
    )
    u = F.col("below_a") + F.col("below_b") - F.col("n_common")
    jac = F.when(
        u > 0, F.col("n_common").cast("double") / u.cast("double")
    ).otherwise(F.lit(0.0))
    est_inter = F.col("n_common").cast("double") * F.lit(float(1 << 60)) / F.col(
        "theta"
    ).cast("double")
    est_union = u.cast("double") * F.lit(float(1 << 60)) / F.col("theta").cast(
        "double"
    )
    return (
        pth.join(c, ["src_a", "src_b"], "left")
        .na.fill({"n_common": 0})
        .join(below_a, ["src_a", "src_b"])
        .join(below_b, ["src_a", "src_b"])
        .select(
            "src_a",
            "src_b",
            "n_common",
            rnd(est_inter, 2).alias("est_inter"),
            rnd(est_union, 2).alias("est_union"),
            rnd(jac, 6).alias("jaccard_est"),
        )
        .orderBy(F.desc("jaccard_est"), "src_a", "src_b")
        .limit(SRC_OVL_TOP_K)
    )


ORACLE_SOURCE_OVERLAP_KMV = f"""
WITH {DUCK_CORPUS},
toks AS (
  SELECT source, string_split({duck_normalize_text('text')}, ' ') AS tk FROM corpus
),
posts AS (
  SELECT DISTINCT source, unnest({_duck_word_ngrams('tk', 3)}) AS g
  FROM toks WHERE len(tk) >= 3
),
hs AS (SELECT DISTINCT source, {duck_md5_int64('g')} AS h FROM posts),
sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
    FROM hs
  ) WHERE rk <= {SRC_KMV_K}
),
th AS (SELECT source, max(h) AS theta FROM sk GROUP BY 1),
pth AS (
  SELECT a.source AS src_a, b.source AS src_b,
         least(a.theta, b.theta) AS theta
  FROM th a JOIN th b ON a.source < b.source
),
c AS (
  SELECT ka.source AS src_a, kb.source AS src_b, count(*) AS n_common
  FROM sk ka
  JOIN sk kb ON ka.h = kb.h AND ka.source < kb.source
  JOIN pth p ON p.src_a = ka.source AND p.src_b = kb.source
  WHERE ka.h < p.theta
  GROUP BY 1, 2
),
ba AS (
  SELECT p.src_a, p.src_b,
         count(CASE WHEN s.h < p.theta THEN 1 END) AS below_a
  FROM pth p JOIN sk s ON s.source = p.src_a
  GROUP BY 1, 2
),
bb AS (
  SELECT p.src_a, p.src_b,
         count(CASE WHEN s.h < p.theta THEN 1 END) AS below_b
  FROM pth p JOIN sk s ON s.source = p.src_b
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b,
       coalesce(c.n_common, 0) AS n_common,
       {duck_rnd(
           'CAST(coalesce(c.n_common, 0) AS DOUBLE) * ' + str(float(1 << 60))
           + ' / CAST(p.theta AS DOUBLE)', 2)} AS est_inter,
       {duck_rnd(
           'CAST(ba.below_a + bb.below_b - coalesce(c.n_common, 0) AS DOUBLE) * '
           + str(float(1 << 60)) + ' / CAST(p.theta AS DOUBLE)', 2)} AS est_union,
       {duck_rnd(
           'CASE WHEN ba.below_a + bb.below_b - coalesce(c.n_common, 0) > 0 '
           'THEN CAST(coalesce(c.n_common, 0) AS DOUBLE) '
           '/ CAST(ba.below_a + bb.below_b - coalesce(c.n_common, 0) AS DOUBLE) '
           'ELSE 0.0 END', 6)} AS jaccard_est
FROM pth p
LEFT JOIN c ON c.src_a = p.src_a AND c.src_b = p.src_b
JOIN ba ON ba.src_a = p.src_a AND ba.src_b = p.src_b
JOIN bb ON bb.src_a = p.src_a AND bb.src_b = p.src_b
ORDER BY jaccard_est DESC, p.src_a, p.src_b
LIMIT {SRC_OVL_TOP_K}
"""

QUERIES["dd_source_overlap_kmv"] = dd_source_overlap_kmv
ORACLES["dd_source_overlap_kmv"] = ORACLE_SOURCE_OVERLAP_KMV


# --- pipe_entity_resolution --------------------------------------------------

ER_TYPO_MOD = 4    # every 4th customer gets a last-digit-typo clone
ER_SPACED_MOD = 8  # every 8th ALSO gets a trailing-space clone (3-chains)
ER_MAX_DIST = 2    # name edit-distance threshold


def pipe_entity_resolution(t: dict[str, DataFrame]) -> DataFrame:
    """Composed entity-resolution pipeline — the record-linkage job a
    master-data/CRM consolidation runs, end-to-end in ONE Catalyst
    plan: dirty registry → blocking → pairwise scoring → transitive
    clustering → survivorship report.

    Fixture (in-plan, both engines identical): each customer is a
    'clean' record; every {ER_TYPO_MOD}th key adds a last-digit-typo
    clone, every {ER_SPACED_MOD}th also a trailing-space clone — so the
    truth is a mix of singletons, 2-chains, and 3-chains (typo↔spaced
    are distance 2 apart: transitivity is exercised, not just direct
    matches). Stages:
    1. BLOCK on the name's digit prefix (excludes the perturbed last
       digit) — pairwise work bounded to ~30-record blocks, the same
       discipline as every LSH/IVF operator here.
    2. SCORE within block: levenshtein ≤ {ER_MAX_DIST} AND exact
       acctbal agreement. The attribute test is what disambiguates the
       sibling-at-distance-1 ambiguity dd_fuzzy_names *reports*; this
       pipeline *resolves* it.
    3. CLUSTER with pointer-doubling min-label components
       (functions/components.py — third consumer, O(log diameter)).
    4. SURVIVE: canonical = min rec_id per cluster (the clean record
       by construction); report cluster-size × member-kind signature
       counts — the shape a data steward signs off on.
    The oracle replays all four stages in SQL (recursive CTE for the
    closure), so the composed pipeline is value-gated, not just its
    pieces.
    """
    from pypers_spark.functions.components import min_label_components

    c = t["customer"]
    clean = c.select(
        (F.col("c_custkey") * 10).alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.lit("clean").alias("kind"),
    )
    typo = c.filter(F.col("c_custkey") % ER_TYPO_MOD == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rec_id"),
        F.concat(F.substring(F.col("c_name"), 1, 17), F.lit("X")).alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.lit("typo").alias("kind"),
    )
    spaced = c.filter(F.col("c_custkey") % ER_SPACED_MOD == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("rec_id"),
        F.concat(F.col("c_name"), F.lit(" ")).alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.lit("spaced").alias("kind"),
    )
    reg = clean.unionByName(typo).unionByName(spaced)
    blk = F.substring(F.col("name"), 10, FZ_BLOCK_LEN)
    a = reg.select(
        F.col("rec_id").alias("id_a"), F.col("name").alias("na"),
        F.col("bal").alias("ba"), blk.alias("blk"),
    )
    b = reg.select(
        F.col("rec_id").alias("id_b"), F.col("name").alias("nb"),
        F.col("bal").alias("bb"), blk.alias("blk"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein(F.col("na"), F.col("nb")) <= ER_MAX_DIST)
        .filter(F.col("ba") == F.col("bb"))
        .select("id_a", "id_b")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = reg.select(F.col("rec_id").alias("node"), F.col("rec_id").alias("lbl"))
    comp = min_label_components(edges, labels, "dedup.er_labels")
    members = reg.join(
        comp, reg["rec_id"] == comp["node"]
    ).select("rec_id", "kind", F.col("lbl").alias("cluster_id"))
    per_cluster = members.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.concat(
            F.when(F.max(F.when(F.col("kind") == "clean", 1)) == 1, F.lit("c")).otherwise(F.lit("")),
            F.when(F.max(F.when(F.col("kind") == "spaced", 1)) == 1, F.lit("s")).otherwise(F.lit("")),
            F.when(F.max(F.when(F.col("kind") == "typo", 1)) == 1, F.lit("t")).otherwise(F.lit("")),
        ).alias("member_kinds"),
        F.min("rec_id").alias("canonical"),
    )
    return (
        per_cluster.groupBy("cluster_size", "member_kinds")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_size").alias("n_records"),
            F.count(
                F.when(F.col("canonical") % 10 == 0, 1)
            ).alias("n_clean_canonical"),
        )
        .orderBy(F.desc("cluster_size"), "member_kinds")
    )


ORACLE_ENTITY_RESOLUTION = f"""
WITH RECURSIVE reg AS (
  SELECT c_custkey * 10 AS rec_id, c_name AS name, c_acctbal AS bal,
         'clean' AS kind
  FROM customer
  UNION ALL
  SELECT c_custkey * 10 + 1, substr(c_name, 1, 17) || 'X', c_acctbal, 'typo'
  FROM customer WHERE c_custkey % {ER_TYPO_MOD} = 0
  UNION ALL
  SELECT c_custkey * 10 + 2, c_name || ' ', c_acctbal, 'spaced'
  FROM customer WHERE c_custkey % {ER_SPACED_MOD} = 0
),
pairs AS (
  SELECT a.rec_id AS id_a, b.rec_id AS id_b
  FROM reg a JOIN reg b
    ON substr(a.name, 10, {FZ_BLOCK_LEN}) = substr(b.name, 10, {FZ_BLOCK_LEN})
   AND a.rec_id < b.rec_id
  WHERE levenshtein(a.name, b.name) <= {ER_MAX_DIST}
    AND a.bal = b.bal
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT rec_id, rec_id FROM reg
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY 1),
members AS (
  SELECT r.rec_id, r.kind, c.cluster_id
  FROM reg r JOIN comp c ON r.rec_id = c.node
),
per_cluster AS (
  SELECT cluster_id, count(*) AS cluster_size,
         (CASE WHEN max(CASE WHEN kind = 'clean' THEN 1 END) = 1 THEN 'c' ELSE '' END)
         || (CASE WHEN max(CASE WHEN kind = 'spaced' THEN 1 END) = 1 THEN 's' ELSE '' END)
         || (CASE WHEN max(CASE WHEN kind = 'typo' THEN 1 END) = 1 THEN 't' ELSE '' END)
           AS member_kinds,
         min(rec_id) AS canonical
  FROM members GROUP BY cluster_id
)
SELECT cluster_size, member_kinds,
       count(*) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_records,
       count(CASE WHEN canonical % 10 = 0 THEN 1 END) AS n_clean_canonical
FROM per_cluster
GROUP BY cluster_size, member_kinds
ORDER BY cluster_size DESC, member_kinds
"""

QUERIES["pipe_entity_resolution"] = pipe_entity_resolution
ORACLES["pipe_entity_resolution"] = ORACLE_ENTITY_RESOLUTION
