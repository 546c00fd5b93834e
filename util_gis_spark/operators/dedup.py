"""Training-data deduplication operators over the documents table:

- exact dedup (md5 hash-groupBy) — in queries.py
- MinHash + LSH banding -> candidate pairs -> exact Jaccard verify
- SimHash (bit-majority fingerprint) + hamming-radius pairs
- n-gram Jaccard verification kernel

Everything is JVM-side Spark HOFs (transform/aggregate/filter) — no
Python UDFs — and every constant lives HERE so the Spark pipeline and
the DuckDB oracle (built by the *_sql functions) cannot drift.

Scale notes: MinHash-LSH is the linear-scale path (band buckets ->
shuffle join on (band, hash)); exact pairwise Jaccard only runs on
band-collision candidates. At 10^12 docs the band join is the same
cell-join pattern as the spatial engine: hash-partition on band
bucket, AQE skew handling for hot buckets (boilerplate dedup text).
"""

from __future__ import annotations

import hashlib
import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The ONE kernel tokenizer (r6 review: three kernels carried private
# copies of the compile + filter). ASCII \s+ == Spark's Java \s+ split
# and the oracle's explicit class (_toks_sql); str.split() would also
# split Unicode whitespace (e.g. NBSP) and silently diverge.
_WS_ASCII = _re.compile(r"\s+", _re.ASCII)


def _tokens(text: str) -> list[str]:
    return [t for t in _WS_ASCII.split(text) if t]

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = 4
MOD30 = 1 << 30  # shingle hash domain (keeps a*h within int64)
_A = [(37 + 8 * i) * 2654435761 % 1048573 for i in range(N_HASHES)]  # a_i < 2^20
_B = [(101 + 31 * i) * 48271 % MOD30 for i in range(N_HASHES)]
_P = 1073741789  # largest prime < 2^30


def _toks(col: str = "text"):
    return F.filter(F.split(F.col(col), r"\s+"), lambda x: F.length(x) > 0)


def _toks_sql(col: str = "text") -> str:
    # explicit class, NOT '\\s+': DuckDB's RE2 \s is [\t\n\f\r ] —
    # missing \x0B (vertical tab) — while Java \s (the Spark split)
    # and Python re.ASCII \s both include it, so '\\s+' silently
    # tokenized 'a\x0Bb' differently across engines (r6 review)
    return f"list_filter(string_split_regex({col}, '[ \\t\\n\\r\\f\\v]+'), x -> length(x) > 0)"


def bigrams_expr():
    """Distinct word 2-gram shingles as an array column (Spark)."""
    return F.expr(
        "array_distinct(CASE WHEN size(_toks) < 2 THEN array() ELSE "
        "transform(sequence(0, size(_toks)-2), i -> concat(_toks[i], ' ', _toks[i+1])) END)"
    )


def bigrams_sql() -> str:
    return (
        "list_distinct(CASE WHEN len(_toks) < 2 THEN [] ELSE "
        "list_transform(generate_series(1, len(_toks)-1), i -> concat(_toks[i], ' ', _toks[i+1])) END)"
    )


def char3grams_sql() -> str:
    """Distinct character 3-gram shingles (DuckDB; substring is
    character-based, matching Python slicing in the Arrow kernel)."""
    return (
        "list_distinct(CASE WHEN length(text) < 3 THEN [] ELSE "
        "list_transform(generate_series(1, length(text)-2), i -> substring(text, i, 3)) END)"
    )


def shingle_hash_expr():
    """Per-shingle 30-bit hash from md5 (identical in both engines)."""
    return F.expr(
        f"transform(_shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {MOD30})"
    )


def shingle_hash_sql() -> str:
    return (
        "list_transform(_shingles, s -> "
        f"cast(concat('0x', substring(md5(s), 1, 15)) as bigint) % {MOD30})"
    )


def minhash_sig_expr() -> str:
    """SQL-text expression (used via F.expr) computing the 16-value
    signature array from _hashes; shared shape with the oracle."""
    parts = ", ".join(
        f"array_min(transform(_hashes, h -> ({a} * h + {b}) % {_P}))" for a, b in zip(_A, _B)
    )
    return f"array({parts})"


def minhash_sig_sql() -> str:
    parts = ", ".join(
        f"list_min(list_transform(_hashes, h -> ({a} * h + {b}) % {_P}))" for a, b in zip(_A, _B)
    )
    return f"[{parts}]"


def band_hash_expr(band: int) -> str:
    lo = band * ROWS_PER_BAND
    cols = ", ".join(f"cast(_sig[{lo + i}] as string)" for i in range(ROWS_PER_BAND))
    return f"md5(concat_ws(',', {cols}))"


def band_hash_sql(band: int) -> str:
    lo = band * ROWS_PER_BAND + 1  # DuckDB lists are 1-based
    cols = ", ".join(f"cast(_sig[{lo + i}] as varchar)" for i in range(ROWS_PER_BAND))
    return f"md5(concat_ws(',', {cols}))"


def _sig_kernel(docs: DataFrame, shingler: str = "word_pair") -> DataFrame:
    """Arrow kernel computing per-doc (shingle-hash array, signature):
    hashlib.md5 == SQL md5 byte-for-byte, and the 16 permutations run
    as one numpy matrix op — ~10x faster than interpreted HOFs while
    staying oracle-identical."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a = np.asarray(_A, dtype=np.int64)[:, None]
    b = np.asarray(_B, dtype=np.int64)[:, None]

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("_hashes", T.ArrayType(T.LongType())),
            T.StructField("_sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, hs, sigs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):  # NULL text: no shingles
                    continue
                if shingler == "char3":
                    sh = sorted({text[i : i + 3] for i in range(len(text) - 2)})
                else:
                    toks = _tokens(text)  # the one ASCII-\s+ tokenizer
                    sh = sorted({f"{x} {y}" for x, y in zip(toks, toks[1:])})
                if not sh:
                    continue
                h = np.fromiter(
                    (_md5_60(s) % MOD30 for s in sh), dtype=np.int64, count=len(sh)
                )
                sig = ((a * h[None, :] + b) % _P).min(axis=1)
                ids.append(doc_id)
                hs.append(h.tolist())
                sigs.append(sig.tolist())
            if ids:  # empty python-list frames break the Arrow cast
                yield pd.DataFrame({"doc_id": ids, "_hashes": hs, "_sig": sigs})

    return docs.select("doc_id", "text").mapInPandas(run, schema=schema)


def band_table_expr() -> str:
    """All 4 (band, band-hash) pairs of a signature row as ONE array —
    explode(this) replaces the r2 4-way union of the base plan, so the
    signature kernel runs once per row instead of once per band."""
    entries = ", ".join(
        f"named_struct('band', {b}, 'bh', {band_hash_expr(b)})" for b in range(N_BANDS)
    )
    return f"array({entries})"


# auto-persist bookkeeping (r7): the signature table feeds FOUR
# consumers (both band-join sides + both verify re-attach joins), so
# an unpersisted plan evaluates the per-doc kernel 4x per query —
# measured 2x whole-query cost at every bench size (5k docs: 2.75 vs
# 1.25 s; 50k: 3.65 vs 1.89 s, interleaved min-of-3). persist=None
# ("auto", the default) persists the CURRENT call's signatures and
# releases the PREVIOUS auto-call's cache, bounding live cache to one
# signature table; an unpersisted-but-unconsumed earlier result just
# recomputes (correctness unaffected). This is per-invocation work on
# the operator's own intermediate — nothing survives or is keyed
# across invocations.
#
# Composition caveat (r7 review): eviction happens at CONSTRUCTION
# time, so building several dedup results lazily and consuming them
# later leaves only the last-constructed one cached (earlier ones
# recompute — correct, just unaccelerated). Construct-then-consume
# each result, or pass persist=True and manage .sig_cache yourself,
# when composing multiple dedup operators in one plan.
_AUTO_SIG_CACHES: list = []


def _auto_persist_sig(base: DataFrame, fresh: bool = True) -> DataFrame:
    from pyspark import StorageLevel

    if fresh:
        while _AUTO_SIG_CACHES:
            old = _AUTO_SIG_CACHES.pop()
            try:
                old.unpersist(False)
            except Exception:
                pass  # its session may already be stopped
    cache = base.persist(StorageLevel.MEMORY_AND_DISK)
    _AUTO_SIG_CACHES.append(cache)
    return cache


def minhash_near_dup_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    shingler: str = "word_pair",
    persist: bool | None = None,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs colliding in >= 1 LSH band and
    passing the exact shingle-Jaccard verify. doc_a < doc_b.

    Note the shingle tokenization is the shared ASCII-\\s+ regex split
    (`_tokens` — NOT str.split(), which also splits Unicode whitespace
    and diverges from the oracle); the Jaccard verify runs on 30-BIT
    REDUCED md5 shingle hashes, so two distinct shingles collide with
    p ~ 2^-30 — a doc with ~50 shingles diverges from the oracle's
    string-set Jaccard with p ~ 1e-6 per candidate pair (r6 review:
    an earlier note here claimed the full-md5 2^-45 bound, off by
    ~2^15). Near a decision threshold at 10^12-doc scale that is a
    steady trickle; widen the reduction (MOD30) if exactness at the
    threshold matters more than the shuffle width.

    Plan shape: the signature table feeds FOUR consumers (both band
    join sides + both verify re-attach joins). The r2 plan recomputed
    the kernel 6x via a 4-way band union, which (not the md5 loop) was
    why minhash_dedup was the one flat bench query; the single explode
    fixed that (3.6 s -> 0.7 s measured). Since r7 the signature table
    is additionally persisted by default (`persist=None` = auto:
    cache this call's signatures, release the previous auto-call's —
    see _auto_persist_sig for the measured 2x and the bounded-liveness
    argument). `persist=True` keeps the old manual contract (cache
    retained until the caller releases `.sig_cache`); `persist=False`
    disables caching entirely. Either way the returned DataFrame
    carries the cache handle as `.sig_cache` (None when disabled);
    for repeated or large runs the right tool is the bucketed stage
    (write_minhash_stage / minhash_pairs_from_stage), which also skips
    the band-join shuffle."""
    base = _sig_kernel(docs, shingler=shingler)
    cache = None
    if persist is None:
        base = cache = _auto_persist_sig(base)
    elif persist:
        from pyspark import StorageLevel

        base = cache = base.persist(StorageLevel.MEMORY_AND_DISK)
    # band join carries ONLY (doc_id, band, hash) — the wide shingle
    # arrays are re-attached by key afterwards, so the x4-band shuffle
    # stays narrow (at 10^12 docs the shingles would be TBs x4)
    bands = base.select(
        "doc_id", F.explode(F.expr(band_table_expr())).alias("_b")
    ).select("doc_id", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))
    if max_band_bucket:
        # boilerplate-band capping, the standard web-dedup mitigation:
        # a band bucket holding B docs yields B^2/2 candidate pairs, so
        # one shared boilerplate prefix makes candidates QUADRATIC in
        # the hot fraction (measured: the 30% hot-prefix generator took
        # the 10x ladder slope from ~linear to 17x). Buckets larger
        # than the cap are dropped wholesale — their members agree on
        # boilerplate, not content, so the recall lost is concentrated
        # exactly where near-dup signal is weakest. Off by default
        # (exact semantics = oracle parity). Window count, NOT a
        # groupBy+self-join: the join form re-evaluated the signature
        # kernel subplan a second time for the sizes side.
        from pyspark.sql import Window as _W

        bands = (
            bands.withColumn("_bn", F.count("*").over(_W.partitionBy("band", "bh")))
            .filter(F.col("_bn") <= max_band_bucket)
            .drop("_bn")
        )
        if cache is not None:
            # the window-capped bands feed BOTH self-join sides; with
            # only the signature table cached below, the count window
            # (shuffle + sort over every band row) re-ran once per
            # side — cache the capped bands too whenever signature
            # caching is on (auto OR manual persist=True; registered
            # alongside this call's sig cache, released by the next
            # auto call)
            bands = _auto_persist_sig(bands, fresh=False)
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    out = _jaccard_verify(cand, base.select("doc_id", "_hashes"), jaccard_threshold)
    # release handle: the result is lazy, so the cache cannot be freed
    # here; long-session callers drop it after consuming the result.
    out.sig_cache = cache
    return out


def _jaccard_verify(
    cand: DataFrame,
    hashes: DataFrame,
    jaccard_threshold: float,
    hashes_b: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-hash Jaccard on (doc_a, doc_b) candidates against a
    (doc_id, _hashes) table; shared by the in-query and the bucketed-
    stage paths so the verify semantics cannot drift. `hashes_b` lets
    the two sides come from different tables (incremental dedup: new
    batch vs corpus stage)."""
    cand = (
        cand.join(
            hashes.select(F.col("doc_id").alias("doc_a"), F.col("_hashes").alias("sa")), "doc_a"
        ).join(
            (hashes if hashes_b is None else hashes_b).select(
                F.col("doc_id").alias("doc_b"), F.col("_hashes").alias("sb")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = F.round(inter / union, 4)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def write_minhash_stage(
    docs: DataFrame,
    prefix: str,
    n_buckets: int = 16,
    shingler: str = "word_pair",
    mode: str = "overwrite",
) -> None:
    """Materialize the MinHash signature stage as bucketed tables so
    REPEAT dedup runs (the normal warehouse cadence: new shard arrives,
    re-dedup against the corpus) skip both the signature kernel and the
    band-join Exchanges:

    - `{prefix}_bands` (doc_id, bkey): one row per (doc, band), bucketed
      AND sorted by the composite band key — the self-join planner sees
      matching bucketed scans on both sides and plans an exchange-free
      SortMergeJoin (Exchange 2 -> 0, asserted in tests).
    - `{prefix}_hashes` (doc_id, _hashes): the verify-side shingle
      hashes, bucketed by doc_id for the candidate re-attach joins.

    Local managed tables stand in for Iceberg `bucket(N, key)` partition
    transforms at warehouse scale. `mode="append"` extends an existing
    stage with a newly-ingested batch (the post-dedup step of the
    incremental cadence: dedup the batch against the stage, then fold
    it in)."""
    from pyspark import StorageLevel

    from ..io.bucketed import write_bucketed

    base = _sig_kernel(docs, shingler=shingler).persist(StorageLevel.MEMORY_AND_DISK)
    bands = base.select(
        "doc_id", F.explode(F.expr(band_table_expr())).alias("_b")
    ).select(
        "doc_id",
        F.concat_ws(":", F.col("_b.band").cast("string"), F.col("_b.bh")).alias("bkey"),
    )
    write_bucketed(bands, f"{prefix}_bands", bucket_col="bkey", n_buckets=n_buckets, mode=mode)
    write_bucketed(
        base.select("doc_id", "_hashes"), f"{prefix}_hashes", bucket_col="doc_id",
        n_buckets=n_buckets, mode=mode,
    )
    base.unpersist()


def minhash_pairs_from_stage(
    spark, prefix: str, jaccard_threshold: float = 0.5
) -> DataFrame:
    """minhash_near_dup_pairs over a pre-written bucketed stage: the
    band self-join runs with ZERO Exchange operators (both scans are
    co-bucketed on bkey). Output rows are identical to the in-query
    path on the same documents."""
    bands = spark.table(f"{prefix}_bands")
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), "bkey")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _jaccard_verify(cand, spark.table(f"{prefix}_hashes"), jaccard_threshold)


def minhash_dedup_incremental(
    new_docs: DataFrame,
    prefix: str,
    jaccard_threshold: float = 0.5,
    shingler: str = "word_pair",
) -> DataFrame:
    """Dedup an ARRIVING batch against an existing corpus stage — the
    normal warehouse cadence (new shard lands, check it against the
    10^12-doc corpus) — WITHOUT recomputing any corpus signature:
    only the new batch runs the signature kernel; its bands join the
    pre-bucketed `{prefix}_bands` table (the corpus side reads its
    buckets with no Exchange); the verify re-attaches new-side hashes
    from the fresh kernel and corpus-side hashes from
    `{prefix}_hashes`. Returns (doc_a = new batch id, doc_b = corpus
    id, jaccard). Assumes disjoint id spaces (rows with doc_a == doc_b
    are dropped as self-matches of re-ingested docs).

    The new batch's signatures are persisted across the two consumers
    (bands + verify); the cache rides the returned DataFrame as
    `.sig_cache` — a long-lived ingest loop should
    `out.sig_cache.unpersist()` after consuming each batch's pairs, or
    better, extend the stage with write_minhash_stage and use the
    stage-vs-stage join."""
    from pyspark import StorageLevel

    spark = new_docs.sparkSession
    base = _sig_kernel(new_docs, shingler=shingler).persist(StorageLevel.MEMORY_AND_DISK)
    new_bands = base.select(
        "doc_id", F.explode(F.expr(band_table_expr())).alias("_b")
    ).select(
        F.col("doc_id").alias("doc_a"),
        F.concat_ws(":", F.col("_b.band").cast("string"), F.col("_b.bh")).alias("bkey"),
    )
    corpus_bands = spark.table(f"{prefix}_bands").select(
        F.col("doc_id").alias("doc_b"), "bkey"
    )
    cand = (
        new_bands.join(corpus_bands, "bkey")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    out = _jaccard_verify(
        cand,
        base.select("doc_id", "_hashes"),
        jaccard_threshold,
        hashes_b=spark.table(f"{prefix}_hashes"),
    )
    # the batch signature cache cannot be unpersisted here (the result
    # is lazy); expose it so a long-lived ingest loop can release each
    # batch after consuming its pairs: out.sig_cache.unpersist()
    out.sig_cache = base
    return out


def minhash_near_dup_pairs_sql(
    jaccard_threshold: float = 0.5, shingler: str = "word_pair", src: str = "SELECT * FROM documents"
) -> str:
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, _shingles, {b} AS band, {band_hash_sql(b)} AS bh FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
WITH base AS (
  SELECT doc_id, {_toks_sql()} AS _toks, text FROM ({src})
), sh AS (
  SELECT doc_id, {char3grams_sql() if shingler == "char3" else bigrams_sql()} AS _shingles FROM base
), hashed AS (
  SELECT doc_id, _shingles, {shingle_hash_sql()} AS _hashes FROM sh WHERE len(_shingles) > 0
), sigs AS (
  SELECT doc_id, _shingles, {minhash_sig_sql()} AS _sig FROM hashed
), bands AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l._shingles AS sa, r._shingles AS sb
  FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         round(CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS DOUBLE)
               / (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))), 4) AS jaccard
  FROM cand
) WHERE jaccard >= {jaccard_threshold}
"""


# ------------------------------------------------------------------ simhash
SIMHASH_BITS = 32
MOD32 = 1 << 32  # simhash token-hash domain: FULL fingerprint width


def simhash_token_hash_expr():
    """Per-token 32-bit hash (md5 masked to 32 bits, identical in both
    engines). SimHash gets its own hash domain: r2 reused the MinHash
    shingle hash (mod 2^30), leaving fingerprint bits 30-31 stuck at 0
    and the upper LSH half-band with only 14 effective bits (VERDICT
    r2 'What's wrong' #3). All 32 bits vary now."""
    return F.expr(
        f"transform(_shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {MOD32})"
    )


def simhash_token_hash_sql() -> str:
    return (
        "list_transform(_shingles, s -> "
        f"cast(concat('0x', substring(md5(s), 1, 15)) as bigint) % {MOD32})"
    )


def simhash_expr() -> str:
    """32-bit SimHash over token hashes: bit i set iff the majority of
    tokens have bit i set in their 32-bit hash (strict majority: 2*cnt
    > n). All 32 bits are effective (simhash_token_hash_expr); each
    16-bit LSH half-band carries a full 16 bits. Built as one SQL
    expression usable in both engines modulo array-function
    spelling."""
    terms = []
    for i in range(SIMHASH_BITS):
        cnt = f"size(filter(_hashes, h -> cast(h / {1 << i} as bigint) % 2 = 1))"
        terms.append(f"(CASE WHEN 2 * {cnt} > size(_hashes) THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


def simhash_sql() -> str:
    terms = []
    for i in range(SIMHASH_BITS):
        cnt = f"len(list_filter(_hashes, h -> cast(floor(h / {1 << i}) as bigint) % 2 = 1))"
        terms.append(f"(CASE WHEN 2 * {cnt} > len(_hashes) THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


# Per-worker md5 memo shared by the simhash token and minhash shingle
# kernels: natural-language vocabulary is orders of magnitude smaller
# than token/shingle INSTANCES, so the md5-per-string loop — the
# measured floor of the generated-corpus ladder after the r4 Arrow
# kernels — collapses to dict hits after warm-up. Pure memoization of
# a deterministic function (bit-identical output, asserted by the
# kernel-vs-HOF parity test and the driver oracles); bounded so a
# pathological vocabulary (random strings) cannot grow worker RSS
# unboundedly — at the cap the kernel simply computes md5 again.
_MD5_CACHE: dict = {}
_MD5_CACHE_MAX = 1 << 20


def _md5_60(s: str) -> int:
    """int(md5(s).hexdigest()[:15], 16) — the shared 60-bit hash both
    dedup kernels reduce (mod 2^32 / 2^30) to their domains."""
    v = _MD5_CACHE.get(s)
    if v is None:
        v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        if len(_MD5_CACHE) < _MD5_CACHE_MAX:
            _MD5_CACHE[s] = v
    return v


def _token_hash32(t: str) -> int:
    return _md5_60(t) % MOD32


def simhash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — token-level 32-bit simhash (32 effective
    bits). Arrow kernel (r4): the HOF formulation ran 32 filter passes
    over the token-hash array per row (one per fingerprint bit), which
    was the measured floor of the generated-corpus ladder; the kernel
    computes the same md5 token hashes (hashlib == SQL md5
    byte-for-byte, the same equivalence the MinHash kernel relies on)
    and the 32 majority votes as one numpy bit-matrix reduction —
    bit-identical to simhash_expr()/the DuckDB twin, asserted by the
    docs_simhash oracle and a dedicated parity test. Works unchanged
    under Structured Streaming (stateless mapInPandas)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
    )
    weights = (1 << np.arange(SIMHASH_BITS, dtype=np.int64))

    def run(batches):
        for pdf in batches:
            ids, sims = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):  # NULL text: drop, like the
                    continue  # HOF path's size(_hashes) > 0 filter
                toks = set(_tokens(text))  # the one ASCII-\s+ tokenizer
                if not toks:
                    continue
                h = np.fromiter(
                    (_token_hash32(t) for t in toks), dtype=np.int64, count=len(toks)
                )
                bits = (h[:, None] >> np.arange(SIMHASH_BITS)) & 1
                sim = int(weights[2 * bits.sum(axis=0) > len(h)].sum())
                ids.append(doc_id)
                sims.append(sim)
            yield pd.DataFrame({"doc_id": ids, "simhash": sims})

    return docs.select("doc_id", "text").mapInPandas(run, schema=schema)


def simhash_docs_hof(docs: DataFrame) -> DataFrame:
    """The all-JVM HOF formulation simhash_docs replaced — kept as the
    parity twin (tests assert kernel == HOF row-for-row) and as the
    fallback if a deployment bans Python workers entirely."""
    return (
        docs.select("doc_id", "text")
        .withColumn("_toks", _toks())
        .withColumn("_shingles", F.array_distinct("_toks"))
        .withColumn("_hashes", simhash_token_hash_expr())
        .filter(F.size("_hashes") > 0)
        .select("doc_id", F.expr(simhash_expr()).cast("long").alias("simhash"))
    )


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """SimHash near-dup pairs: two 16-bit half-bands as the LSH over
    the 32-bit fingerprint (any pair within hamming<=1 is guaranteed
    to share a half — pigeonhole; hamming 2 is caught unless the flips
    straddle both halves; each half carries a full 16 effective bits,
    see simhash_token_hash_expr), then exact popcount verify. All JVM.

    MAINTENANCE NOTE (r6 review): this band-explode -> self-join ->
    popcount-verify shape exists THREE times — here, the 64-bit
    `simhash_near_dup_pairs_wide` below, and images.phash_hamming_dups
    — deliberately NOT collapsed into one helper because each Spark
    form textually mirrors its own DuckDB *_sql twin; a plan-shape fix
    (like the r5 one-explode change) must be applied to all three."""
    s = simhash_docs(docs)
    # ONE explode, not a 2-way union: the union form re-ran the whole
    # signature subplan once per branch AND per join side (the same
    # plan-recomputation disease the r3 minhash fix cured; measured
    # here 29.7 s -> 4.6 s at 2k generated docs, identical pairs).
    bands = s.select(
        "doc_id", "simhash", F.explode(F.expr("sequence(0, 1)")).alias("band")
    ).withColumn(
        "bh",
        F.when(F.col("band") == 0, F.col("simhash") % 65536).otherwise(
            (F.col("simhash") / 65536).cast("long") % 65536
        ),
    )
    left = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "band", "bh")
    right = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "band", "bh")
    cand = (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("hamming", F.expr("cast(bit_count(ha ^ hb) as int)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_dup_pairs_sql(max_hamming: int = 2) -> str:
    inner = simhash_docs_sql().strip()
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"cast(floor(simhash / {1 << (16 * b)}) as bigint) % 65536 AS bh FROM s"
        for b in range(2)
    )
    return f"""
WITH s AS ({inner}), bands AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.simhash AS ha, r.simhash AS hb
  FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, cast(bit_count(xor(ha, hb)) as int) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
"""


def simhash_docs_sql() -> str:
    return f"""
SELECT doc_id, CAST({simhash_sql()} AS BIGINT) AS simhash FROM (
  SELECT doc_id, {simhash_token_hash_sql()} AS _hashes FROM (
    SELECT doc_id, list_distinct({_toks_sql()}) AS _shingles FROM documents
  ) WHERE len(_shingles) > 0
)
"""


# ------------------------------------------------------- simhash, 64-bit
# The 32-bit fingerprint is the reference's pinned width (docs_simhash
# oracle parity), but it SATURATES around 10^5-10^6 docs: random
# hamming<=2 collisions among n 32-bit fingerprints (~C(n,2)*529/2^32)
# start rivaling true near-dups — measured at 500k generated docs:
# 29,449 pairs of which ~15k are the random-collision floor (see
# BENCH/BASELINE.md r5). This is the 64-bit scale path: the
# fingerprint is TWO independent 32-bit halves (the low half is
# bit-identical to simhash_docs; the high half uses a salted token
# hash), LSH = four 16-bit bands (pigeonhole: hamming<=3 over 64 bits
# always leaves a clean band), exact popcount verify over both halves.


def _token_hash32_hi(t: str) -> int:
    """Independent second 32-bit token hash (salted md5, same memo)."""
    return _md5_60("h|" + t) % MOD32


def simhash_docs_wide(docs: DataFrame) -> DataFrame:
    """(doc_id, sim_hi, sim_lo) — 64-bit simhash as two 32-bit halves.
    sim_lo is BIT-IDENTICAL to simhash_docs' fingerprint (same token
    hash, same majority vote), so the wide path strictly extends the
    narrow one; sim_hi votes on the salted hash family."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sim_hi", T.LongType()),
            T.StructField("sim_lo", T.LongType()),
        ]
    )
    weights = 1 << np.arange(SIMHASH_BITS, dtype=np.int64)

    def run(batches):
        for pdf in batches:
            ids, his, los = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    continue
                toks = set(_tokens(text))  # the one ASCII-\s+ tokenizer
                if not toks:
                    continue
                lo = np.fromiter(
                    (_token_hash32(t) for t in toks), dtype=np.int64, count=len(toks)
                )
                hi = np.fromiter(
                    (_token_hash32_hi(t) for t in toks), dtype=np.int64, count=len(toks)
                )
                n = len(lo)
                bits_lo = (lo[:, None] >> np.arange(SIMHASH_BITS)) & 1
                bits_hi = (hi[:, None] >> np.arange(SIMHASH_BITS)) & 1
                ids.append(doc_id)
                los.append(int(weights[2 * bits_lo.sum(axis=0) > n].sum()))
                his.append(int(weights[2 * bits_hi.sum(axis=0) > n].sum()))
            yield pd.DataFrame({"doc_id": ids, "sim_hi": his, "sim_lo": los})

    return docs.select("doc_id", "text").mapInPandas(run, schema=schema)


def simhash_near_dup_pairs_wide(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """64-bit SimHash near-dup pairs: four 16-bit bands over (hi, lo)
    via ONE explode, exact two-half popcount verify. Same plan shape
    as the 32-bit operator; the wider fingerprint pushes the random-
    collision floor from ~2^-32 to ~2^-64 per pair.

    r7: the fingerprint table auto-persists like the minhash
    signatures (_auto_persist_sig — this call's cache live, previous
    auto-call's released): the band self-join evaluates the kernel
    subplan once per side, and the WIDE kernel (two md5 families, two
    bit matrices per doc) is expensive enough that caching wins —
    interleaved min-of-3 at 100k docs: 4.33 s plain vs 2.85 s
    persisted, identical 138 pairs. The 32-bit operator measured a
    WASH under the same protocol (1.60 vs 1.60 — its kernel is ~0.5 s
    per pass across 32 workers and the cache round-trip eats the
    saving), so it deliberately stays unpersisted."""
    s = _auto_persist_sig(simhash_docs_wide(docs))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    (F.col("sim_lo") if b < 2 else F.col("sim_hi"))
                    / (1 << (16 * (b % 2)))
                )
                .cast("long")
                .alias("bh")
                # NOTE: integer division then % 65536 below
            )
            for b in range(4)
        ]
    )
    bands = (
        s.select("doc_id", "sim_hi", "sim_lo", F.explode(band_arr).alias("_b"))
        .select(
            "doc_id",
            "sim_hi",
            "sim_lo",
            F.col("_b.band").alias("band"),
            (F.col("_b.bh") % 65536).alias("bh"),
        )
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sim_hi").alias("ha_hi"),
        F.col("sim_lo").alias("ha_lo"),
        "band",
        "bh",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sim_hi").alias("hb_hi"),
        F.col("sim_lo").alias("hb_lo"),
        "band",
        "bh",
    )
    cand = (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha_hi", "ha_lo", "hb_hi", "hb_lo")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr("cast(bit_count(ha_hi ^ hb_hi) + bit_count(ha_lo ^ hb_lo) as int)"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(docs: DataFrame, jaccard_threshold: float = 0.6) -> DataFrame:
    """n-gram Jaccard near-dup pairs: character-trigram shingles
    through the same MinHash-LSH band pipeline (the scale path — exact
    trigram Jaccard runs only on band collisions, never all-pairs)."""
    return minhash_near_dup_pairs(docs, jaccard_threshold, shingler="char3")


def ngram_jaccard_pairs_sql(jaccard_threshold: float = 0.6) -> str:
    return minhash_near_dup_pairs_sql(jaccard_threshold, shingler="char3")
