"""Approximate nearest neighbor over embeddings (array<float>).

- Brute-force cosine top-k (queries.q_embed_topk) is the exact
  baseline: JVM higher-order functions, O(P x N).
- LSH variant: deterministic random-hyperplane signatures — bit
  j of the bucket is sign(dot(v, h_j)) with h_j[d] derived from an
  integer hash, so the SAME plane values are expressible in Spark
  (0-based transform index) and DuckDB (1-based) and the bucketing is
  engine-independent. Probes only compare against candidates in their
  bucket: O(P x N / 2^bits) — recall traded via `bits`.
- IVF variant (ann_ivf_topk): a coarse quantizer assigns every
  vector to its nearest-centroid inverted list; probes scan only their
  top-`nprobe` lists, exact cosine re-ranks. All JVM: the centroid
  table is a broadcast, the list scan is an equi-join on list id (the
  shuffle key at scale; salt hot lists like any skewed join). Two
  quantizers: per-label means (SQL-expressible -> the driver oracle
  stays a real DuckDB twin) and kmeans_centroids (deterministic
  sampled k-means trained on a bounded driver sample — the real
  10^12-scale recipe, ~sqrt(N) lists, assignment distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 6    # bits per table
N_TABLES = 16   # OR-ed hash tables
MULTIPROBE = 1  # 0 = exact bucket only; 1 = also probe all 1-bit flips

# Multi-table design note (r3): a single b-bit random-hyperplane table
# needs ALL b signs to agree, so for moderate-angle neighbors recall is
# (1-theta/pi)^b ~ 0 (measured 0.00 recall@1 on the sf0.01 corpus with
# one 8-bit table, scripts/ann_recall.py). Standard LSH uses L
# independent tables and ORs the candidate sets: collision prob
# 1-(1-p^b)^L. bits is the scale dial: grow b with log N, L with the
# recall target.
#
# Multiprobe note (r4): querying each table at the probe's bucket AND
# its b one-bit flips multiplies per-table collision odds without the
# index cost of more tables (the classic multiprobe-LSH trade: query
# fan-out is cheap, index memory is not). Defaults are the measured
# cheapest config with recall@1 >= 0.9 on the driver corpus
# (scripts/ann_recall.py --sweep: 16 tables x 6 bits multiprobe-1 ->
# recall@1 0.95). NOTE the honest caveat recorded in BENCH/BASELINE.md:
# the synthetic embeddings are weakly clustered (median NN cosine
# 0.41), so 0.9+ recall costs a ~64% corpus scan here; on clustered
# corpora (median NN cos 0.88) the same machinery reaches 0.95-1.0 at
# a quarter of the scan, and when the corpus has no cosine structure
# at all, IVF (recall 1.0 at full nprobe) or exact blocked top-k is
# the right path — LSH cannot beat the data.


def _plane_term(j: int, d_expr: str = "d", t_expr: str = "t") -> str:
    """plane(t, j, d) = (((t*977 + j)*131 + d) * 2654435761 % 2000)/1000 - 1.0.
    `t_expr` may be a literal or a COLUMN — both engines evaluate the
    same arithmetic, so the planes are engine-independent."""
    return f"(((({t_expr}*977 + {j})*131 + {d_expr}) * 2654435761) % 2000) / 1000.0 - 1.0"


def bucket_expr(v_col: str = "v", t_expr: str = "t", n_planes: int = N_PLANES) -> str:
    """Spark SQL expression: LSH bucket id of an array<double> column
    under hash table `t_expr` (0-based element index d)."""
    bits = []
    for j in range(n_planes):
        dot = (
            f"aggregate(transform({v_col}, (x, d) -> x * ({_plane_term(j, 'd', t_expr)})), "
            f"cast(0.0 as double), (a, x) -> a + x)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def bucket_sql(v_col: str = "v", t_expr: str = "t", n_planes: int = N_PLANES) -> str:
    """DuckDB twin (1-based list index -> d = i-1)."""
    bits = []
    for j in range(n_planes):
        term = _plane_term(j, "(i-1)", t_expr)
        dot = (
            f"list_aggregate(list_transform(generate_series(1, len({v_col})), "
            f"i -> {v_col}[i] * ({term})), 'sum')"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def _cos_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (norm(F.col(a)) * norm(F.col(b)))


def _flip_values(multiprobe: int, n_planes: int = N_PLANES) -> list[int]:
    """Bucket-id XOR masks probed per table: the exact bucket plus, at
    multiprobe=1, every 1-bit flip of the signature."""
    out = [0]
    if multiprobe:
        out += [1 << j for j in range(n_planes)]
    return out


def lsh_signatures_kernel(
    base: DataFrame, n_tables: int = N_TABLES, n_planes: int = N_PLANES
) -> DataFrame:
    """(vec_id, buckets array<long>[n_tables]) via a vectorized Arrow
    kernel — BIT-IDENTICAL to the Column form `bucket_expr` (asserted
    by a row-for-row parity test): the plane values are exact int64
    arithmetic in both, and the dot accumulates in ascending-d order
    exactly like Catalyst's sequential `aggregate` fold, so not even
    the float summation order differs. Exists because Catalyst
    evaluates higher-order-function lambdas INTERPRETED per element:
    16 tables x 6 planes x dim elements ~ 6k boxed lambda calls per
    row was the measured floor of the generated-corpus ladder (~30 s /
    50k vectors per consumer); the kernel does the same flops
    vectorized across rows (~100x)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("buckets", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches):
        planes = None
        for pdf in batches:
            # NULL embeddings: skip — the Column form's posexplode of
            # a NULL bucket array yields zero rows for them anyway
            pdf = pdf[pdf["v"].notna()]
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            n, dim = m.shape
            if planes is None or planes.shape[2] != dim:
                # plane(t, j, d) exactly as _plane_term: int64 products
                # stay < 2^63 (max base ~1.9e6 * 2654435761 ~ 5.1e15)
                t_i = np.arange(n_tables, dtype=np.int64)[:, None, None]
                j_i = np.arange(n_planes, dtype=np.int64)[None, :, None]
                d_i = np.arange(dim, dtype=np.int64)[None, None, :]
                planes = (
                    (((t_i * 977 + j_i) * 131 + d_i) * 2654435761) % 2000
                ) / 1000.0 - 1.0
            buckets = np.zeros((n, n_tables), dtype=np.int64)
            for t in range(n_tables):
                for j in range(n_planes):
                    acc = np.zeros(n)
                    for d in range(dim):  # ascending-d fold == aggregate()
                        acc = acc + m[:, d] * planes[t, j, d]
                    buckets[:, t] += np.where(acc > 0, 1 << j, 0)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(np.int64), "buckets": list(buckets)}
            )

    return base.select("vec_id", "v").mapInPandas(run, schema=schema)


def ann_lsh_topk(
    embeddings_df: DataFrame,
    probe_filter: str = "vec_id % 100 = 0",
    k: int = 3,
    multiprobe: int = MULTIPROBE,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Top-k cosine neighbors per probe among candidates colliding in
    ANY of the `n_tables` LSH tables, with the probe side fanned out to
    its bucket's 1-bit flips at multiprobe=1 (query-directed probing:
    candidate volume grows ~(1+bits)x per table, index size doesn't).
    Output (probe_id, neighbor_id, cos_sim).

    `n_tables`/`n_planes`/`multiprobe` are the scale dial (module
    defaults = the measured recall@1>=0.9 config on the driver corpus):
    grow n_planes with log N to keep buckets sparse, n_tables and
    multiprobe with the recall target.

    `probe_filter` may reference ONLY the narrow signature columns
    (vec_id, t, bucket) — it is applied after the embedding array has
    been pruned off the probe side (the r5 narrow-join change: carrying
    v through the bucket join put ~16 GB through the exchange). A
    predicate over the embedding column is rejected eagerly here."""
    base = embeddings_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # signatures via the vectorized Arrow kernel (bit-identical to the
    # bucket_expr Column form — parity-tested)
    e_nar = lsh_signatures_kernel(base, n_tables, n_planes).select(
        "vec_id", F.posexplode("buckets").alias("t", "bucket")
    )
    from pyspark.errors import AnalysisException

    try:
        filtered = e_nar.filter(probe_filter)
        filtered.schema  # force analysis now, not at action time
    except AnalysisException as exc:
        # only analysis failures are rebranded (r6 review: a blanket
        # except turned transient Py4J/JVM errors into a misleading
        # invalid-filter message); anything else propagates as-is
        raise ValueError(
            f"probe_filter {probe_filter!r} must only reference the "
            f"narrow signature columns (vec_id, t, bucket): {exc}"
        ) from exc
    flips = ", ".join(str(f) for f in _flip_values(multiprobe, n_planes))
    # the bucket join carries ONLY (t, bucket, id) — the same narrow-
    # shuffle rule the minhash band join follows. On a CLUSTERED corpus
    # a probe's cluster collides in EVERY table x flip, so a (probe,
    # cand) pair rides the join up to tables x (1+bits) = 112 times;
    # shipping both 64-dim arrays through that duplication put ~16 GB
    # through the dedup exchange at 500 probes x 50k vectors (measured
    # 352 s; narrow join + attach-by-key after the dedup + the Arrow
    # signature kernel: 15 s, same rows).
    probes = (
        filtered
        .withColumn("_f", F.explode(F.expr(f"array({flips})")))
        .select(
            F.col("vec_id").alias("probe_id"),
            "t",
            F.expr("bucket ^ _f").cast("long").alias("bucket"),
        )
    )
    cand = (
        probes.join(e_nar, ["t", "bucket"])
        .filter(F.col("probe_id") != F.col("vec_id"))
        .dropDuplicates(["probe_id", "vec_id"])
    )
    joined = cand.join(
        base.select(F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")), "probe_id"
    ).join(base, "vec_id")
    # cosine via the same ordered-fold Arrow idiom as the signature
    # kernel (ascending-d accumulation == the _cos_expr HOF fold, so
    # the raw doubles are identical; parity-tested). Rounding stays a
    # JVM F.round so the oracle's BigDecimal HALF_UP semantics are
    # byte-for-byte unchanged. The HOF form scored ~64 interpreted
    # lambda calls per pair — the dominant cost at 10^6 candidate
    # pairs on the generated ladder.
    scored = _cos_kernel(
        joined.select("probe_id", F.col("vec_id").alias("neighbor_id"), "pv", "v")
    ).select("probe_id", "neighbor_id", F.round("cos_raw", 5).alias("cos_sim"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def _label_partial_rows(pdf):
    """Per-batch (labels, counts, sums) partial rows for the label-mean
    centroid computation — shared by _label_centroids and the combined
    probe+centroid pass so the summation semantics cannot drift.
    Expects v-notna rows."""
    import numpy as np

    labs, ns, sums = [], [], []
    for lab, idx in pdf.groupby("label", sort=True).indices.items():
        sub = np.vstack(pdf["v"].iloc[idx].to_numpy()).astype(np.float64)
        labs.append(int(lab))
        ns.append(len(sub))
        sums.append(sub.sum(axis=0).tolist())
    return labs, ns, sums


def _combine_label_partials(rows, dim: int) -> list[tuple[int, list[float]]]:
    """Deterministic in-order driver combine of (part, label, n, s)
    partial rows -> sorted (label, mean) list."""
    import numpy as np

    acc: dict[int, tuple[int, "np.ndarray"]] = {}
    for r in sorted(rows, key=lambda r: (r["part"], r["label"])):
        n0, s0 = acc.get(int(r["label"]), (0, np.zeros(dim)))
        acc[int(r["label"])] = (n0 + int(r["n"]), s0 + np.asarray(r["s"], dtype=np.float64))
    return sorted((lab, (s / n).tolist()) for lab, (n, s) in acc.items())


def _probes_and_label_partials(e: DataFrame, probe_filter: str, need_cents: bool):
    """ONE corpus pass serving both eager questions of the closure
    transport: the probe rows (probe_filter true, v not null) AND —
    when the label-mean quantizer is in play — the per-batch centroid
    partials. The probe predicate is evaluated JVM-side (F.expr, so
    arbitrary SQL over vec_id/label/v keeps working) and rides the
    batch as a boolean column; the kernel splits each batch into
    partial rows (kind=0) and probe rows (kind=1). Returns
    (probe pandas DataFrame[vec_id, v], partial row list)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("kind", T.IntegerType()),
            T.StructField("part", T.LongType()),
            T.StructField("label", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            pdf = pdf[pdf["v"].notna()]
            if len(pdf) == 0:
                continue
            frames = []
            if need_cents:
                labs, ns, sums = _label_partial_rows(pdf)
                frames.append(
                    pd.DataFrame(
                        {
                            "kind": np.zeros(len(labs), dtype=np.int32),
                            "part": np.full(len(labs), pid),
                            "label": labs,
                            "n": ns,
                            "s": sums,
                            "vec_id": np.zeros(len(labs), dtype=np.int64),
                            "v": [None] * len(labs),
                        }
                    )
                )
            pr = pdf[pdf["_is_probe"].fillna(False).astype(bool)]
            if len(pr):
                frames.append(
                    pd.DataFrame(
                        {
                            "kind": np.ones(len(pr), dtype=np.int32),
                            "part": np.full(len(pr), pid),
                            "label": np.zeros(len(pr), dtype=np.int64),
                            "n": np.zeros(len(pr), dtype=np.int64),
                            "s": [None] * len(pr),
                            "vec_id": pr["vec_id"].to_numpy(np.int64),
                            "v": pr["v"].tolist(),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    src = e.withColumn("_is_probe", F.expr(probe_filter)).select(
        "vec_id", "label", "v", "_is_probe"
    )
    rows = src.mapInPandas(run, schema=schema).collect()
    partials = [r for r in rows if r["kind"] == 0]
    probes = [r for r in rows if r["kind"] == 1]
    ppdf = pd.DataFrame(
        {
            "vec_id": [int(r["vec_id"]) for r in probes],
            "v": [list(r["v"]) for r in probes],
        }
    )
    return ppdf, partials


def _label_centroids(e: DataFrame, dim: int) -> list[tuple[int, list[float]]]:
    """Per-label elementwise means as sorted (label, centroid) rows —
    ONE Arrow pass emitting per-batch partial (label, count, sums)
    rows (~25 x 520 B per batch), combined on the driver in ascending
    (partition, label) order. This replaces the 64-column
    `avg(v[i])` aggregation, which referenced the embedding array 64
    times: against a parquet scan that is harmless, but against the
    generated bench corpus Catalyst inlined the (large) array
    expression into every avg argument and the OPTIMIZATION + Janino
    compile of the exploded tree cost ~2.5 s per call with a ~6 s
    first-call cliff — pure driver time, independent of data size
    (measured at 20k == 200k rows). The kernel's partials are the
    guide's map-side-aggregation shape: what crosses the boundary is
    lists x dim sums, never rows.

    Semantics: rows with a NULL embedding are skipped (avg() skipped
    them per element); summation is per-batch numpy followed by a
    deterministic in-order driver combine — the same
    equal-multiset-modulo-ulp contract the Spark avg (whose merge
    order is fetch-order nondeterministic) already provided. Centroid
    ulps only steer integer decisions (list assignment, probe-list
    ranking); the oracle gate and the assignment-equality test pin
    that those decisions are unchanged."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("part", T.LongType()),
            T.StructField("label", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf[pdf["v"].notna()]
            if len(pdf) == 0:
                continue
            labs, ns, sums = _label_partial_rows(pdf)
            yield pd.DataFrame({"part": np.full(len(labs), pid), "label": labs, "n": ns, "s": sums})

    rows = e.select("label", "v").mapInPandas(run, schema=schema).collect()
    return _combine_label_partials(rows, dim)


def _rank_probes_local(cent_rows: list[tuple[int, list[float]]], ppdf, nprobe: int) -> dict:
    """Driver-side numpy replica of the probe-side list ranking — the
    closure-transport twin of the crossJoin+window form, bit-identical
    by construction: the dot accumulates in ascending-d order (== the
    sequential `aggregate` fold of _dot_expr), and ties order by
    (dot desc, list_id asc) exactly like the window's orderBy with
    row_number (cent_rows arrive sorted by list_id, and np.lexsort is
    given list_id as the secondary key). Returns the per-list probe
    matrices {list_id: (pids int64[], P float64[n, dim])} that
    _list_score_kernel / _assign_score_kernel consume."""
    import numpy as np

    if len(ppdf) == 0:
        return {}
    lids = np.array([lid for lid, _ in cent_rows], dtype=np.int64)
    C = np.array([c for _, c in cent_rows], dtype=np.float64)  # k x dim
    P = np.vstack(ppdf["v"].to_numpy()).astype(np.float64)
    pids = ppdf["vec_id"].to_numpy(np.int64)
    dot = np.zeros((len(P), len(lids)))
    for d in range(C.shape[1]):  # ascending-d fold == aggregate()
        dot = dot + P[:, d, None] * C[None, :, d]
    take = min(nprobe, len(lids))
    by_list: dict[int, tuple[list, list]] = {}
    for i in range(len(P)):
        order = np.lexsort((lids, -dot[i]))[:take]
        for j in order:
            slot = by_list.setdefault(int(lids[j]), ([], []))
            slot[0].append(pids[i])
            slot[1].append(P[i])
    return {
        lid: (np.asarray(ids, dtype=np.int64), np.vstack(vecs))
        for lid, (ids, vecs) in by_list.items()
    }


def _assign_score_kernel(
    e: DataFrame, cent_rows: list[tuple[int, list[float]]], pmap: dict, k: int
) -> DataFrame:
    """(probe_id, neighbor_id, list_id, cos_raw): the FUSED corpus pass
    of the closure probe transport — ONE Arrow trip does what
    _assign_kernel + _list_score_kernel did in two (the corpus arrays
    no longer bounce Python -> JVM -> Python between assignment and
    scoring), and the per-list probe matrices ride the task closure
    like _assign_kernel's centroid matrix (serialized once per stage
    into the torrent-broadcast task binary — none of the per-call
    sc.broadcast cold cost, none of the join transport's per-candidate
    matrix duplication).

    Bit-identical doubles to the unfused forms (parity-tested): the
    assignment argmax and both scoring folds accumulate in ascending-d
    order, first-max tie-break == smaller list_id.

    Emits a PRUNED superset of the final rows: per (probe, list,
    batch), only candidates whose raw cosine is within 1e-5 (one
    rounding quantum) of the k-th best kept survive. Any dropped row
    is beaten by k rows whose raw cosine exceeds it by > 1e-5, hence
    by k STRICTLY larger ROUNDED values (|round5(x)-x| <= 0.5e-5), so
    it can never enter the global rounded top-k regardless of the
    neighbor_id tie-break — same cut as embed_topk_blocked. The JVM
    F.round + window downstream are unchanged, so the surviving rows
    are byte-for-byte the unfused output."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    lids = np.array([lid for lid, _ in cent_rows], dtype=np.int64)
    C = np.array([c for _, c in cent_rows], dtype=np.float64)  # k x dim

    schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("list_id", T.LongType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            # NULL embeddings can never be neighbors: skip them like
            # the probe/centroid pass does (r7 review — every sibling
            # kernel degrades the same way instead of crashing vstack)
            pdf = pdf[pdf["v"].notna()]
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["v"].to_numpy()).astype(np.float64)  # n x dim
            cids = pdf["vec_id"].to_numpy(np.int64)
            dot = np.zeros((len(V), C.shape[0]))
            for d in range(C.shape[1]):  # ascending-d fold == the expr chain
                dot = dot + V[:, d, None] * C[None, :, d]
            assigned = lids[np.argmax(dot, axis=1)]  # first max -> smallest list_id
            out_p, out_n, out_l, out_c = [], [], [], []
            for lid in pmap:
                sel = np.flatnonzero(assigned == lid)
                if not len(sel):
                    continue
                pids, P = pmap[lid]
                B = V[sel]
                sub_ids = cids[sel]
                npb, dim = P.shape
                nb = len(sel)
                dot2 = np.zeros((npb, nb))
                pn = np.zeros(npb)
                bn = np.zeros(nb)
                for d in range(dim):  # ascending-d fold == aggregate()
                    dot2 = dot2 + P[:, d, None] * B[None, :, d]
                    pn = pn + P[:, d] * P[:, d]
                    bn = bn + B[:, d] * B[:, d]
                cos = dot2 / (np.sqrt(pn)[:, None] * np.sqrt(bn)[None, :])
                keep = pids[:, None] != sub_ids[None, :]
                # per-probe quantum-safe top-k cut (see docstring).
                # NaN cosines (zero-norm vectors: 0/0) are KEPT — the
                # unfused kernels emit them and Spark's descending
                # order ranks NaN first, so dropping them here would
                # break transport parity on degenerate corpora
                # (r7 review; parity test covers a zero vector).
                masked = np.where(keep, cos, -np.inf)
                kk = min(k, nb)
                kth = -np.partition(-masked, kk - 1, axis=1)[:, kk - 1]
                keep &= (cos >= (kth[:, None] - 1e-5)) | np.isnan(cos)
                pi, bi = np.nonzero(keep)
                if not len(pi):
                    continue
                out_p.append(pids[pi])
                out_n.append(sub_ids[bi])
                out_l.append(np.full(len(pi), int(lid), dtype=np.int64))
                out_c.append(cos[pi, bi])
            if out_p:
                yield pd.DataFrame(
                    {
                        "probe_id": np.concatenate(out_p),
                        "neighbor_id": np.concatenate(out_n),
                        "list_id": np.concatenate(out_l),
                        "cos_raw": np.concatenate(out_c),
                    }
                )

    return e.select("vec_id", "v").mapInPandas(run, schema=schema)


def _list_score_kernel(cand: DataFrame, probes_bc=None, probes_map: dict | None = None) -> DataFrame:
    """(probe_id, neighbor_id, list_id, cos_raw) from candidate rows:
    per (batch, list) the list's probe matrix scores every candidate
    with the same ascending-d ordered fold as _cos_expr, so each
    double is bit-identical to the pair-at-a-time HOF form. Self-pairs
    (probe_id == vec_id) are excluded like the join filter was.

    Two probe transports (see ann_ivf_topk for the measured tradeoff):

    - ``probes_bc=None`` (join form): `cand` carries the list's probe
      matrix as a nested `_probes array<struct<probe_id, pv>>` column
      attached by a broadcast join. The matrix is duplicated onto
      every candidate row through the Arrow boundary — shipped bytes
      scale as candidates x probes-per-list x dim (ADVICE r5 #3) —
      but the plan stays fully lazy and needs no Python-broadcast
      distribution.
    - ``probes_bc`` set (broadcast form): `cand` stays NARROW
      (vec_id, v, list_id); the matrices (dict list_id ->
      (pids int64[], P float64[n_probes, dim])) ship once per
      executor via sc.broadcast and are read inside the kernel;
      candidates in lists no probe ranked are dropped here.
    - ``probes_map`` set (closure form): same narrow candidate rows as
      the broadcast form, but the matrices ride the TASK CLOSURE (the
      _assign_kernel centroid-shipping mechanism) instead of a fresh
      per-call sc.broadcast."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("list_id", T.LongType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )

    def run(batches):
        pmap = probes_bc.value if probes_bc is not None else probes_map
        for pdf in batches:
            pdf = pdf[pdf["v"].notna()]  # NULL rows: skip, don't crash
            if len(pdf) == 0:
                continue
            out_p, out_n, out_l, out_c = [], [], [], []
            for lid, idx in pdf.groupby("list_id", sort=False).indices.items():
                sub = pdf.iloc[idx]
                if pmap is not None:
                    got = pmap.get(int(lid))
                    if got is None:
                        continue
                    pids, P = got
                else:
                    prows = sub["_probes"].iloc[0]
                    pids = np.array([int(r["probe_id"]) for r in prows], dtype=np.int64)
                    P = np.vstack([np.asarray(r["pv"], dtype=np.float64) for r in prows])
                B = np.vstack(sub["v"].to_numpy()).astype(np.float64)
                cids = sub["vec_id"].to_numpy(np.int64)
                npb, dim = P.shape
                nb = len(cids)
                dot = np.zeros((npb, nb))
                pn = np.zeros(npb)
                bn = np.zeros(nb)
                for d in range(dim):  # ascending-d fold == aggregate()
                    dot = dot + P[:, d, None] * B[None, :, d]
                    pn = pn + P[:, d] * P[:, d]
                    bn = bn + B[:, d] * B[:, d]
                cos = dot / (np.sqrt(pn)[:, None] * np.sqrt(bn)[None, :])
                keep = pids[:, None] != cids[None, :]
                pi, bi = np.nonzero(keep)
                out_p.append(pids[pi])
                out_n.append(cids[bi])
                out_l.append(np.full(len(pi), int(lid), dtype=np.int64))
                out_c.append(cos[pi, bi])
            if out_p:
                yield pd.DataFrame(
                    {
                        "probe_id": np.concatenate(out_p),
                        "neighbor_id": np.concatenate(out_n),
                        "list_id": np.concatenate(out_l),
                        "cos_raw": np.concatenate(out_c),
                    }
                )

    narrow = probes_bc is not None or probes_map is not None
    cols = ["vec_id", "v", "list_id"] + ([] if narrow else ["_probes"])
    return cand.select(*cols).mapInPandas(run, schema=schema)


def _cos_kernel(pairs: DataFrame, carry: tuple = ()) -> DataFrame:
    """(probe_id, neighbor_id, *carry, cos_raw) from (probe_id,
    neighbor_id, pv, v, *carry) — vectorized across pairs,
    accumulating in ascending-d order so each double is bit-identical
    to the sequential aggregate/zip_with fold of _cos_expr. `carry`
    columns (long-typed) pass through untouched."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("probe_id", T.LongType()), T.StructField("neighbor_id", T.LongType())]
        + [T.StructField(c, T.LongType()) for c in carry]
        + [T.StructField("cos_raw", T.DoubleType())]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.vstack(pdf["pv"].to_numpy()).astype(np.float64)
            b = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            n, dim = a.shape
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(dim):  # ascending-d fold == aggregate()
                dot = dot + a[:, d] * b[:, d]
                na = na + a[:, d] * a[:, d]
                nb = nb + b[:, d] * b[:, d]
            out = {
                "probe_id": pdf["probe_id"].to_numpy(np.int64),
                "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
            }
            for c in carry:
                out[c] = pdf[c].to_numpy(np.int64)
            out["cos_raw"] = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(run, schema=schema)


def _dot_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def kmeans_centroids(
    embeddings_df: DataFrame,
    k: int,
    iters: int = 10,
    sample: int = 100_000,
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """Deterministic sampled k-means for the IVF coarse quantizer —
    the real 10^12-scale recipe (train on a bounded driver sample,
    assign the full corpus distributed). Lloyd's iterations on
    L2-normalized vectors with spherical (max-dot) assignment;
    k-means++-style seeding from a seeded RNG; empty clusters respawn
    on the farthest point. Returns [(list_id, centroid)] with
    list_id = 0..k-1 — feed to ann_ivf_topk(centroids=...).

    Everything is deterministic (fixed seed, fixed sample order), so
    two runs — or the engine and a numpy replica in the tests — build
    the identical quantizer."""
    import numpy as np

    pdf = (
        embeddings_df.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(sample)
        .toPandas()
    )
    if len(pdf) == 0:
        return []
    m = np.stack(pdf["v"].to_numpy())
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    n = len(m)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    # k-means++ seeding on cosine distance (1 - dot)
    cent = [m[int(rng.integers(n))]]
    for _ in range(1, k):
        d = 1.0 - np.max(np.stack([m @ c for c in cent]), axis=0)
        d = np.clip(d, 1e-12, None)
        cent.append(m[int(rng.choice(n, p=d / d.sum()))])
    C = np.stack(cent)
    for _ in range(iters):
        assign = np.argmax(m @ C.T, axis=1)
        # respawn empty clusters on DISTINCT farthest points: taking
        # argmin once gave every simultaneously-empty cluster the SAME
        # point, leaving duplicate centroids whose ties always resolve
        # to the smaller list_id — the twin list stayed permanently
        # empty (r5 review)
        far_order = np.argsort((m * C[assign]).sum(axis=1))
        far_i = 0
        for j in range(k):
            members = m[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
            else:
                C[j] = m[int(far_order[min(far_i, n - 1)])]
                far_i += 1
    return [(j, C[j].tolist()) for j in range(k)]


# Above this many unrolled multiply-add TERMS (lists x dim) the literal
# greatest() assignment expression stops being viable — measured on
# this box (Spark 4.1, 48 GiB driver): 25 lists x 64 dims (1,600
# terms) compiles in ~9 s and is the proven driver-row/bench shape;
# 64 x 64 (4,096 terms) runs minutes-to-failure; 300 x 64 (19,200
# terms) OOMs the 48 GiB JVM during Janino compilation even on a
# 1,000-vector corpus. `assign_transport="auto"` switches to the Arrow
# argmax kernel above the cap.
_ASSIGN_EXPR_MAX_TERMS = 2048


def _assign_kernel(e: DataFrame, cent_rows: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, v, list_id): nearest-centroid corpus assignment for
    LARGE quantizers — the documented switch-over from the literal
    greatest() expression form, which unrolls lists x dim
    multiply-adds into one codegen'd expression and fails hard past a
    few thousand terms (see _ASSIGN_EXPR_MAX_TERMS for the measured
    cliff — at 300 lists x 64 dims the Janino compile OOMs a 48 GiB
    driver). Still map-only: zero Exchange, one Arrow pass over the
    corpus.

    Bit-identical to the expression form (parity-tested): the dot
    accumulates in ascending-d order (== the expression's
    left-to-right `v[0]*c0 + v[1]*c1 + ...` chain), and ties pick the
    smaller list_id (np.argmax keeps the FIRST max over centroid rows
    sorted ascending by list_id == greatest() over (dot, -list_id)
    structs).

    The centroid matrix ships in the task closure: it is serialized
    once per stage into the task binary, which Spark
    torrent-broadcasts to executors — so a 10^4-list x 64-dim float64
    quantizer costs ~5 MB per executor, not per task, with none of
    the ~30-45 s cold per-call cost a fresh Python `sc.broadcast` pays
    on local mode (see probe_transport's measured tradeoff)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    lids = np.array([lid for lid, _ in cent_rows], dtype=np.int64)
    C = np.array([c for _, c in cent_rows], dtype=np.float64)  # k x dim

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("list_id", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            pdf = pdf[pdf["v"].notna()]  # NULL rows: skip, don't crash
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["v"].to_numpy()).astype(np.float64)  # n x dim
            dot = np.zeros((len(V), C.shape[0]))
            for d in range(C.shape[1]):  # ascending-d fold == the expr chain
                dot = dot + V[:, d, None] * C[None, :, d]
            best = np.argmax(dot, axis=1)  # first max -> smallest list_id
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(np.int64),
                    "v": pdf["v"],
                    "list_id": lids[best],
                }
            )

    return e.select("vec_id", "v").mapInPandas(run, schema=schema)


def _assign_expr_df(e: DataFrame, cent_rows: list[tuple[int, list[float]]], dim: int) -> DataFrame:
    """(vec_id, v, list_id) via the literal greatest() codegen
    expression — the all-JVM zero-Python assignment form, shared by
    every probe transport (one definition so the compile-cap check and
    the (dot, -list_id) struct encoding cannot drift between
    branches). Refuses above _ASSIGN_EXPR_MAX_TERMS, the measured
    Janino OOM cliff."""
    if len(cent_rows) * dim > _ASSIGN_EXPR_MAX_TERMS:
        raise ValueError(
            f"assign_transport='expr' with {len(cent_rows)} lists x {dim} dims = "
            f"{len(cent_rows) * dim} unrolled terms > {_ASSIGN_EXPR_MAX_TERMS}: "
            "the literal expression's Janino compile fails hard past this "
            "(300x64 OOMs a 48 GiB driver); use 'kernel' (bit-identical)"
        )
    structs = ", ".join(
        "named_struct('d', "
        + " + ".join(f"v[{i}] * {c[i]!r}" for i in range(dim))
        + f", 'n', {-lid})"
        for lid, c in cent_rows
    )
    assign_expr = f"greatest({structs})" if len(cent_rows) > 1 else f"({structs})"
    return e.select(
        "vec_id", "v", (-F.expr(assign_expr).getField("n")).cast("long").alias("list_id")
    )


def _ivf_topk_rows(raw: DataFrame, k: int) -> DataFrame:
    """Shared tail of every IVF transport: JVM 5-dp round (oracle
    HALF_UP semantics) + per-probe (cos desc, neighbor_id) top-k."""
    scored = raw.select(
        "probe_id",
        "neighbor_id",
        F.round("cos_raw", 5).alias("cos_sim"),
        "list_id",
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def ann_ivf_topk(
    embeddings_df: DataFrame,
    probe_filter: str = "vec_id % 100 = 0",
    k: int = 3,
    nprobe: int = 3,
    centroids: list[tuple[int, list[float]]] | None = None,
    probe_transport: str = "closure",
    assign_transport: str = "auto",
) -> DataFrame:
    """IVF top-k: coarse-quantize every vector to its max-dot centroid
    list, probe the top `nprobe` lists per query vector, exact-cosine
    re-rank within them. Output (probe_id, neighbor_id, cos_sim,
    list_id).

    `centroids=None` uses per-label elementwise means — deterministic
    and SQL-expressible, which is what keeps the driver oracle a real
    DuckDB twin. Pass kmeans_centroids(...) output for the production
    quantizer (sampled k-means, ~sqrt(N) lists at scale); the list
    scan and re-rank are identical either way — the centroid table is
    a broadcast, the list id is the shuffle key.

    `probe_transport` picks how the per-list probe matrices reach the
    scoring kernel; all three produce bit-identical rows:

    - ``"closure"`` (default since r7): the probe set is collected
      eagerly (one small Arrow job), ranked against the centroids in
      numpy (same ascending-d fold and (dot desc, list_id asc)
      tie-break as the window form — see _rank_probes_local), and the
      per-list matrices ship inside the scoring kernel's TASK CLOSURE
      — serialized once per stage into the torrent-broadcast task
      binary, exactly how _assign_kernel ships the centroid matrix.
      With the default kernel assignment the corpus makes ONE fused
      Arrow pass (_assign_score_kernel: assign + score + quantum-safe
      top-k prune), vs the join transport's two passes plus
      per-candidate matrix duplication (measured r7: 24.8 s -> ~3 s on
      the 200k-vector bench shape) and the broadcast transport's
      ~30-45 s cold per-call sc.broadcast. This is the right local
      default AND the right cluster default at bench-like probe
      counts; revisit only when the probe matrix itself outgrows the
      task-binary budget (~tens of MB) — then "broadcast" on a
      long-lived cluster.
    - ``"join"``: attach each list's matrix as a nested
      `_probes` column via a broadcast join. The matrix is duplicated
      per candidate row through Arrow — shipped bytes scale as
      candidates x probes-per-list x (dim x 8 + 8) B, which is NOT
      small: ~625 MB at 500 probes / nprobe 3 / 25 lists / 20k
      vectors / 64 dims (60 probes per list x 520 B x 20k rows) —
      but the plan stays lazy and avoids Python-broadcast
      distribution entirely. Measured decisively faster anyway at
      that scale on local[32] (~12 s warm, full op): a fresh
      sc.broadcast costs ~30-45 s of cold per-worker distribution
      (cold 44.7 s vs warm 3.1 s, same pmap, same job), and every
      call creates a fresh broadcast id, so it never warms across
      calls. The crossover favors "broadcast" as probes-per-list or
      candidate count grow the duplication faster than the flat
      distribution cost (scripts/bench_ivf_transport.py re-measures
      the pair).
    - ``"broadcast"``: candidate rows stay narrow (id + vector +
      list id); matrices ship once per executor via sc.broadcast and
      are read inside the kernel. This is the high-probe-density
      scale shape — per-row duplication grows with probes-per-list
      while the broadcast cost is flat and amortizes over many tasks
      per executor on a long-lived cluster — but it runs probe
      ranking EAGERLY (toPandas) at call time, and the returned
      DataFrame carries the broadcast as `.probes_bc` for callers to
      `.destroy()` after consuming.

    `assign_transport` picks how the corpus reaches its list — both
    bit-identical (parity-tested):

    - ``"kernel"``: `_assign_kernel`'s Arrow argmax with the centroid
      matrix in the task closure. This is what "auto" (the default)
      picks at every size: interleaved A/B on the bench shapes
      measured it FASTER than the expression everywhere tested —
      20k vectors / 8 lists: 10.5 vs 12.7 s; 200k / 8 lists: 55.7 vs
      115.9 s (2.1x) — the per-row evaluation of the unrolled
      multiply-add chain loses to one vectorized matmul pass even
      though the kernel pays an Arrow round-trip of the corpus.
    - ``"expr"``: the literal greatest() codegen expression (below) —
      all-JVM, zero Python in the plan (the property a caller would
      choose it for); refused above `_ASSIGN_EXPR_MAX_TERMS` lists x
      dim terms, where its Janino compile is a measured OOM cliff
      (see the constant's comment)."""
    # pure parameter check — validate BEFORE the eager corpus jobs
    # below (dim probe, centroid aggregation), so a typo costs nothing
    if probe_transport not in ("closure", "join", "broadcast"):
        raise ValueError(
            f"probe_transport must be 'closure', 'join' or 'broadcast', got {probe_transport!r}"
        )
    if assign_transport not in ("auto", "expr", "kernel"):
        raise ValueError(
            f"assign_transport must be 'auto', 'expr' or 'kernel', got {assign_transport!r}"
        )
    e = embeddings_df.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    if probe_transport == "closure":
        # the closure path runs TWO jobs total (r7: job-launch
        # overhead, not compute, dominated the bench shape): (1) the
        # probe collect — on the label path, one combined corpus pass
        # yields probe rows AND centroid partials; with explicit
        # centroids, a plain JVM filter transfers only the probe rows
        # (no Arrow pass over the corpus just to tag probes — r7
        # review). Either way it answers the dim question and the
        # empty-input early exit, replacing the separate first()
        # probe; (2) the fused assign+score pass + top-k. NULL-
        # embedding probes are skipped like the old dim probe — the
        # lazy transports would crash on them at np.vstack time.
        if centroids is None:
            ppdf, partials = _probes_and_label_partials(e, probe_filter, need_cents=True)
        else:
            ppdf = (
                e.filter(probe_filter)
                .filter(F.col("v").isNotNull())
                .select("vec_id", "v")
                .toPandas()
            )
        spark = embeddings_df.sparkSession
        empty = "probe_id long, neighbor_id long, cos_sim double, list_id long"
        if len(ppdf) == 0:  # empty corpus or nothing matched the filter
            return spark.createDataFrame([], empty)
        dim = len(ppdf["v"].iloc[0])
        if centroids is not None:
            cent_rows = sorted((int(i), [float(x) for x in c]) for i, c in centroids)
        else:
            cent_rows = _combine_label_partials(partials, dim)
        pmap = _rank_probes_local(cent_rows, ppdf, nprobe)
        if not pmap:
            return spark.createDataFrame([], empty)
        if assign_transport in ("auto", "kernel"):
            # fused single-pass form: assign + score + quantum-safe
            # top-k prune in ONE corpus Arrow trip
            raw = _assign_score_kernel(e, cent_rows, pmap, k)
        else:  # "expr": all-JVM assignment, closure-matrix scoring
            assigned = _assign_expr_df(e, cent_rows, dim)
            if len(pmap) < len(cent_rows):
                assigned = assigned.filter(F.col("list_id").isin([int(k_) for k_ in pmap]))
            raw = _list_score_kernel(assigned, probes_map=pmap)
        return _ivf_topk_rows(raw, k)
    # dim probe skips NULL embeddings: size(NULL) is NULL, and the row
    # the scan happens to return first need not be clean (review r6)
    first = e.filter(F.col("v").isNotNull()).select(F.size("v").alias("d")).first()
    if first is None:  # empty input: empty result, not a crash
        spark = embeddings_df.sparkSession
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cos_sim double, list_id long"
        )
    dim = first["d"]
    # corpus-side assignment is MAP-ONLY (r4): the old plan crossJoined
    # every vector with the k-row centroid table and ran a row_number
    # window over vec_id — an N x k explode plus a FULL SHUFFLE of the
    # corpus just to take an argmax. The quantizer is tiny and known at
    # plan time (IVF is inherently two-phase: train, then assign), so
    # the argmax inlines as one JVM expression: greatest() over
    # (dot, -list_id) structs, literal centroid components unrolled
    # into multiply-adds inside whole-stage codegen. Same doubles,
    # same (dot desc, list_id asc) tie-break, zero Exchange. The
    # centroid values are materialized here (one bounded job on the
    # label path; the kmeans path already holds them). Since r6 the
    # DEFAULT map-only form is _assign_kernel's Arrow argmax — the
    # interleaved A/B measured it faster than this expression at every
    # size (2.1x at 200k rows), and the expression's Janino compile
    # fails hard past a few thousand terms; the expr stays as the
    # explicit zero-Python-plan option below the cap.
    spark = embeddings_df.sparkSession
    if centroids is not None:
        cent_rows = sorted((int(i), [float(x) for x in c]) for i, c in centroids)
    else:
        # ONE kernel pass computes the per-label means (r7, see
        # _label_centroids); probe ranking and corpus assignment both
        # reuse the SAME collected values, so there is no per-ulp
        # drift between the two consumers
        cent_rows = _label_centroids(e, dim)
    cents = spark.createDataFrame(cent_rows, "list_id long, c array<double>")
    if assign_transport == "auto":
        # measured, not guessed: the kernel won the interleaved A/B at
        # every corpus/quantizer size tested (see docstring) AND is the
        # only form that exists past the expr's compile cliff
        assign_transport = "kernel"
    if assign_transport == "expr":
        assigned = _assign_expr_df(e, cent_rows, dim)
    else:
        assigned = _assign_kernel(e, cent_rows)
    # probe-side ranking keeps the window — probes are the filtered
    # small side, and it needs the full top-nprobe order, not argmax
    scored_lists = (
        e.filter(probe_filter)
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "list_id", _dot_expr("v", "c").alias("_dot"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("_dot").desc(), F.col("list_id"))
    ranked = scored_lists.withColumn("_rk", F.row_number().over(w_assign))
    probes = ranked.filter(F.col("_rk") <= nprobe).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"), "list_id"
    )
    # list scan: the per-list probe matrices reach the ordered-fold
    # kernel (bit-identical doubles to the _cos_expr HOF,
    # parity-tested) via the transport chosen above; rounding stays
    # JVM F.round either way. Both transports avoid materializing
    # (pair x both arrays) rows — the pre-r5 pair form pushed ~3 GB
    # through Arrow at 500 probes x 50k vectors.
    if probe_transport == "join":
        # lazy: inner broadcast join drops candidates in unprobed
        # lists; each candidate row carries its list's full matrix
        # through Arrow (the honest cost of this form — see docstring)
        plist = probes.groupBy("list_id").agg(
            F.collect_list(F.struct("probe_id", "pv")).alias("_probes")
        )
        cand = assigned.join(F.broadcast(plist), "list_id")
        probes_bc = None
    else:  # "broadcast" — validated at entry
        import numpy as np

        ppdf = probes.toPandas()
        if len(ppdf) == 0:
            spark = embeddings_df.sparkSession
            out = spark.createDataFrame(
                [], "probe_id long, neighbor_id long, cos_sim double, list_id long"
            )
            # honor the .probes_bc contract on the empty path too — a
            # caller looping over probe sets calls .destroy() on every
            # returned frame, including ones that matched nothing
            out.probes_bc = spark.sparkContext.broadcast({})
            return out
        pmap = {}
        for lid, idx in ppdf.groupby("list_id", sort=False).indices.items():
            sub = ppdf.iloc[idx]
            pmap[int(lid)] = (
                sub["probe_id"].to_numpy(np.int64),
                np.vstack(sub["pv"].to_numpy()).astype(np.float64),
            )
        spark = embeddings_df.sparkSession
        probes_bc = spark.sparkContext.broadcast(pmap)
        # same semantics as the join form's inner join: candidates in
        # lists no probe ranked are dropped before the kernel. When
        # every list is probed (common at moderate list counts) the
        # filter would keep every row while still paying one extra
        # evaluation of the giant assignment expression per row, so it
        # is skipped; the kernel drops unknown lists either way.
        if len(pmap) < len(cent_rows):
            cand = assigned.filter(F.col("list_id").isin([int(k_) for k_ in pmap]))
        else:
            cand = assigned
    out = _ivf_topk_rows(_list_score_kernel(cand, probes_bc), k)
    if probes_bc is not None:
        # the broadcast lives until the caller destroys it — carried as
        # `.probes_bc` (the `.sig_cache` convention) so sessions
        # looping over many probe sets can `.probes_bc.destroy()`
        # after consuming; a leaked one is a few hundred KB pickled on
        # the driver.
        out.probes_bc = probes_bc
    return out


def ann_ivf_topk_sql(probe_filter: str = "vec_id % 100 = 0", k: int = 3, nprobe: int = 3) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT label AS list_id, list(valavg ORDER BY pos) AS c FROM (
    SELECT label, g.pos, avg(e.v[g.pos]) AS valavg
    FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS pos) g
    GROUP BY label, g.pos
  ) GROUP BY label
), ranked AS (
  SELECT vec_id, v, list_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_aggregate(list_transform(list_zip(v, c), t -> t[1] * t[2]), 'sum') DESC,
                    list_id
         ) AS _rk
  FROM e CROSS JOIN cents
), assigned AS (
  SELECT vec_id, v, list_id FROM ranked WHERE _rk = 1
), probes AS (
  SELECT vec_id AS probe_id, v AS pv, list_id
  FROM ranked WHERE _rk <= {nprobe} AND {probe_filter}
), scored AS (
  SELECT p.probe_id, a.vec_id AS neighbor_id, p.list_id,
         round(
           list_aggregate(list_transform(list_zip(p.pv, a.v), t -> t[1] * t[2]), 'sum')
           / (sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum'))
              * sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))),
           5) AS cos_sim
  FROM probes p JOIN assigned a ON p.list_id = a.list_id AND p.probe_id <> a.vec_id
)
SELECT probe_id, neighbor_id, cos_sim, list_id FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id) AS _rk
  FROM scored
) WHERE _rk <= {k}
"""


def embed_cosine_dups(embeddings_df: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from the LSH
    bucket join (never all-pairs — at 10^12 vectors the bucket count
    scales with `bits`), exact cosine verify at `threshold`. Output
    (vec_a, vec_b, cos_sim), vec_a < vec_b. The dedup-flavored twin of
    ann_lsh_topk (pairs above a similarity bar instead of top-k).

    Same shuffle discipline as ann_lsh_topk (r6 review — this operator
    had kept the pre-r5 wide shape): signatures come from the
    vectorized Arrow kernel (the interpreted-HOF Column form costs
    ~6k boxed lambda calls per row), the band join carries ONLY
    (t, bucket, id), and the embedding arrays re-attach by id after
    the pair dedup — a clustered bucket duplicates each pair up to
    n_tables times, and shipping both arrays through that duplication
    is the measured ~16 GB exchange the narrow form replaced. Doubles
    are bit-identical either way (kernel==Column parity is tested;
    rounding stays JVM F.round)."""
    base = embeddings_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e_nar = lsh_signatures_kernel(base).select(
        "vec_id", F.posexplode("buckets").alias("t", "bucket")
    )
    cand = (
        e_nar.select(F.col("vec_id").alias("vec_a"), "t", "bucket")
        .join(e_nar.select(F.col("vec_id").alias("vec_b"), "t", "bucket"), ["t", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    joined = cand.join(
        base.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("pv")), "vec_a"
    ).join(base.select(F.col("vec_id").alias("vec_b"), "v"), "vec_b")
    scored = _cos_kernel(
        joined.select(F.col("vec_a").alias("probe_id"), F.col("vec_b").alias("neighbor_id"), "pv", "v")
    ).select(
        F.col("probe_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.round("cos_raw", 5).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def embed_cosine_dups_sql(threshold: float = 0.3) -> str:
    return f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), tables AS (
  SELECT unnest(generate_series(0, {N_TABLES - 1})) AS t
), e AS (
  SELECT vec_id, v, t, CAST({bucket_sql('v')} AS BIGINT) AS bucket FROM e0 CROSS JOIN tables
), cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b, l.v AS va, r.v AS vb
  FROM e l JOIN e r ON l.t = r.t AND l.bucket = r.bucket AND l.vec_id < r.vec_id
), scored AS (
  SELECT vec_a, vec_b,
         round(
           list_aggregate(list_transform(list_zip(va, vb), p -> p[1] * p[2]), 'sum')
           / (sqrt(list_aggregate(list_transform(va, x -> x*x), 'sum'))
              * sqrt(list_aggregate(list_transform(vb, x -> x*x), 'sum'))),
           5) AS cos_sim
  FROM cand
)
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {threshold}
"""


def ann_lsh_topk_sql(
    probe_filter: str = "vec_id % 100 = 0",
    k: int = 3,
    multiprobe: int = MULTIPROBE,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> str:
    flips = ", ".join(str(f) for f in _flip_values(multiprobe, n_planes))
    return f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), tables AS (
  SELECT unnest(generate_series(0, {n_tables - 1})) AS t
), e AS (
  SELECT vec_id, v, t, CAST({bucket_sql('v', 't', n_planes)} AS BIGINT) AS bucket FROM e0 CROSS JOIN tables
), flips AS (
  SELECT unnest([{flips}]) AS f
), probes AS (
  SELECT vec_id AS probe_id, v AS pv, t, xor(bucket, f) AS bucket
  FROM e CROSS JOIN flips WHERE {probe_filter}
), cand AS (
  SELECT DISTINCT p.probe_id, e.vec_id AS neighbor_id, p.pv, e.v
  FROM probes p JOIN e ON p.t = e.t AND p.bucket = e.bucket AND p.probe_id <> e.vec_id
), scored AS (
  SELECT probe_id, neighbor_id,
         round(
           list_aggregate(list_transform(list_zip(pv, v), p -> p[1] * p[2]), 'sum')
           / (sqrt(list_aggregate(list_transform(pv, x -> x*x), 'sum'))
              * sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum'))),
           5) AS cos_sim
  FROM cand
)
SELECT probe_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id) AS _rk
  FROM scored
) WHERE _rk <= {k}
"""


def embed_topk_blocked(
    embeddings_df: DataFrame,
    probe_filter: str = "vec_id % 100 = 0",
    k: int = 5,
    block_size: int = 10_000,
    max_probe_bytes: int = 256 << 20,
) -> DataFrame:
    """EXACT cosine top-k for probe sets above the single-broadcast cap
    of the baseline kernel (queries.q_embed_topk refuses > max_probes):
    probes are split into blocks of `block_size`, each block ships as
    its own task broadcast, and the candidate table is scanned once per
    block (Catalyst unions the per-block kernels into one job). Cost is
    B = ceil(P / block_size) candidate scans — the textbook batched
    exact-kNN trade: bounded memory per task, linear extra scans. Above
    driver memory for the probe MATRIX itself, exactness must be
    sacrificed (LSH/IVF) or the matmul moved to a blocked shuffle
    cross-product; this is the documented middle tier. Output
    (probe_id, neighbor_id, cos_sim), self excluded, global top-k with
    (cos desc, neighbor_id) tie-break — identical rows to the baseline
    kernel on the same input.

    The probe ingestion is Arrow (toPandas -> numpy columns, never
    per-row Python objects) and BYTE-capped like the kNN candidate
    ingestion (joins._cand_arrays): this tier exists to lift
    q_embed_topk's probe-COUNT cap, not to hold an unbounded probe
    matrix on the driver, so above `max_probe_bytes` (default 256 MB,
    ~500k probes x 64 dims) it REFUSES and points at LSH/IVF — the
    cap is enforced with limit(cap_rows+1) inside the ingestion job,
    bounding the transfer itself, not just the kept matrix."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    spark = embeddings_df.sparkSession
    e = embeddings_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    # dim probe skips NULL embeddings: size(NULL) is NULL, and the row
    # the scan happens to return first need not be a probe row, so an
    # unrelated NULL would TypeError the byte-cap arithmetic (review r6)
    first = e.filter(F.col("v").isNotNull()).select(F.size("v").alias("d")).first()
    if first is None:
        return spark.createDataFrame([], schema)
    cap_rows = max(max_probe_bytes // (8 * int(first["d"]) + 8), 1)
    # NULL embeddings are skipped like the dim probe above (ADVICE r6
    # #4): a NULL v row matching probe_filter crashed np.vstack below
    cpdf = (
        e.filter(probe_filter)
        .filter(F.col("v").isNotNull())
        .limit(cap_rows + 1)
        .toPandas()
        .sort_values("vec_id")
    )
    if len(cpdf) > cap_rows:
        raise ValueError(
            f"embed_topk_blocked: probe matrix exceeds max_probe_bytes="
            f"{max_probe_bytes} ({cap_rows} x {int(first['d'])}-dim rows); "
            "use the LSH/IVF path for unbounded probe sets or raise the cap"
        )
    if len(cpdf) == 0:
        return spark.createDataFrame([], schema)
    pid_all = cpdf["vec_id"].to_numpy(np.int64)
    pm_all = np.vstack(cpdf["v"].to_numpy()).astype(np.float64)

    scored = None
    for s in range(0, len(pid_all), block_size):
        pid_l = pid_all[s : s + block_size]
        pm = pm_all[s : s + block_size]
        bc = spark.sparkContext.broadcast(
            (pid_l, pm / np.linalg.norm(pm, axis=1, keepdims=True))
        )

        def score(batches, _bc=bc, _k=k):
            pid, pm_n = _bc.value
            for pdf in batches:
                # NULL-embedding candidates can never be a neighbor —
                # drop them instead of crashing np.vstack (ADVICE r6
                # #4 made the probe side skip them; the candidate side
                # must degrade the same way)
                pdf = pdf[pdf["v"].notna()]
                if len(pdf) == 0:
                    continue
                cid = pdf["vec_id"].to_numpy(np.int64)
                cm = np.vstack(pdf["v"].to_numpy())
                cm_n = cm / np.linalg.norm(cm, axis=1, keepdims=True)
                cos = pm_n @ cm_n.T
                P, B = cos.shape
                kk = min(_k + 1, B)
                # same rounding-tie-safe cut as q_embed_topk (r5): the
                # global rank ties on the ROUNDED value, so keep
                # everything within one 1e-5 quantum of the kk-th best
                kth = -np.partition(-cos, kk - 1, axis=1)[:, kk - 1]
                rows_p, rows_c, rows_s = [], [], []
                for i in range(P):
                    for j in np.flatnonzero(cos[i] >= kth[i] - 1e-5):
                        if cid[j] != pid[i]:
                            rows_p.append(pid[i])
                            rows_c.append(cid[j])
                            rows_s.append(round(float(cos[i, j]), 5))
                yield pd.DataFrame(
                    {"probe_id": rows_p, "neighbor_id": rows_c, "cos_sim": rows_s}
                )

        part = e.mapInPandas(score, schema=schema)
        scored = part if scored is None else scored.unionByName(part)

    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")
