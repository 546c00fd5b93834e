"""Interleaved A/B of record for the r6 embed_cosine_dups reshape:
OLD = pre-r6 wide shape (interpreted-HOF Column signatures; both
embedding arrays carried through the t/bucket band join and the pair
dedup), NEW = ann.embed_cosine_dups (Arrow signature kernel; narrow
(t, bucket, id) band join; arrays re-attach by id after dedup — the
same discipline ann_lsh_topk adopted in r5 at 352 -> 15 s).

Run: python scripts/bench_cosine_dups_shape.py [n_vecs] [reps]
Prints one line per rep (interleaved NEW/OLD, min-of-reps protocol —
never sequence an A/B once under rising tail load) plus a row-set
equality check: the reshape must be a pure plan change.

Measured (2026-08-17, n=5000 clustered, threshold 0.95, 414,265
identical rows both forms):

- COLD, one form per fresh JVM, interleaved A/B/A/B — the realistic
  single-shot session shape: NEW 46.8 / 25.0 s vs OLD 204.7 / 64.2 s
  (2.6-4x). OLD's first call pays the wide dedup exchange (~8M rows x
  two 64-dim arrays) plus the interpreted-HOF signature evaluation
  before C2 compiles it.
- IN-PROCESS reps (this script): OLD's first rep reproduces the cold
  cliff (251 / 273 s across two runs) then drops to 25 / 6.8 s once
  the JVM has JIT-compiled the interpreted-lambda path and the page
  cache is hot; NEW stays flat (25-63 s). A min-of-reps read of ONE
  warmed process would therefore falsely prefer OLD — the cold
  per-process numbers above are the decision record, and they agree
  with the r5 ann_lsh_topk reshape (352 -> 15 s, same discipline).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from util_gis_spark import datasets as D  # noqa: E402
from util_gis_spark.operators import ann  # noqa: E402
from util_gis_spark.operators.ann import N_TABLES, _cos_expr, bucket_expr  # noqa: E402
from util_gis_spark.session import get_spark  # noqa: E402


def old_embed_cosine_dups(embeddings_df, threshold=0.3):
    """The pre-r6 wide shape, verbatim."""
    e = (
        embeddings_df.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("t", F.explode(F.expr(f"sequence(0, {N_TABLES - 1})")))
        .withColumn("bucket", F.expr(bucket_expr("v")).cast("long"))
    )
    left = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "t", "bucket")
    right = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "t", "bucket")
    cand = (
        left.join(right, ["t", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    scored = cand.select("vec_a", "vec_b", F.round(_cos_expr("va", "vb"), 5).alias("cos_sim"))
    return scored.filter(F.col("cos_sim") >= threshold)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench_cosine_dups_shape")
    emb = D.embeddings_range(spark, n, 64).select("vec_id", "embedding")
    # clustered corpus -> hot buckets -> the duplication regime the
    # narrow join exists for (threshold high enough to bound output)
    thr = 0.95

    best = {"new": float("inf"), "old": float("inf")}
    counts = {}
    for r in range(reps):
        for name, fn in (("new", ann.embed_cosine_dups), ("old", old_embed_cosine_dups)):
            t0 = time.perf_counter()
            counts[name] = fn(emb, threshold=thr).count()
            el = time.perf_counter() - t0
            best[name] = min(best[name], el)
            print(
                f"rep{r} {name}: {el:.3f}s rows={counts[name]} "
                f"load={os.getloadavg()[0]:.2f}",
                flush=True,
            )
    assert counts["new"] == counts["old"], counts
    # value equality, not just counts: the reshape is a pure plan change
    a = ann.embed_cosine_dups(emb, threshold=thr)
    b = old_embed_cosine_dups(emb, threshold=thr)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print(
        f"RESULT n={n} new_min={best['new']:.3f}s old_min={best['old']:.3f}s "
        f"rows={counts['new']} identical=True"
    )
    spark.stop()


if __name__ == "__main__":
    main()
