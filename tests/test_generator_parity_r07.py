"""r7 regression gate for the literal-unrolled bench generators:
datasets.documents_range / embeddings_range replaced interpreted
higher-order-function lambdas (per-element boxed evaluation, the
measured floor of every generated-corpus bench consumer) with
literal-index codegen expressions. The rows must be BIT-IDENTICAL to
the original HOF formulations — these tests keep the original forms
inline as the reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from util_gis_spark import datasets as D
from util_gis_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("gen-parity", master="local[4]", shuffle_partitions=4)


def _documents_range_hof(spark, n_docs, partitions):
    """The pre-r7 transform()-lambda form, verbatim."""
    k = F.col("id").cast("long")
    seed = (k - F.when(k % 17 == 1, 1).otherwise(0)).cast("string")
    hot = (k % 10) < 3
    word = lambda s, j: F.substring(  # noqa: E731
        F.md5(F.concat(s, F.lit("_"), j.cast("string"))), 1, 8
    )
    body = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(36)), lambda j: word(seed, j)), " "
    )
    tail = F.array_join(
        F.transform(F.sequence(F.lit(37), F.lit(39)), lambda j: word(k.cast("string"), j)),
        " ",
    )
    prefix = F.when(
        hot,
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(9)), lambda j: word(F.lit("HOT"), j)), " "
        ),
    ).otherwise(
        F.array_join(
            F.transform(F.sequence(F.lit(40), F.lit(49)), lambda j: word(seed, j)), " "
        )
    )
    return spark.range(0, n_docs, 1, partitions).select(
        k.alias("doc_id"), F.concat_ws(" ", prefix, body, tail).alias("text")
    )


def _embeddings_range_hof(spark, n_vecs, partitions, dim=64, n_clusters=25):
    """The pre-r7 transform()/aggregate()-lambda form, verbatim."""
    k = F.col("id").cast("long")
    c = (k % n_clusters).cast("long")
    j = F.sequence(F.lit(0), F.lit(dim - 1))
    raw = F.transform(
        j,
        lambda i: F.sin(c.cast("double") * 7.10 + i.cast("double") * 1.30)
        + 0.3 * F.sin(k.cast("double") * 12.9898 + i.cast("double") * 78.233),
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = F.transform(raw, lambda x: x / norm)
    return spark.range(0, n_vecs, 1, partitions).select(
        k.alias("vec_id"), unit.alias("embedding"), c.cast("int").alias("label")
    )


def test_documents_range_identical_to_hof_form(spark):
    # 600 rows cover every branch: near-dup (k%17==1), hot prefix
    # (k%10<3), and the plain path, each many times over
    new = D.documents_range(spark, 600, 4).orderBy("doc_id").collect()
    old = _documents_range_hof(spark, 600, 4).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in new] == [
        (r["doc_id"], r["text"]) for r in old
    ]


def test_embeddings_range_identical_to_hof_form(spark):
    new = D.embeddings_range(spark, 300, 4).orderBy("vec_id").toPandas()
    old = _embeddings_range_hof(spark, 300, 4).orderBy("vec_id").toPandas()
    assert (new["label"].to_numpy() == old["label"].to_numpy()).all()
    mn = np.vstack(new["embedding"].to_numpy())
    mo = np.vstack(old["embedding"].to_numpy())
    # bit-identical, not approx: every double must match exactly
    assert (mn == mo).all()


def test_embeddings_range_nondefault_shape(spark):
    new = D.embeddings_range(spark, 120, 2, dim=16, n_clusters=7).orderBy("vec_id").toPandas()
    old = _embeddings_range_hof(spark, 120, 2, dim=16, n_clusters=7).orderBy("vec_id").toPandas()
    assert (np.vstack(new["embedding"]) == np.vstack(old["embedding"])).all()
