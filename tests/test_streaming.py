"""Structured Streaming parity tests: streaming session windows and
tile rollups must agree with their batch counterparts on the same
input."""

import pytest
from pyspark.sql import functions as F

from util_gis_spark import datasets as D
from util_gis_spark import streaming as S
from util_gis_spark.geo.cells import cell_expr


@pytest.fixture(scope="module")
def stream_results(spark, sf_dir):
    pts = S.gps_point_stream(spark, sf_dir)
    sess = S.run_stream_to_memory(S.sessionize_stream(pts, gap="300 seconds"), "t_sessions")
    tiles = S.run_stream_to_memory(S.tile_count_stream(pts, res=14), "t_tiles")
    return sess, tiles


def test_streaming_sessions_match_batch(spark, sf_dir, stream_results):
    sess, _ = stream_results
    got = {
        (r["device_id"], r["start_ts"], r["end_ts"], r["n_points"]) for r in sess.collect()
    }
    # batch twin: same gap cut (gps ts are microsecond-random, so the
    # exact-300s boundary divergence cannot occur)
    from util_gis_spark.operators.trajectory import session_summary

    batch = session_summary(D.gps_points(spark, sf_dir), max_gap_s=300)
    want = {
        (r["device_id"], r["start_ts"], r["end_ts"], r["n_points"]) for r in batch.collect()
    }
    assert got == want


def test_stateful_sessionizer_closed_sessions_match_batch(spark, sf_dir):
    """applyInPandasWithState: every CLOSED session it emits must be a
    session the batch operator also finds (the trailing open session
    per device stays in state under availableNow)."""
    from pyspark.sql import functions as F

    from util_gis_spark.operators.trajectory import session_summary

    pts = S.gps_point_stream(spark, sf_dir)
    q = (
        S.sessionize_stream_stateful(pts, gap_s=300)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["device_id"], r["start_ts"], r["end_ts"], r["n_points"])
        for r in spark.table("t_stateful").collect()
    }
    batch = session_summary(D.gps_points(spark, sf_dir), max_gap_s=300)
    want = {
        (r["device_id"], r["start_ts"], r["end_ts"], r["n_points"])
        for r in batch.collect()
    }
    assert got <= want  # closed sessions are a subset (opens pending)
    n_devices = D.gps_points(spark, sf_dir).select("device_id").distinct().count()
    assert len(got) >= len(want) - n_devices  # at most 1 open per device


def test_streaming_tile_counts_match_batch(spark, sf_dir, stream_results):
    _, tiles = stream_results
    total_stream = sum(r["n"] for r in tiles.collect())
    total_batch = D.gps_points(spark, sf_dir).count()
    assert total_stream == total_batch
    # spot-check one cell against batch
    batch = (
        D.gps_points(spark, sf_dir)
        .withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), 14))
        .groupBy("cell")
        .count()
    )
    want = {r["cell"]: r["count"] for r in batch.collect()}
    got: dict = {}
    for r in tiles.collect():
        got[r["cell"]] = got.get(r["cell"], 0) + r["n"]
    assert got == want


def test_streaming_simhash_dups_match_batch(spark, sf_dir):
    """Streaming near-dup detection emits exactly the batch pair set
    (every band-sharing pair within max_hamming, deduped)."""
    from util_gis_spark.operators.dedup import simhash_near_dup_pairs

    q = (
        S.simhash_dup_stream(S.document_stream(spark, sf_dir), max_hamming=2)
        .writeStream.format("memory")
        .queryName("t_simdup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["doc_a"], r["doc_b"]) for r in spark.table("t_simdup").collect()}
    batch = simhash_near_dup_pairs(D.load(spark, sf_dir, "documents"), max_hamming=2)
    want = {(r["doc_a"], r["doc_b"]) for r in batch.collect()}
    assert got == want
    for r in spark.table("t_simdup").collect():
        assert r["hamming"] <= 2 and r["doc_a"] < r["doc_b"]
