"""Structured Streaming surface.

The reference is batch-only; its cadence/session windows (SURVEY §2.5)
are the batch analogue of event-time session windows. This module maps
the same semantics onto readStream -> session_window + watermark so
the engine can ingest live trajectories:

- session gap rule == splitClusterByTime's `dt > gap` cut, with one
  documented boundary difference: Spark session windows are
  half-open ([start, last+gap)), so a step of EXACTLY `gap` seconds
  starts a new session, while the batch rule keeps it (`>` vs `>=`).
  Tests use data away from the exact boundary.
- late data handled by the watermark; state eviction is automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_stream_dir(sf_dir: str, table: str, prefix: str) -> str:
    """File streams need a DIRECTORY source: stage a /tmp symlink dir
    pointing at the table's parquet (one definition — r5 review: the
    10-line staging block was duplicated verbatim in both sources)."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/{table}.parquet")
    stage = f"/tmp/util_gis_spark_{prefix}_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{table}.parquet")
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)  # dangling symlink from a moved/recreated source
    if not os.path.lexists(link):
        os.symlink(src, link)
    return stage


def gps_point_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-based stream over the events table (the sandbox stand-in
    for a Kafka topic of GPS reports), derived to the gps_points shape
    by the SAME column rule as the batch view (datasets.gps_point_cols
    — one definition, so the streaming source cannot drift from the
    oracle-pinned batch derivation; r5 review)."""
    from . import datasets as D

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage = _stage_stream_dir(sf_dir, "events", "stream")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )
    return stream.select(*D.gps_point_cols()).select(
        "device_id", F.col("ts").cast("timestamp").alias("ts"), "lon", "lat"
    )


def sessionize_stream(
    points_stream: DataFrame,
    gap: str = "300 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time session windows per device: the streaming form of
    splitClusterByTime (G:2864-2932)."""
    return (
        points_stream.withWatermark("ts", watermark)
        .groupBy("device_id", F.session_window("ts", gap).alias("session"))
        .agg(
            F.count("*").alias("n_points"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .select("device_id", "n_points", "start_ts", "end_ts")
    )


def tile_count_stream(points_stream: DataFrame, res: int = 14, watermark: str = "10 minutes") -> DataFrame:
    """Streaming tile rollup: images/points per cell per 5-minute
    tumbling window — the live ingestion counterpart of the batch
    tile-assignment rollup."""
    from .geo.cells import cell_expr

    return (
        points_stream.withWatermark("ts", watermark)
        .withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), res))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "cell")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "cell", "n")
    )


def sessionize_stream_stateful(
    points_stream: DataFrame,
    gap_s: int = 300,
    watermark: str = "10 minutes",
    flush_timeout: bool = True,
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState — the
    arbitrary-state API the built-in session_window can't replace when
    the reference's richer state machines (cadence voting, G:6249) go
    streaming. State per device: (seg_start_s, last_s, n_points).
    Emits one row per CLOSED session; with `flush_timeout` the final
    open session flushes when the state times out.

    `flush_timeout=False` is REQUIRED for availableNow/one-shot runs:
    a ProcessingTimeTimeout is re-armed on every batch, so available-
    now keeps scheduling empty batches to fire timeouts that keep
    moving — the query literally never terminates (r5 review: the old
    test masked this by ignoring awaitTermination's False and reading
    the by-then-complete table under a still-spinning query). On a
    continuous stream the timeout flush is the right semantics and
    the default."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("device_id", LongType()),
            StructField("start_ts", TimestampType()),
            StructField("end_ts", TimestampType()),
            StructField("n_points", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("seg_start_s", LongType()),
            StructField("last_s", LongType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        device_id = key[0]
        if state.exists:
            seg_start, last, n = state.get
        else:
            seg_start = last = None
            n = 0
        closed = []
        # a large group arrives as MULTIPLE Arrow chunks (the session
        # caps maxRecordsPerBatch at 20k): sorting per chunk let a
        # later chunk rewind `last` and split a continuous trajectory
        # (r5 review) — gather every chunk, then sort ONCE
        import numpy as np

        parts = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # normalize explicitly to ns before the µs conversion —
            # pandas/pyarrow may deliver datetime64[us] depending on
            # version, which would skew the gap rule by 1000x
            parts.append(
                (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000).to_numpy()
            )
        if parts:
            us = np.concatenate(parts)
            us.sort()
            for u in us:
                # gap rule on floored seconds == batch unix_timestamp diff
                if seg_start is None:
                    seg_start, last, n = int(u), int(u), 1
                elif u // 1_000_000 - last // 1_000_000 > gap_s:
                    closed.append((device_id, seg_start, last, n))
                    seg_start, last, n = int(u), int(u), 1
                else:
                    last = int(u)
                    n += 1
        if flush_timeout and state.hasTimedOut:
            if seg_start is not None:
                closed.append((device_id, seg_start, last, n))
            state.remove()
        elif seg_start is not None:
            # only persist a REAL open session — seeding (0, 0, 0) when
            # all chunks were empty would later close a phantom
            # epoch-1970 session (and `or 0` would conflate a
            # legitimate epoch-0 start with absent state)
            state.update((int(seg_start), int(last), int(n)))
            if flush_timeout:
                state.setTimeoutDuration(gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "device_id": [c[0] for c in closed],
                    "start_ts": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "end_ts": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_points": [c[3] for c in closed],
                }
            )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if flush_timeout else GroupStateTimeout.NoTimeout
    )
    return (
        points_stream.withWatermark("ts", watermark)
        .groupBy("device_id")
        .applyInPandasWithState(fn, out_schema, state_schema, "append", timeout_conf)
    )


def document_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-based stream over the documents table (the sandbox
    stand-in for a Kafka topic of crawled documents)."""
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stage = _stage_stream_dir(sf_dir, "documents", "docstream")
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
        .select("doc_id", "text")
    )


def simhash_dup_stream(
    docs_stream: DataFrame, max_hamming: int = 2, max_bucket: int = 10_000
) -> DataFrame:
    """Streaming near-duplicate detection: the live-ingestion form of
    dedup.simhash_near_dup_pairs. The simhash fingerprint + half-band
    LSH are the same pure Column expressions as the batch operator
    (streaming-safe); per (band, bh) bucket an applyInPandasWithState
    keeps the fingerprints seen so far and emits (doc_a, doc_b,
    hamming, band) the moment a new document collides within
    `max_hamming`. State per bucket is capped at `max_bucket`
    fingerprints (16 bytes each) — at production scale the eviction
    policy would be a time-TTL via setTimeoutDuration, trading recall
    on ancient duplicates for bounded state, exactly like a watermark.
    Pairs colliding in BOTH half-bands are emitted once per band —
    dedup downstream if exact-once pairs matter."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from .operators.dedup import simhash_docs

    s = simhash_docs(docs_stream)
    # single explode, not a 2-way union — the union form re-ran the
    # signature subplan per branch (see the batch operator's r4 note)
    bands = s.select(
        "doc_id", "simhash", F.explode(F.expr("sequence(0, 1)")).alias("band")
    ).withColumn(
        "bh",
        F.when(F.col("band") == 0, F.col("simhash") % 65536).otherwise(
            (F.col("simhash") / 65536).cast("long") % 65536
        ),
    )

    out_schema = StructType(
        [
            StructField("doc_a", LongType()),
            StructField("doc_b", LongType()),
            StructField("hamming", IntegerType()),
            StructField("band", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("hashes", ArrayType(LongType())),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        band = int(key[0])
        ids: list[int] = []
        hashes: list[int] = []
        if state.exists:
            st_ids, st_hashes = state.get
            ids = list(st_ids)
            hashes = list(st_hashes)
        rows_a, rows_b, rows_h = [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            arriving = sorted(zip(pdf["doc_id"], pdf["simhash"]))
            seen = set(ids)
            for doc_id, sh in arriving:
                doc_id, sh = int(doc_id), int(sh)
                if doc_id in seen:
                    # re-ingested doc: already in state — appending
                    # again would re-emit all its historical pairs and
                    # bloat the bucket with duplicates
                    continue
                if len(ids) >= max_bucket:
                    # bucket CLOSED: emit nothing and record nothing —
                    # the batch cap drops oversized (boilerplate)
                    # buckets wholesale, and emitting without recording
                    # would re-emit the same pairs on every replay of
                    # this doc (the re-ingest guard only covers
                    # recorded ids; r5 review)
                    continue
                for prev_id, prev_sh in zip(ids, hashes):
                    h = (prev_sh ^ sh).bit_count()
                    if h <= max_hamming:
                        rows_a.append(min(prev_id, doc_id))
                        rows_b.append(max(prev_id, doc_id))
                        rows_h.append(h)
                ids.append(doc_id)
                hashes.append(sh)
                seen.add(doc_id)
        state.update((ids, hashes))
        if rows_a:
            yield pd.DataFrame(
                {"doc_a": rows_a, "doc_b": rows_b, "hamming": rows_h, "band": band}
            )

    return bands.groupBy("band", "bh").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def minhash_dup_stream(
    docs_stream: DataFrame, est_threshold: float = 0.5, max_bucket: int = 10_000
) -> DataFrame:
    """Streaming MinHash near-dup detection — the live-ingestion form
    of dedup.minhash_near_dup_pairs. Same signature kernel (stateless
    mapInPandas, streaming-safe) and the same 4-band LSH; per band
    bucket an applyInPandasWithState keeps the 16-value signatures
    seen so far and emits (doc_a, doc_b, est_jaccard, band) when a
    new doc collides.

    The streaming TRADE vs batch: exact Jaccard needs both docs' full
    shingle-hash sets — unbounded state — so the stream verifies on
    the signature-agreement ESTIMATOR instead (matching components /
    16, the textbook unbiased MinHash estimate; 136 B/doc/band of
    state). Candidate pairs are EXACTLY the batch band collisions
    (tested); pairs passing est_threshold are a superset/subset of the
    exact-verify set only as far as the estimator deviates — route
    emitted pairs through a batch exact verify downstream when the
    decision is destructive. State per bucket capped at `max_bucket`
    signatures, same eviction story as simhash_dup_stream."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from .operators.dedup import N_HASHES, _sig_kernel, band_table_expr

    base = _sig_kernel(docs_stream)
    bands = base.select(
        "doc_id", "_sig", F.explode(F.expr(band_table_expr())).alias("_b")
    ).select(
        "doc_id",
        "_sig",
        F.col("_b.band").alias("band"),
        F.col("_b.bh").alias("bh"),
    )

    out_schema = StructType(
        [
            StructField("doc_a", LongType()),
            StructField("doc_b", LongType()),
            StructField("est_jaccard", DoubleType()),
            StructField("band", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("sigs", ArrayType(LongType())),  # flattened 16/doc
        ]
    )

    def fn(key, pdfs, state: GroupState):
        band = int(key[0])
        ids: list[int] = []
        sigs: list[int] = []
        if state.exists:
            st_ids, st_sigs = state.get
            ids = list(st_ids)
            sigs = list(st_sigs)
        rows_a, rows_b, rows_j = [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            arriving = sorted(
                (int(d), [int(x) for x in s]) for d, s in zip(pdf["doc_id"], pdf["_sig"])
            )
            seen = set(ids)
            for doc_id, sig in arriving:
                if doc_id in seen:
                    # re-ingested doc: skip — see simhash_dup_stream
                    continue
                if len(ids) >= max_bucket:
                    # bucket closed — see simhash_dup_stream (batch-cap
                    # semantics + the re-ingest guard only covers
                    # recorded ids)
                    continue
                for k in range(len(ids)):
                    prev_id = ids[k]
                    prev_sig = sigs[k * N_HASHES : (k + 1) * N_HASHES]
                    agree = sum(a == b for a, b in zip(prev_sig, sig))
                    est = agree / N_HASHES
                    if est >= est_threshold:
                        rows_a.append(min(prev_id, doc_id))
                        rows_b.append(max(prev_id, doc_id))
                        rows_j.append(round(est, 5))
                ids.append(doc_id)
                sigs.extend(sig)
                seen.add(doc_id)
        state.update((ids, sigs))
        if rows_a:
            yield pd.DataFrame(
                {"doc_a": rows_a, "doc_b": rows_b, "est_jaccard": rows_j, "band": band}
            )

    return bands.groupBy("band", "bh").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Run a stream into an in-memory table (tests/demos): processes
    everything available, stops, returns the result. `output_mode`
    defaults to 'complete' (aggregation streams); the stateful
    applyInPandasWithState operators need 'append'. Raises on timeout
    instead of returning a silently PARTIAL table (r5 review:
    awaitTermination's boolean was discarded)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream {name!r} still running after {timeout_s}s — "
            "the in-memory table would be partial"
        )
    spark = stream_df.sparkSession
    return spark.table(name)
