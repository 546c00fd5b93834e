"""Checkpoint/resume with per-partition lineage + row/byte metrics
(north rule: 'resumable from checkpoint with per-partition lineage +
metrics').

A pipeline is a named sequence of stages; each stage materializes to
`<root>/<stage>/data` (parquet) with a `_SUCCESS_META.json` manifest
recording row count, per-partition rows/bytes, input-stage lineage and
the stage expression fingerprint. On re-run, a stage whose manifest
exists and whose upstream fingerprints match is SKIPPED and its
parquet is read back — a failed job resumes from the last durable
stage. Metrics come from df.observe (rows) + the files' on-disk bytes
per partition, so they're collected without a second pass.

At 10^12-row scale each stage write is an Iceberg table append and the
manifest maps 1:1 onto Iceberg snapshot metadata; parquet + JSON is
the sandbox stand-in.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    bytes: int
    partitions: list[dict]
    resumed: bool


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.results: dict[str, StageResult] = {}
        os.makedirs(root, exist_ok=True)

    def _meta_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "_SUCCESS_META.json")

    def _data_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "data")

    def _fingerprint(self, stage: str, deps: list[str], logical_plan: str) -> str:
        h = hashlib.sha256()
        h.update(stage.encode())
        for d in deps:
            # only DURABLE identity goes into the hash: the dep name,
            # its on-disk fingerprint, and its write_id. (The r4 review
            # caught two bugs here: hashing the in-memory result path
            # with a '?' fallback made the fingerprint depend on which
            # stages ran in THIS process — mid-pipeline resumes
            # thrashed between two fingerprints forever — and without
            # the write_id a force-rebuilt dep with an unchanged plan
            # left dependents resuming stale data.)
            h.update(d.encode())
            mp = self._meta_path(d)
            if os.path.exists(mp):
                with open(mp) as f:
                    m = json.load(f)
                h.update(m.get("fingerprint", "").encode())
                h.update(m.get("write_id", "").encode())
        # the caller passes an already-normalized plan string (see
        # stage(): canonicalized analyzed plan, exprIds deterministic)
        h.update(logical_plan.encode())
        return h.hexdigest()[:16]

    def _source_identity(self, df: DataFrame) -> str:
        """Content identity for the stage's RAW file inputs: the plan
        string alone names no file content, so a root stage whose
        source parquet was regenerated (same schema, new rows) used to
        resume the STALE checkpoint silently (r5 review — the write_id
        mechanism only covers dep stages). Hash every input file's
        (path, size, mtime); unreachable/remote paths contribute their
        path only. Two r6-review fixes: (1) Hadoop percent-encodes
        URIs, so paths with a space/non-ASCII char failed os.stat and
        silently dropped size/mtime from the hash — re-opening the
        stale-resume hole; URIs are now properly decoded. (2) files
        under the checkpoint root itself (dep checkpoint parquet) are
        SKIPPED: dep identity is already the manifest fingerprint +
        write_id, and hashing dep part-file mtimes made a cp -r
        restore of a valid checkpoint tree rebuild every dependent
        stage from scratch."""
        from urllib.parse import unquote, urlparse

        root_abs = os.path.abspath(self.root) + os.sep
        h = hashlib.sha256()
        for uri in sorted(df.inputFiles()):
            parsed = urlparse(uri)
            path = unquote(parsed.path) if parsed.scheme else uri
            if os.path.abspath(path).startswith(root_abs):
                continue
            h.update(uri.encode())
            try:
                st = os.stat(path)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                pass
        return h.hexdigest()[:16]

    def stage(
        self,
        name: str,
        build: Callable[..., DataFrame],
        deps: list[str] = (),
        force: bool = False,
    ) -> DataFrame:
        """Run (or resume) one stage. `build` receives the dep
        DataFrames (read back from their checkpoints) and returns the
        stage DataFrame."""
        dep_dfs = [self.spark.read.parquet(self._data_path(d)) for d in deps]
        df = build(*dep_dfs)
        qe = df._jdf.queryExecution()
        try:
            # canonicalized ANALYZED plan: exprIds are normalized
            # deterministically by position (stable across sessions)
            # while data literals survive — the old regex strip of
            # '#\d+' also rewrote literals like 'poly#12', so two
            # stages differing only in such a literal shared a
            # fingerprint and the edited stage silently resumed stale
            # data (r6 review)
            plan_str = qe.analyzed().canonicalized().toString()
        except Exception:  # canonicalization unavailable: legacy strip
            plan_str = re.sub(r"#\d+", "#", qe.logical().toString())
        # output names + types fold into the fingerprint (ADVICE r6
        # #1): canonicalization erases attribute names for sameResult,
        # so a stage edit that only RENAMES output columns produced an
        # identical fingerprint and silently resumed the stale parquet
        # carrying the old names
        plan_str += "|" + df.schema.simpleString()
        fp = self._fingerprint(name, list(deps), plan_str + self._source_identity(df))

        meta_path = self._meta_path(name)
        data_path = self._data_path(name)
        if not force and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == fp:
                self.results[name] = StageResult(
                    name, data_path, meta["rows"], meta["bytes"], meta["partitions"], True
                )
                return self.spark.read.parquet(data_path)

        # invalidate BEFORE clobbering the data: a crash mid-overwrite
        # must not leave a matching manifest over partial parquet (the
        # next run would silently resume the partial checkpoint)
        if os.path.exists(meta_path):
            os.remove(meta_path)
        obs = Observation(f"obs_{name}")
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        observed.write.mode("overwrite").parquet(data_path)
        rows = int(obs.get["rows"])

        parts = []
        total_bytes = 0
        for fn in sorted(os.listdir(data_path)):
            if fn.startswith("part-"):
                size = os.path.getsize(os.path.join(data_path, fn))
                parts.append({"file": fn, "bytes": size})
                total_bytes += size
        meta = {
            "stage": name,
            "fingerprint": fp,
            # fresh per write: dependents hash it, so ANY rebuild of
            # this stage (force or plan change) invalidates them too
            "write_id": uuid.uuid4().hex,
            "deps": list(deps),
            "rows": rows,
            "bytes": total_bytes,
            "partitions": parts,
        }
        # atomic publish: a torn _SUCCESS_META.json would crash every
        # later run in json.load
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, meta_path)
        self.results[name] = StageResult(name, data_path, rows, total_bytes, parts, False)
        return self.spark.read.parquet(data_path)

    def manifest(self) -> dict:
        return {
            n: {"rows": r.rows, "bytes": r.bytes, "resumed": r.resumed, "n_partitions": len(r.partitions)}
            for n, r in self.results.items()
        }
