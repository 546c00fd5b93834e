"""Recall report for the ANN scale paths vs the exact baseline.

Recall@k is THE honest quality number for an ANN index: a bucketed
path that silently returns the wrong neighbors at scale is worse than
a slow exact one. This script measures, on the same embeddings table
and probe set the driver queries use:

- recall@1 / recall@3 of ann_lsh_topk (random-hyperplane buckets)
- recall@1 / recall@3 of ann_ivf_topk (inverted lists + nprobe)
- their IVF nprobe sweep (1 / 3 / 5) to show the recall-vs-work dial

against the brute-force exact cosine ranking computed HERE with plain
numpy (not the engine's embed_topk kernel, so the truth set is
independent of the code under measurement).

Usage: python scripts/ann_recall.py [sf_dir]   (default sf0.01)
Appends nothing; prints a markdown table to paste into BENCH docs.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def exact_truth(k: int = 3):
    """Ground truth from raw parquet via numpy: for each probe
    (vec_id % 100 == 0) the top-k cosine neighbors (self excluded)."""
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding::DOUBLE[] AS emb "
        f"FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids = df["vec_id"].to_numpy(np.int64)
    m = np.stack(df["emb"].to_numpy())
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    probes = ids % 100 == 0
    sims = m[probes] @ m.T
    pids = ids[probes]
    truth: dict[int, list[int]] = {}
    for row, pid in enumerate(pids):
        s = sims[row].copy()
        s[ids == pid] = -np.inf
        top = np.argsort(-s, kind="stable")[:k]
        truth[int(pid)] = [int(ids[j]) for j in top]
    return truth


def recall(got: dict[int, list[int]], truth: dict[int, list[int]], k: int) -> float:
    hits = total = 0
    for pid, t in truth.items():
        g = set(got.get(pid, [])[:k])
        hits += len(g & set(t[:k]))
        total += min(k, len(t))
    return hits / total if total else float("nan")


def main() -> None:
    from util_gis_spark import datasets as D
    from util_gis_spark.operators.ann import ann_ivf_topk, ann_lsh_topk
    from util_gis_spark.session import get_spark

    spark = get_spark("ann-recall", master="local[8]", shuffle_partitions=8)
    emb = D.load(spark, SF, "embeddings")
    truth = exact_truth(k=3)

    def collect(df) -> dict[int, list[int]]:
        out: dict[int, list[tuple]] = {}
        for r in df.collect():
            out.setdefault(int(r["probe_id"]), []).append(
                (-float(r["cos_sim"]), int(r["neighbor_id"]))
            )
        return {p: [nid for _, nid in sorted(v)] for p, v in out.items()}

    from util_gis_spark.operators.ann import N_PLANES, N_TABLES

    rows = []
    lsh = collect(ann_lsh_topk(emb))
    rows.append(
        (f"LSH ({N_TABLES} tables x {N_PLANES} bits)", recall(lsh, truth, 1), recall(lsh, truth, 3))
    )
    for nprobe in (1, 3, 5):
        ivf = collect(ann_ivf_topk(emb, nprobe=nprobe))
        rows.append((f"IVF nprobe={nprobe}", recall(ivf, truth, 1), recall(ivf, truth, 3)))

    print(f"ANN recall vs independent numpy exact truth ({SF}, {len(truth)} probes)\n")
    print("| path | recall@1 | recall@3 |")
    print("|---|---|---|")
    for name, r1, r3 in rows:
        print(f"| {name} | {r1:.3f} | {r3:.3f} |")


if __name__ == "__main__":
    main()
