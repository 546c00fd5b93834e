"""Quiet A/B of the two ann_ivf_topk corpus-assignment transports
(round 6): the literal greatest() expression (all-JVM codegen; pays a
one-time Janino compile that grows with lists x dim) vs the Arrow
argmax kernel (`_assign_kernel`, the large-quantizer scale path).
Measures BOTH the first call (compile / plan cost included) and the
interleaved warm min-of-reps at the proven small quantizer size, and
the kernel ALONE at a large size — the expression form is NOT run
there: at 300 lists x 64 dims its Janino compile OOM'd the 48 GiB
driver even on a 1,000-vector corpus (measured round 6; that cliff is
why _ASSIGN_EXPR_MAX_TERMS exists and why "auto" switches). Prints one
JSON line. Row counts must match where both run — the transports are
parity-locked (tests/test_operators_spark.py::TestAnnIvf pins
bit-identical rows).

Usage: python scripts/bench_assign_transport.py [n_vecs=20000] [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from util_gis_spark import datasets as D  # noqa: E402
from util_gis_spark.operators.ann import _ASSIGN_EXPR_MAX_TERMS, ann_ivf_topk  # noqa: E402
from util_gis_spark.session import get_spark  # noqa: E402


def synth_centroids(n_lists: int, dim: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    out = []
    for j in range(n_lists):
        c = rng.standard_normal(dim)
        out.append((j, (c / np.linalg.norm(c)).tolist()))
    return out


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("assign-transport", master=f"local[{cpus}]", shuffle_partitions=cpus)
    emb = D.embeddings_range(spark, n_vecs, cpus).persist()
    dim = len(emb.select("embedding").first()["embedding"])
    probe_filter = f"vec_id % {max(n_vecs // 500, 1)} = 0"

    # warm Python workers + Arrow untimed (shared by both forms)
    emb.limit(256).toPandas()

    result: dict = {"n_vecs": n_vecs, "dim": dim, "reps": reps}
    loads = [round(os.getloadavg()[0], 2)]
    for n_lists in (25, _ASSIGN_EXPR_MAX_TERMS // dim + 44):
        cents = synth_centroids(n_lists, dim)
        samples: dict[str, list[float]] = {"expr": [], "kernel": []}
        rows: dict[str, int] = {}
        # past the terms cap the expression form is the measured OOM
        # cliff this script documents — never build it there
        run_expr = n_lists * dim <= _ASSIGN_EXPR_MAX_TERMS
        for r in range(reps):
            for transport in ("expr", "kernel"):
                if transport == "expr" and not run_expr:
                    continue
                t0 = time.perf_counter()
                out = ann_ivf_topk(
                    emb,
                    probe_filter=probe_filter,
                    centroids=cents,
                    nprobe=3,
                    assign_transport=transport,
                )
                rows[transport] = out.count()
                samples[transport].append(time.perf_counter() - t0)
            assert len(set(rows.values())) == 1, f"assign row counts diverged: {rows}"
            loads.append(round(os.getloadavg()[0], 2))
        entry = {
            "kernel_cold_sec": round(samples["kernel"][0], 3),
            "kernel_warm_sec": round(min(samples["kernel"][1:] or samples["kernel"]), 3),
            "rows": rows["kernel"],
        }
        if samples["expr"]:
            entry["expr_cold_sec"] = round(samples["expr"][0], 3)
            if len(samples["expr"]) > 1:  # only a real warm sample earns the label
                entry["expr_warm_sec"] = round(min(samples["expr"][1:]), 3)
        else:
            entry["expr_sec"] = "refused: lists*dim past _ASSIGN_EXPR_MAX_TERMS (OOM cliff)"
        result[f"lists_{n_lists}"] = entry
    result["loadavg"] = loads
    print(json.dumps(result))


if __name__ == "__main__":
    main()
