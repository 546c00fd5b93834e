"""Quiet A/B of the two ann_ivf_topk probe transports (round 6): the
r6 sc.broadcast transport regressed the ann_ivf_gen bench row ~11 s ->
125+ s because every call ships a FRESH Python broadcast (new id, never
warm) and cold distribution to 32 local workers costs ~30-45 s. This
measures both transports interleaved (min-of-reps) on the clustered
generated corpus with the bench row's fixed 500-probe set and prints
one JSON line, so the join-default decision has a recorded answer and
future rounds can re-check it if the worker pool or broadcast path
changes. Row counts must match — the transports are parity-locked.

r7: the "closure" transport (fused assign+score kernel, matrices in
the task closure) joins the interleave — it is the new default, so the
decision record must carry all three.

Usage: python scripts/bench_ivf_transport.py [n_vecs=20000] [reps=3] [transports=closure,join,broadcast]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from util_gis_spark import datasets as D  # noqa: E402
from util_gis_spark.operators.ann import ann_ivf_topk  # noqa: E402
from util_gis_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    transports = tuple(
        sys.argv[3].split(",") if len(sys.argv) > 3 else ("closure", "join", "broadcast")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ivf-transport", master=f"local[{cpus}]", shuffle_partitions=cpus)
    emb = D.embeddings_range(spark, n_vecs, cpus)
    probe_filter = f"vec_id % {max(n_vecs // 500, 1)} = 0"

    # warm up Python workers + Arrow untimed (both transports share
    # the default kernel assignment plan)
    ann_ivf_topk(D.embeddings_range(spark, 2000, 4)).count()

    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    loads = [round(os.getloadavg()[0], 2)]
    for _ in range(reps):  # interleaved so co-tenant noise hits all
        for transport in transports:
            t0 = time.perf_counter()
            out = ann_ivf_topk(emb, probe_filter=probe_filter, probe_transport=transport)
            rows[transport] = out.count()
            el = time.perf_counter() - t0
            if transport == "broadcast":
                out.probes_bc.destroy()
            best[transport] = min(best.get(transport, 1e9), el)
        # enforce the stated parity contract — a timing comparison of
        # transports that computed different results is meaningless
        assert len(set(rows.values())) == 1, f"transport row counts diverged: {rows}"
        loads.append(round(os.getloadavg()[0], 2))
    print(
        json.dumps(
            {
                "n_vecs": n_vecs,
                "reps": reps,
                "loadavg": loads,
                **{f"{t}_sec": round(best[t], 3) for t in transports},
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
