"""The LSH scale dial (VERDICT r5 "Next round" #4): n_tables /
n_planes / multiprobe are per-call parameters of ann_lsh_topk, not
module constants — "bits grows with log N" must be turnable by a user.
Defaults stay the measured 16x6 mp1 config, so the driver oracle row
is untouched; here the Spark path and the DuckDB twin are compared at
a NON-default config, and the probe_filter contract (narrow signature
columns only — ADVICE r5) is validated eagerly."""

import duckdb
import pytest

from util_gis_spark import datasets as D
from util_gis_spark.operators.ann import ann_lsh_topk, ann_lsh_topk_sql


def _oracle_rows(sf_dir, **kw):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    df = con.execute(ann_lsh_topk_sql(**kw)).df()
    return {
        (int(r.probe_id), int(r.neighbor_id), float(r.cos_sim))
        for r in df.itertuples()
    }


@pytest.mark.parametrize("cfg", [dict(n_tables=4, n_planes=8), dict(n_tables=8, n_planes=4, multiprobe=0)])
def test_lsh_dial_matches_twin_at_nondefault_config(spark, sf_dir, cfg):
    emb = D.load(spark, sf_dir, "embeddings")
    got = {
        (int(r["probe_id"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in ann_lsh_topk(emb, probe_filter="vec_id % 10 = 0", **cfg).collect()
    }
    want = _oracle_rows(sf_dir, probe_filter="vec_id % 10 = 0", **cfg)
    assert got == want and len(got) > 0


def test_dial_actually_changes_candidates(spark, sf_dir):
    """A coarser config (fewer planes) must not silently fall back to
    the default behavior: 2 planes x 2 tables collides nearly
    everything, 16x6 mp1 does not, so the neighbor sets differ."""
    emb = D.load(spark, sf_dir, "embeddings")
    coarse = ann_lsh_topk(emb, probe_filter="vec_id % 20 = 0", n_tables=2, n_planes=2)
    fine = ann_lsh_topk(emb, probe_filter="vec_id % 20 = 0")
    assert {tuple(r) for r in coarse.collect()} != {tuple(r) for r in fine.collect()}


def test_probe_filter_over_embedding_rejected_eagerly(spark, sf_dir):
    emb = D.load(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="probe_filter"):
        ann_lsh_topk(emb, probe_filter="size(v) = 64")
