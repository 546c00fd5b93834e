"""Driver-gate replica for the retired 51st query.

The round driver's correctness artifact records exactly the first 50
catalogue keys (VERDICT r3 "Next round" #1), so embed_label_centroids is
kept out of the catalogue; this test applies the SAME compare the driver
uses (sorted columns, sorted rows, 6-dp rounding) at the driver's sf0.01
so the query keeps a hard oracle-backed signal.
"""

import os

import duckdb
import pytest

SF_GATE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.skipif(not os.path.isdir(SF_GATE), reason="gate SF dir missing")
def test_embed_label_centroids_matches_duckdb_oracle(spark):
    from util_gis_spark.queries import EMBED_LABEL_CENTROIDS_SQL, q_embed_label_centroids

    sdf = q_embed_label_centroids(spark, SF_GATE).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_GATE}/embeddings.parquet')"
    )
    odf = con.execute(EMBED_LABEL_CENTROIDS_SQL).df()

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).round(6).reset_index(drop=True)
    o = odf[cols].sort_values(cols).round(6).reset_index(drop=True)
    o = o.astype(s.dtypes.to_dict())
    assert len(s) == len(o) and len(s) > 0
    assert s.equals(o)
