"""Rotation-READY driver rows: queries whose oracle is already built
and gate-verified here with the driver's exact type-aware compare, but
which are NOT yet in the 50-key catalogue (the artifact caps at 50, so
they queue for the r7 rotation — the same staging the retired rows use
in reverse)."""

import os

import pytest

from scripts.check_correctness import SF, compare_one, open_oracle

READY = [
    "gps_density_sampling",
    "gps_parking_windows",
    "gps_safe_buffer",
    "gps_dyn_eps",
    "gps_polygon_range_points",
    "wkt_parse_repair",
    "stream_sessions",
    "wkt_sink",
    "gps_dp_sampling",
    "accumulated_union",
]


@pytest.mark.skipif(not os.path.isdir(SF), reason="gate SF dir missing")
@pytest.mark.parametrize("name", READY)
def test_rotation_ready_row_matches_oracle(spark, name):
    from util_gis_spark import queries as Q

    qfn = getattr(Q, f"q_{name}")
    sql = Q.oracles()[name]
    con = open_oracle(SF)
    ok, detail = compare_one(spark, con, name, qfn, sql)
    assert ok, f"{name}: {detail}"


def test_ready_rows_not_yet_in_catalogue():
    from util_gis_spark import queries as Q

    cat = set(Q.catalogue())
    assert len(cat) == 50
    for name in READY:
        assert name not in cat and name in Q.oracles()
