"""The driver captures only a tail window of bench.py stdout; r5's
single long JSON line was truncated mid-number and the round artifact
recorded parsed:null. The contract now: the FINAL stdout line is a
short headline dict that always parses and stays well under 1 KB
regardless of how many detail rows the full dict grows."""

import json

import bench


def _representative_full():
    # sized like a worst-case real run: many timing rows, counts,
    # ladder dicts, a populated quality section.
    timings = {f"some_longish_query_name_{i}": 123.456 for i in range(60)}
    counts = {k: 123456789 for k in timings}
    return {
        "metric": "spatial_join_tile_assign_sec",
        "value": 1.234,
        "unit": "sec",
        "queries": timings,
        "sf": "0.1",
        "n_images": 2400400,
        "images_per_sec": 1234567.8,
        "cpus": 32,
        "image_factor": 400,
        "n_docs_gen": 50000,
        "row_counts": counts,
        "loadavg": {"start": 3.38, "headline_head": 4.07, "headline_tail": 27.57},
        "scale_slope_10x_overhead_incl": {k: 1.23 for k in list(timings)[:5]},
        "scale_throughput_ratio_10x": {k: 9.87 for k in list(timings)[:5]},
        "quality": {
            "ann_recall_at1": 0.95,
            "ann_cand_frac": 0.061,
            "ann_config": "16x6bits_mp1",
            "goldens_independent": "pass",
            "scaling_efficiency_min": 0.839,
            "scaling_n_images": 160000000,
            "scaling_measured_utc": "2026-08-17T07:00:00Z",
        },
    }


def test_headline_line_parses_and_is_short():
    line = json.dumps(bench.headline_line(_representative_full()))
    assert len(line) < 1024, f"headline line {len(line)} bytes, must stay <1 KB"
    parsed = json.loads(line)
    assert parsed["metric"] == "spatial_join_tile_assign_sec"
    assert parsed["value"] == 1.234
    assert parsed["unit"] == "sec"
    assert parsed["images_per_sec"] == 1234567.8
    assert parsed["loadavg"]["headline_tail"] == 27.57


def test_headline_line_never_carries_unbounded_dicts():
    # the failure mode was unbounded growth: new bench rows lengthening
    # the one stdout line. The headline line must not embed queries /
    # row_counts / quality wholesale.
    out = bench.headline_line(_representative_full())
    for k in ("queries", "row_counts", "quality", "scale_slope_10x_overhead_incl"):
        assert k not in out
