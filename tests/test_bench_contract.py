"""Driver-contract guards for bench.py: every benched name must resolve in
the registry (a typo fails at the driver's timed run otherwise), and the
headline record must stay a compact single line well under stdout-tail
capture limits (the r2 record was truncated by a fat line)."""

from __future__ import annotations

import json


def test_bench_names_resolve():
    import bench
    from seoul_big_data_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE + bench.EXTENDED if n not in QUERIES]
    assert not missing, missing
    assert len(set(bench.HEADLINE) & set(bench.EXTENDED)) == 0


def test_bench_headline_record_is_compact():
    import bench

    # worst-case serialized size of the final stdout line: metric + value +
    # per-query float timings; must stay far below tail-capture limits
    fake = {
        "metric": "headline_suite_seconds",
        "value": 12345.678,
        "unit": "sec",
        "queries": {n: 123.456 for n in bench.HEADLINE},
        "sf": 0.1,
    }
    line = json.dumps(fake)
    assert "\n" not in line
    assert len(line) < 4096, len(line)


def test_load_prev_round_skips_unparseable(tmp_path, monkeypatch):
    """_load_prev_round must fall back to the latest PARSEABLE round record
    (r2's was truncated mid-line) and read extended timings from the side
    file when present."""
    import bench

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 1.5}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": None, "tail": '{"metric": "headline_su'})
    )
    (tmp_path / "bench_extended.json").write_text(
        json.dumps({"extended": {"q_x": 2.5}})
    )
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _: str(tmp_path)
    )
    head, ext = bench._load_prev_round()
    assert head == {"q_a": 1.5}
    assert ext == {"q_x": 2.5}
