"""Benchmark .alg driver (lucenenet_ray/bench_alg.py — Benchmark.Exec
analog over the TestPerfTasksLogic.cs line shapes)."""

import pytest


def test_basic_algorithm(ray_session, tmp_path):
    from lucenenet_ray.bench_alg import run_algorithm

    lines = [
        "# comment line",
        "query = spark window",
        "ResetSystemErase",
        "CreateIndex",
        "{ AddDoc } : 200",
        "CloseIndex",
        "OpenReader",
        "{ CountingSearchTest } : 5",
        "CloseReader",
        "RepSumByName",
    ]
    rows = run_algorithm(lines, work_dir=str(tmp_path / "alg"))
    ops = {r["op"]: r for r in rows}
    assert ops["AddDoc"]["records"] == 200
    assert ops["CloseIndex"]["records"] == 200  # the build commits them
    assert ops["CountingSearchTest"]["records"] == 5
    assert ops["CloseIndex"]["elapsed_sec"] > 0


def test_search_before_reader_fails(ray_session, tmp_path):
    from lucenenet_ray.bench_alg import run_algorithm

    with pytest.raises(RuntimeError):
        run_algorithm(["{ Search } : 1"], work_dir=str(tmp_path / "a"))


def test_unknown_task_rejected(tmp_path):
    from lucenenet_ray.bench_alg import run_algorithm

    with pytest.raises(ValueError):
        run_algorithm(["FrobnicateIndex"], work_dir=str(tmp_path / "a"))
