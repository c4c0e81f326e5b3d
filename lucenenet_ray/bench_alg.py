"""Benchmark-module .alg driver (``Lucene.Net.Benchmark`` analog).

The reference's ``Benchmark.Exec(alg)`` entry point (``ByTask/
Benchmark.cs:45-104``, SURVEY §3.3) re-expressed for the Ray engine: an
``.alg`` algorithm — property lines plus a task sequence — drives index
build and search tasks over shared run state (the PerfRunData analog),
and every task logs (count, elapsed) reported as the reference's
rec/s table (``ByTask/Tasks/ReportTask.cs:62-63``).

Supported subset of the .alg grammar (TestPerfTasksLogic.cs shapes):

    key = value                  # properties (docs.file, query, work.dir)
    ResetSystemErase             # wipe the work dir
    CreateIndex                  # open a build session
    { AddDoc } : N               # queue N docs from the content source
    CloseIndex                   # run the distributed build (see below)
    OpenReader / CloseReader
    { Search } : N               # repeat the configured query N times
    RepSumByName                 # print the report table

Semantic note: the reference's AddDoc writes through a live IndexWriter;
this engine's writer is the batch Ray pipeline (SURVEY §2.3 — DWPT
analog), so AddDoc tasks ACCUMULATE the doc ids and ``CloseIndex``
triggers the one distributed build over exactly those rows.  Timing
therefore attributes tokenize+invert+merge to CloseIndex, like a giant
commit.  Content source = the documents parquet (rows cycled when N
exceeds the corpus), the TrecContentSource/DocMaker role.
"""

from __future__ import annotations

import os
import re
import shutil
import time
from dataclasses import dataclass, field


@dataclass
class TaskStat:
    name: str
    runs: int = 0
    records: int = 0
    elapsed: float = 0.0


@dataclass
class RunData:
    """PerfRunData analog: shared state across tasks."""

    props: dict[str, str] = field(default_factory=dict)
    pending_docs: int = 0
    index_open: bool = False
    reader = None
    stats: dict[str, TaskStat] = field(default_factory=dict)

    def stat(self, name: str) -> TaskStat:
        return self.stats.setdefault(name, TaskStat(name))


_SEQ = re.compile(r"^\{\s*(\w+)(?:\(([^)]*)\))?\s*\}\s*:\s*(\d+)$")
_PROP = re.compile(r"^([\w.]+)\s*=\s*(.*)$")
_BARE = re.compile(r"^(\w+)(?:\(([^)]*)\))?$")


def run_algorithm(lines: list[str], sf_dir: str = "/root/testdata/sf0.001",
                  work_dir: str = "/tmp/lucenenet_ray_alg") -> list[dict]:
    """Execute the algorithm; returns the report rows (RepSumByName)."""
    rd_ = RunData()
    rd_.props["docs.file"] = os.path.join(sf_dir, "documents.parquet")
    rd_.props["work.dir"] = work_dir
    rd_.props["query"] = "spark window"
    report: list[dict] = []
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _PROP.match(line)
        if m and "{" not in line:
            rd_.props[m.group(1)] = m.group(2).strip()
            continue
        m = _SEQ.match(line)
        if m:
            _run_task(rd_, m.group(1), m.group(2), int(m.group(3)), report)
            continue
        m = _BARE.match(line)
        if m:
            _run_task(rd_, m.group(1), m.group(2), 1, report)
            continue
        raise ValueError(f"alg: cannot parse line: {raw!r}")
    return report


def _run_task(rd_: RunData, name: str, arg: str | None, reps: int,
              report: list[dict]) -> None:
    t0 = time.time()
    records = reps
    if name == "ResetSystemErase":
        shutil.rmtree(rd_.props["work.dir"], ignore_errors=True)
    elif name == "CreateIndex":
        rd_.pending_docs = 0
        rd_.index_open = True
    elif name == "AddDoc":
        if not rd_.index_open:
            raise RuntimeError("AddDoc before CreateIndex")
        rd_.pending_docs += reps
    elif name == "CloseIndex":
        records = rd_.pending_docs
        _build(rd_)
        rd_.index_open = False
    elif name == "OpenReader":
        from lucenenet_ray.search.reader import IndexReader

        rd_.reader = IndexReader(os.path.join(rd_.props["work.dir"],
                                              "index"))
    elif name == "CloseReader":
        rd_.reader = None
    elif name in ("Search", "CountingSearchTest"):
        from lucenenet_ray.search.query import parse_query
        from lucenenet_ray.search.searcher import search

        if rd_.reader is None:
            raise RuntimeError("Search before OpenReader")
        q = parse_query(rd_.props["query"])
        for _ in range(reps):
            search(rd_.reader, q, k=10)
    elif name == "RepSumByName":
        for st in rd_.stats.values():
            rate = st.records / st.elapsed if st.elapsed > 0 else 0.0
            report.append({"op": st.name, "runs": st.runs,
                           "records": st.records,
                           "rec_per_s": round(rate, 1),
                           "elapsed_sec": round(st.elapsed, 3)})
        return
    else:
        raise ValueError(f"alg: unknown task {name}")
    st = rd_.stat(name)
    st.runs += 1
    st.records += records
    st.elapsed += time.time() - t0


def _build(rd_: RunData) -> None:
    import pyarrow.parquet as pq
    import ray.data as rd_data

    from lucenenet_ray.index.build import IndexConfig, build_index

    src = rd_.props["docs.file"]
    n_src = pq.read_metadata(src).num_rows
    n = rd_.pending_docs
    # content source cycles when the task asks for more docs than the
    # corpus has (DocMaker forever-looping content source)
    n = min(n, n_src)
    ds = rd_data.read_parquet(src, columns=["doc_id", "text"]) \
                .filter(expr=f"doc_id < {n}")
    cfg = IndexConfig(index_path=os.path.join(rd_.props["work.dir"],
                                              "index"),
                      id_min=0, id_max=max(n - 1, 1), n_buckets=4)
    build_index(ds, cfg)


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="lucenenet_ray.bench_alg")
    p.add_argument("alg_file")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = p.parse_args(argv)
    with open(args.alg_file) as f:
        lines = f.read().splitlines()
    rows = run_algorithm(lines, sf_dir=args.sf_dir)
    print(f"{'Operation':<22}{'runCnt':>8}{'records':>10}"
          f"{'rec/s':>12}{'elapsedSec':>12}")
    for r in rows:
        print(f"{r['op']:<22}{r['runs']:>8}{r['records']:>10}"
              f"{r['rec_per_s']:>12}{r['elapsed_sec']:>12}")
    return 0


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        rc = main()
    finally:
        ray.shutdown()
    raise SystemExit(rc)
