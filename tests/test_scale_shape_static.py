"""Static scale-shape guards: invariants the r3 VERDICT verified by
inspection, pinned so regressions fail CI instead of a judge pass.

- no ``batch_format="pandas"`` in engine hot paths (zero-copy Arrow
  batches only; pandas is allowed in gate wrappers/driver-side tables),
- no per-row ``Dataset.filter(lambda ...)`` / ``iter_rows`` in ops,
- no ``take_all()`` inside ops modules (ops return Datasets or bounded
  partials; only __ray_entry__ gate wrappers and util.tables materialize
  — the r3 finding #5 contract).
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "lucenenet_ray")


def _sources(*subdirs):
    for sub in subdirs:
        base = os.path.join(PKG, sub)
        for root, _dirs, files in os.walk(base):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    yield p, open(p, encoding="utf-8").read()


def test_no_pandas_batches_in_hot_paths():
    """batch_format="pandas" requires an adjacent `# pandas-kernel:`
    justification (e.g. merge_asof) — zero-copy Arrow otherwise."""
    bad = []
    for p, src in _sources("index", "search", "ops", "pipelines",
                           "analysis", "extract", "sources"):
        lines = src.splitlines()
        for i, ln in enumerate(lines):
            if "batch_format=\"pandas\"" in ln or \
                    "batch_format='pandas'" in ln:
                ctx = "\n".join(lines[max(0, i - 3):i + 1])
                if "pandas-kernel:" not in ctx:
                    bad.append((p, i + 1))
    assert bad == [], bad


def test_no_per_row_dataset_access_in_ops():
    pat = re.compile(r"\.filter\(\s*lambda\s+row|\.iter_rows\(")
    bad = [(p, m.group(0))
           for p, src in _sources("ops", "pipelines", "index", "search")
           for m in [pat.search(src)] if m]
    assert bad == [], bad


def test_no_driver_materialization_in_ops():
    """Every .take_all() in ops/ must carry an adjacent
    `# bounded-collect:` justification (k-scale / strata-scale rows) —
    corpus-scale materialization belongs to gate wrappers only (the
    r3 finding #5 contract; substrdedup/decontaminate now stream)."""
    bad = []
    for p, src in _sources("ops", "pipelines"):
        lines = src.splitlines()
        for i, ln in enumerate(lines):
            if ".take_all()" in ln:
                ctx = "\n".join(lines[max(0, i - 2):i + 1])
                if "bounded-collect:" not in ctx:
                    bad.append((p, i + 1))
    assert bad == [], bad
