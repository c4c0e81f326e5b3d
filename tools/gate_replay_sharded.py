"""Full-registry gate replay, sharded into fresh processes.

Long single-session replays (300+ queries → ~900 Datasets in one Ray
session) can die on a Ray-internal ``task_manager.cc:930`` check failure
(observed twice on 2.49.2). This wrapper splits the registry into chunks,
runs ``tools/gate_check.py`` per chunk in a FRESH interpreter + Ray
session, and merges the per-chunk JSON artifacts into one replay file.

Usage: python tools/gate_replay_sharded.py [sf_dir] [chunk_size] [out.json]
"""

import json
import os

import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_names() -> list[str]:
    """Full registry order (incl. dynamically-registered bm25_* entries)
    via a throwaway interpreter — importing __ray_entry__ does not start
    a Ray session."""
    code = ("import sys; sys.path.insert(0, {!r}); "
            "import __ray_entry__ as E; "
            "print('\\n'.join(E.queries().keys()))").format(REPO)
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, check=True).stdout
    return [ln for ln in out.splitlines() if ln.strip()]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else f"/tmp/gate_replay_sharded_{os.path.basename(sf)}.json")
    names = registry_names()
    print(f"{len(names)} queries, chunks of {chunk}")
    merged: dict = {}
    failures: list[str] = []
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        part_out = f"/tmp/gate_chunk_{i}.json"
        env = dict(os.environ, GATE_REPLAY_OUT=part_out)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gate_check.py"),
             sf, ",".join(part)],
            env=env, cwd=REPO, capture_output=True, text=True)
        tail = "\n".join(r.stdout.splitlines()[-3:])
        print(f"chunk {i}-{i + len(part) - 1}: rc={r.returncode}\n{tail}")
        if os.path.exists(part_out):
            d = json.load(open(part_out))
            merged.update(d["results"])
            failures.extend(d["failures"])
        else:
            failures.extend(part)
            merged.update({n: {"err": "chunk crashed before writing"}
                           for n in part if n not in merged})
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf, "n_queries": len(merged),
                   "n_failures": len(failures), "failures": failures,
                   "results": merged, "sharded": True}, f,
                  indent=1, sort_keys=True)
    print(f"{'ALL GREEN' if not failures else 'FAILURES: ' + ','.join(failures)}")
    print(f"merged replay written to {out_path} ({len(merged)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
