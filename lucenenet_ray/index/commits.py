"""Commit points, snapshots, and replication.

The IndexCommit / SnapshotDeletionPolicy / Replicator analog (reference
``src/Lucene.Net/Index/IndexCommit.cs``, ``SnapshotDeletionPolicy.cs:34-118``,
``Lucene.Net.Replicator/IndexReplicationHandler.cs``): a *commit point* is a
named, immutable, point-in-time view of the index — the exact file set a
reader would open — that survives later writes (tombstone appends, docvalues
updates, rebuilds).

Physical model: index files here are immutable parquet (a rebuild replaces
them atomically via temp+rename, never in place), so a commit point is a
generation-numbered directory of **hardlinks** under ``<index>/commits/`` —
zero data copied, and later ``os.replace`` on the live tree re-points the
live name while the snapshot keeps the old inode, exactly the protection
SnapshotDeletionPolicy gets by pinning ``segments_N`` against the deletion
policy. The snapshot directory mirrors the live layout, so *any* commit
point opens with the ordinary :class:`IndexReader` — the
``DirectoryReader.Open(IndexCommit)`` analog is just ``IndexReader(commit
dir)``.

At cluster scale the same scheme works on any store with cheap object
aliasing (hardlink on a shared POSIX fs; server-side copy / manifest
pinning on object stores): a commit is a manifest of immutable object
names, never a data copy.

``replicate`` materializes a commit as a standalone index directory — the
Replicator's publish/checkout flow for serving replicas (hardlinks when the
target is on the same device, real copies otherwise).
"""

from __future__ import annotations

import glob
import json
import os
import shutil


def _commits_dir(index_path: str) -> str:
    return os.path.join(index_path, "commits")


def _gen_dir(index_path: str, gen: int) -> str:
    return os.path.join(_commits_dir(index_path), f"gen-{gen:06d}")


# Live-tree entries captured by a commit. ``commits`` itself is excluded so
# snapshots never nest. ``docvalues`` (base per-doc numeric columns) must be
# captured alongside ``dv_updates`` — a snapshot holding only the update log
# would resolve updates over a zeroed base (BucketData.docvalues falls back
# to 0 for a missing file) and silently return wrong dv sorts at a commit.
_SNAPSHOT_ENTRIES = ("manifest.json", "norms", "postings", "termstats",
                     "deletes", "docvalues", "dv_updates", "termvectors",
                     "bloom")


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _snapshot_tree(src_root: str, dst_root: str) -> list[str]:
    """Hardlink-mirror the index layout; returns relative paths captured."""
    captured: list[str] = []
    for entry in _SNAPSHOT_ENTRIES:
        src = os.path.join(src_root, entry)
        if os.path.isfile(src):
            _link_or_copy(src, os.path.join(dst_root, entry))
            captured.append(entry)
        elif os.path.isdir(src):
            os.makedirs(os.path.join(dst_root, entry), exist_ok=True)
            for f in sorted(os.listdir(src)):
                sf = os.path.join(src, f)
                if os.path.isfile(sf) and not f.startswith("."):
                    _link_or_copy(sf, os.path.join(dst_root, entry, f))
                    captured.append(f"{entry}/{f}")
    return captured


def list_commits(index_path: str) -> list[int]:
    """Generations of all live commit points, ascending
    (DirectoryReader.ListCommits analog)."""
    return sorted(
        int(os.path.basename(d)[4:])
        for d in glob.glob(os.path.join(_commits_dir(index_path), "gen-*"))
        if os.path.isdir(d) and os.path.basename(d)[4:].isdigit()
    )


def commit(index_path: str, user_data: dict | None = None) -> int:
    """Snapshot the current commit point; returns its generation.

    IndexWriter.Commit + SnapshotDeletionPolicy.Snapshot in one step: the
    live tree is already durable (every writer uses temp+rename), so
    "commit" here means *pin* the current file set under a new generation.
    ``user_data`` is stored in the commit descriptor
    (IndexWriter.SetCommitData / IndexCommit.UserData analog).
    """
    # Generations are monotonic for the life of the index (Lucene's
    # SegmentInfos.Generation survives commit deletion), so the counter is
    # persisted separately from the live snapshot dirs — releasing every
    # snapshot must NOT reset numbering.
    counter_path = os.path.join(_commits_dir(index_path), "next_gen")
    os.makedirs(_commits_dir(index_path), exist_ok=True)
    while True:
        gens = list_commits(index_path)
        next_gen = 0
        if os.path.isfile(counter_path):
            with open(counter_path) as f:
                next_gen = int(f.read().strip() or 0)
        gen = max(next_gen, (gens[-1] + 1) if gens else 0)
        # Reserve the generation atomically: the .tmp staging dir doubles as
        # the lock (os.makedirs without exist_ok fails if another committer
        # holds it), and the counter is advanced BEFORE publish so a crash
        # or concurrent committer can never reuse a generation number.
        tmp = _gen_dir(index_path, gen) + ".tmp"
        try:
            os.makedirs(tmp)
        except FileExistsError:
            gen += 1  # another committer is staging this gen; retry above it
            with open(counter_path + ".tmp", "w") as f:
                f.write(str(gen))
            os.replace(counter_path + ".tmp", counter_path)
            continue
        break
    with open(counter_path + ".tmp", "w") as f:
        f.write(str(gen + 1))
    os.replace(counter_path + ".tmp", counter_path)
    files = _snapshot_tree(index_path, tmp)
    desc = {
        "generation": gen,
        "files": files,
        "user_data": user_data or {},
    }
    with open(os.path.join(tmp, "commit.json"), "w") as f:
        json.dump(desc, f, indent=1)
    os.replace(tmp, _gen_dir(index_path, gen))  # atomic publish
    return gen


def commit_info(index_path: str, gen: int) -> dict:
    """The commit descriptor (IndexCommit.UserData / FileNames analog)."""
    with open(os.path.join(_gen_dir(index_path, gen), "commit.json")) as f:
        return json.load(f)


def open_commit(index_path: str, gen: int):
    """Open a reader pinned to a commit point
    (``DirectoryReader.Open(IndexCommit)``, DirectoryReader.cs:52-76).
    Later tombstones / docvalues updates / rebuilds on the live index are
    invisible to this reader."""
    from lucenenet_ray.search.reader import IndexReader

    d = _gen_dir(index_path, gen)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no commit generation {gen} under {index_path}")
    return IndexReader(d)


def release_commit(index_path: str, gen: int) -> None:
    """Drop a snapshot so its files become reclaimable
    (SnapshotDeletionPolicy.Release, SnapshotDeletionPolicy.cs:94-118).
    Hardlinked inodes are freed once the live tree also stops referencing
    them — the IndexFileDeleter refcount model, provided by the filesystem."""
    shutil.rmtree(_gen_dir(index_path, gen), ignore_errors=True)


def replicate(index_path: str, gen: int, target_path: str) -> dict:
    """Materialize a commit point as a standalone index at ``target_path``
    (Replicator publish → client checkout,
    ``IndexReplicationHandler.cs:40-90``): the target opens with
    :class:`IndexReader` and owns its own sidecar logs from then on.
    Idempotent: an existing target is replaced atomically."""
    src = _gen_dir(index_path, gen)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no commit generation {gen} under {index_path}")
    tmp = target_path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    _snapshot_tree(src, tmp)
    # True swap: move the old target aside first so the target path never
    # ceases to exist — a concurrently opening reader sees old or new, never
    # a missing directory.
    old = target_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(target_path):
        os.rename(target_path, old)
    os.replace(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)
    return commit_info(index_path, gen)
