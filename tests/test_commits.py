"""Commit points / snapshots / replication (IndexCommit +
SnapshotDeletionPolicy + Replicator analogs, index/commits.py)."""

import os

import numpy as np
import pytest


@pytest.fixture()
def index_view(documents_index, tmp_path):
    """Private symlink view of the session index so sidecar writes and
    commits don't pollute the shared fixture."""
    src, _m = documents_index
    path = str(tmp_path / "idx")
    os.mkdir(path)
    for name in os.listdir(src):
        os.symlink(os.path.join(src, name), os.path.join(path, name))
    return path


def test_commit_point_is_point_in_time(index_view):
    """A snapshot taken before a delete must NOT see the delete; the live
    index must (SnapshotDeletionPolicy semantics)."""
    from lucenenet_ray.index.commits import commit, list_commits, open_commit
    from lucenenet_ray.index.deletes import delete_documents
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    q = parse_query("vector dup data")
    before = search(IndexReader(index_view), q, k=20)

    g0 = commit(index_view, user_data={"label": "pre-delete"})
    delete_documents(os.path.join(index_view, "deletes"), ["dup"])
    g1 = commit(index_view)
    assert list_commits(index_view) == [g0, g1]

    at_g0 = search(open_commit(index_view, g0), q, k=20)
    assert np.array_equal(at_g0.docs, before.docs)
    assert np.array_equal(at_g0.scores, before.scores)

    live = search(IndexReader(index_view), q, k=20)
    at_g1 = search(open_commit(index_view, g1), q, k=20)
    assert live.total_hits < before.total_hits
    assert np.array_equal(at_g1.docs, live.docs)
    assert np.array_equal(at_g1.scores, live.scores)


def test_commit_user_data_and_release(index_view):
    from lucenenet_ray.index.commits import (
        commit,
        commit_info,
        list_commits,
        open_commit,
        release_commit,
    )

    g0 = commit(index_view, user_data={"writer": "test", "seq": 1})
    assert commit_info(index_view, g0)["user_data"]["seq"] == 1
    assert len(commit_info(index_view, g0)["files"]) > 0

    release_commit(index_view, g0)
    assert list_commits(index_view) == []
    with pytest.raises(FileNotFoundError):
        open_commit(index_view, g0)
    # generations keep advancing after a release (Lucene gens are monotonic)
    assert commit(index_view) == g0 + 1


def test_replicate_standalone(index_view, tmp_path):
    """A replicated commit opens standalone, returns identical results, and
    its sidecar logs are independent of the source (Replicator checkout)."""
    from lucenenet_ray.index.commits import commit, replicate
    from lucenenet_ray.index.deletes import delete_documents
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    g = commit(index_view)
    target = str(tmp_path / "replica")
    info = replicate(index_view, g, target)
    assert info["generation"] == g

    q = parse_query('"batch merge" vector')
    a = search(IndexReader(index_view), q, k=15)
    b = search(IndexReader(target), q, k=15)
    assert np.array_equal(a.docs, b.docs)
    assert np.array_equal(a.scores, b.scores)

    # replica-local delete must not leak back to the source
    delete_documents(os.path.join(target, "deletes"), ["vector"])
    b2 = search(IndexReader(target), q, k=15)
    a2 = search(IndexReader(index_view), q, k=15)
    assert b2.total_hits < b.total_hits
    assert a2.total_hits == a.total_hits


def test_commit_preserves_docvalues(index_view, tmp_path):
    """A snapshot must capture the BASE docvalues directory, not just the
    update log — otherwise open_commit resolves updates over a zeroed base
    (the missing-file fallback) and dv sorts at a commit are silently wrong
    (round-2 ADVICE, commits.py _SNAPSHOT_ENTRIES)."""
    from lucenenet_ray.index.commits import commit, open_commit, replicate
    from lucenenet_ray.index.docvalues import update_numeric_docvalue
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search_sorted_by_docvalue

    q = TermQuery(term="spark")
    want = search_sorted_by_docvalue(
        IndexReader(index_view), q, "n_chars", k=15, reverse=True)

    g = commit(index_view)
    r = open_commit(index_view, g)
    # base values must be non-trivial — guards against the zeroed fallback
    assert max(int(r.numeric_docvalues(b, "n_chars").max())
               for b in r.bucket_ids) > 0
    got = search_sorted_by_docvalue(r, q, "n_chars", k=15, reverse=True)
    assert got == want

    # a replica checkout carries the base docvalues too
    target = str(tmp_path / "replica_dv")
    replicate(index_view, g, target)
    got2 = search_sorted_by_docvalue(
        IndexReader(target), q, "n_chars", k=15, reverse=True)
    assert got2 == want

    # dv updates AFTER the commit stay invisible to the snapshot
    update_numeric_docvalue(
        os.path.join(index_view, "dv_updates"), "spark", "n_chars", 0)
    live = search_sorted_by_docvalue(
        IndexReader(index_view), q, "n_chars", k=15, reverse=True)
    assert live != want  # the update changed the live ordering/values
    still = search_sorted_by_docvalue(
        open_commit(index_view, g), q, "n_chars", k=15, reverse=True)
    assert still == want


def test_commit_survives_live_rewrite(index_view):
    """Replacing a live file (the rebuild/expunge path uses temp+rename)
    must not corrupt an existing snapshot — the hardlink keeps the old
    inode (IndexFileDeleter refcount analog)."""
    import json

    from lucenenet_ray.index.commits import commit, open_commit
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    q = parse_query("spark window")
    before = search(IndexReader(index_view), q, k=10)
    g = commit(index_view)

    # simulate a live manifest rewrite (same temp+rename discipline);
    # the view's manifest is a symlink, so materialize a real file first
    mpath = os.path.join(index_view, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    os.unlink(mpath)
    m["n_docs"] = 1  # clearly-wrong live manifest
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, mpath)

    assert IndexReader(index_view).num_docs == 1  # live sees the rewrite
    r = open_commit(index_view, g)
    assert r.num_docs > 1  # snapshot kept the old inode
    after = search(r, q, k=10)
    assert np.array_equal(after.docs, before.docs)
    assert np.array_equal(after.scores, before.scores)
