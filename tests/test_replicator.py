"""Push replication (Lucene.Net.Replicator LocalReplicator +
ReplicationClient analogs, index/replicator.py): publish→wake semantics,
checkout swap, replica search identity."""

import os

import pytest


@pytest.fixture()
def index_view(documents_index, tmp_path):
    src, _m = documents_index
    path = str(tmp_path / "idx")
    os.mkdir(path)
    for name in os.listdir(src):
        os.symlink(os.path.join(src, name), os.path.join(path, name))
    return path


def _source_hits(index_path, gen, terms):
    from lucenenet_ray.index.commits import open_commit
    from lucenenet_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )
    from lucenenet_ray.search.searcher import search

    q = BooleanQuery(clauses=tuple(
        BooleanClause(Occur.SHOULD, TermQuery(term=t)) for t in terms))
    return search(open_commit(index_path, gen), q, k=10).to_list()


def test_publish_subscribe_cycle(ray_session, index_view, tmp_path):
    """Publish gen0 → replica serves it; delete + publish gen1 → replica
    converges and its ranked hits bit-match a source-side snapshot search
    at each generation."""
    from lucenenet_ray.index.deletes import delete_documents
    from lucenenet_ray.index.replicator import (
        ReplicaNode,
        ReplicationHub,
        publish_commit,
    )

    hub = ReplicationHub.remote(index_view)
    import ray

    assert ray.get(hub.current.remote()) == -1
    replica = ReplicaNode.remote(hub, str(tmp_path / "replica"))

    g0 = publish_commit(hub, index_view, {"label": "initial"})
    assert ray.get(replica.sync_once.remote(30.0)) == g0
    terms = ["spark", "window"]
    assert ray.get(replica.search_terms.remote(terms)) == \
        _source_hits(index_view, g0, terms)

    delete_documents(os.path.join(index_view, "deletes"), ["dup"])
    g1 = publish_commit(hub, index_view)
    assert g1 > g0
    assert ray.get(replica.sync_once.remote(30.0)) == g1
    assert ray.get(replica.serving_generation.remote()) == g1
    got = ray.get(replica.search_terms.remote(["dup"]))
    assert got == _source_hits(index_view, g1, ["dup"])
    # the delete is visible at the replica (post-delete ranked set)
    assert got != _source_hits(index_view, g0, ["dup"])


def test_push_wakes_parked_subscriber(ray_session, index_view, tmp_path):
    """A replica parked in sync_once is woken BY the publish (push), not by
    polling: the sync future resolves only after publish_commit runs."""
    import time

    import ray

    from lucenenet_ray.index.replicator import (
        ReplicaNode,
        ReplicationHub,
        publish_commit,
    )

    hub = ReplicationHub.remote(index_view)
    replica = ReplicaNode.remote(hub, str(tmp_path / "replica"))
    fut = replica.sync_once.remote(60.0)  # parks: nothing published yet
    ready, _ = ray.wait([fut], timeout=1.0)
    assert not ready  # still parked — no busy poll returned early
    g0 = publish_commit(hub, index_view)
    t0 = time.perf_counter()
    assert ray.get(fut, timeout=30) == g0  # woken by the publish
    assert time.perf_counter() - t0 < 10


def test_sync_timeout_keeps_serving_generation(ray_session, index_view,
                                               tmp_path):
    import ray

    from lucenenet_ray.index.replicator import (
        ReplicaNode,
        ReplicationHub,
        publish_commit,
    )

    hub = ReplicationHub.remote(index_view)
    replica = ReplicaNode.remote(hub, str(tmp_path / "replica"))
    g0 = publish_commit(hub, index_view)
    assert ray.get(replica.sync_once.remote(30.0)) == g0
    # no new publish: a short-timeout sync returns the same generation and
    # the replica keeps serving
    assert ray.get(replica.sync_once.remote(0.2)) == g0
    assert ray.get(replica.search_terms.remote(["spark"]))


def test_stale_publish_ignored(ray_session, index_view):
    import ray

    from lucenenet_ray.index.replicator import (
        ReplicationHub,
        publish_commit,
    )

    hub = ReplicationHub.remote(index_view)
    g0 = publish_commit(hub, index_view)
    assert ray.get(hub.publish.remote(g0 - 5)) == g0  # stale ignored
    assert ray.get(hub.current.remote()) == g0


def test_commit_captures_termvectors(index_view):
    """A commit snapshot must carry the termvectors/ sidecar so replicas
    and open_commit readers can serve stored vectors (same invariant as
    the docvalues capture)."""
    from lucenenet_ray.index.commits import commit, open_commit

    g = commit(index_view)
    r = open_commit(index_view, g)
    tv = r.term_vector(0)
    assert tv is not None and tv.num_rows > 0
