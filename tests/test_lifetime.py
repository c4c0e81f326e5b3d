"""SearcherLifetimeManager + LiveFieldValues analogs
(Search/SearcherLifetimeManager.cs, Search/LiveFieldValues.cs)."""

import pyarrow as pa
import pytest

from lucenenet_ray.search.query import TermQuery, field_term


@pytest.fixture(scope="module")
def pk_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index

    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(["alpha beta", "beta gamma", "gamma delta",
                          "delta alpha"]),
        "pk": pa.array(["k0", "k1", "k2", "k3"]),
    })
    path = str(tmp_path_factory.mktemp("lt") / "idx")
    build_index(rd.from_arrow(t),
                IndexConfig(index_path=path, id_min=0, id_max=3,
                            n_buckets=2, n_hparts=1,
                            extra_fields=(("pk", "pk", False),)))
    return path, {"k0": "alpha beta", "k1": "beta gamma",
                  "k2": "gamma delta", "k3": "delta alpha"}


def test_lifetime_record_acquire_prune(pk_index, tmp_path):
    from lucenenet_ray.index.deletes import delete_documents
    from lucenenet_ray.search.lifetime import SearcherLifetimeManager
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, _ = pk_index
    clock = [0.0]
    mgr = SearcherLifetimeManager(clock=lambda: clock[0])

    r0 = IndexReader(path)
    tok0 = mgr.record(r0)
    assert mgr.record(r0) == tok0 and len(mgr) == 1

    # index changes (a delete log appears) -> new version, new token
    ddir = str(tmp_path / "del")
    delete_documents(ddir, ["gamma"])
    clock[0] = 10.0
    r1 = IndexReader(path, deletes_path=ddir)
    tok1 = mgr.record(r1)
    assert tok1 != tok0 and len(mgr) == 2

    # acquired token0 reader is the unchanged point-in-time view
    old = mgr.acquire(tok0)
    td_old = search(old, TermQuery(term="gamma"), k=10)
    assert sorted(td_old.docs.tolist()) == [1, 2]
    td_new = search(mgr.acquire(tok1), TermQuery(term="gamma"), k=10)
    assert td_new.docs.tolist() == []

    # prune by age drops only the stale entry
    clock[0] = 11.0
    assert mgr.prune(max_age_sec=5.0) == 1
    assert mgr.acquire(tok0) is None
    assert mgr.acquire(tok1) is old or mgr.acquire(tok1) is r1


def test_live_field_values(pk_index):
    from lucenenet_ray.search.lifetime import LiveFieldValues
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, stored = pk_index
    reader = IndexReader(path)

    def searcher_get(pk):
        td = search(reader, TermQuery(term=field_term("pk", pk)), k=1)
        if not len(td.docs):
            return None
        return stored[pk]

    lfv = LiveFieldValues(searcher_get)
    # not yet refreshed: RT values win over the (stale) index
    lfv.add("k1", "UPDATED one")
    lfv.add("k9", "brand new")
    lfv.delete_id("k2")
    assert lfv.get("k1") == "UPDATED one"
    assert lfv.get("k9") == "brand new"
    assert lfv.get("k2") is None  # RT delete masks the index hit
    assert lfv.get("k0") == "alpha beta"  # falls through to the searcher
    assert lfv.size() == 3

    # reopen starts: maps roll over, gets still answer from `old`
    lfv.before_refresh()
    lfv.add("k3", "during reopen")
    assert lfv.get("k1") == "UPDATED one"
    assert lfv.get("k3") == "during reopen"

    # reopen done: old generation dropped; searcher owns those ids again
    lfv.after_refresh()
    assert lfv.get("k1") == "beta gamma"   # back to the index value
    assert lfv.get("k9") is None           # never indexed, map dropped
    assert lfv.get("k3") == "during reopen"  # added during reopen persists
    assert lfv.size() == 1
