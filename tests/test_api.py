"""IndexWriter / IndexSearcher facade (lucenenet_ray/api.py) — the
reference's primary API surface mapped to shards + federation +
tombstones + merge policy."""

import pytest

from lucenenet_ray.search.query import TermQuery, field_term


def _docs(texts, src=None):
    return [{"text": t, **({"source": src} if src else {})} for t in texts]


def test_writer_commit_and_search(ray_session, tmp_path):
    from lucenenet_ray.api import IndexSearcher, IndexWriter

    w = IndexWriter(str(tmp_path / "w"), n_buckets=2)
    w.add_documents(_docs(["alpha beta", "beta gamma", "gamma delta"]))
    g1 = w.commit()
    w.add_documents(_docs(["alpha epsilon", "delta beta"]))
    g2 = w.commit()
    assert g2 == g1 + 1 and w.num_shards == 2

    s = IndexSearcher(w.reader())
    td = s.search("beta", n=10)
    assert sorted(td.docs.tolist()) == [0, 1, 4]
    # string query == query tree
    td2 = s.search(TermQuery(term="beta"), n=10)
    assert td2.to_list() == td.to_list()
    # empty commit is a no-op
    assert w.commit() == g2


def test_delete_ordering_matches_writer_contract(ray_session, tmp_path):
    """A delete affects only docs added BEFORE the call — committed or
    buffered — never docs added after (delete-queue ordering)."""
    from lucenenet_ray.api import IndexSearcher, IndexWriter

    w = IndexWriter(str(tmp_path / "w"), n_buckets=2)
    w.add_documents(_docs(["target one", "clean doc"]))
    w.commit()
    w.add_document({"text": "target two buffered"})   # buffered, pre-delete
    w.delete_documents("target")
    w.add_document({"text": "target three survives"})  # post-delete
    w.commit()

    td = IndexSearcher(w.reader()).search("target", n=10)
    # only the post-delete add survives; ids assign at commit, so the
    # buffer-deleted doc never consumed one (docIDs are ephemeral in the
    # reference too — compaction renumbers)
    assert td.docs.tolist() == [2]


def test_update_document_last_writer_wins(ray_session, tmp_path):
    from lucenenet_ray.api import IndexSearcher, IndexWriter

    w = IndexWriter(str(tmp_path / "w"), n_buckets=2,
                    extra_fields=(("source", "source", False),))
    w.add_document({"text": "old version alpha", "source": "k1"})
    w.add_document({"text": "other beta", "source": "k2"})
    w.commit()
    w.update_document(field_term("source", "k1"),
                      {"text": "new version alpha", "source": "k1"})
    w.commit()
    s = IndexSearcher(w.reader())
    td = s.search(TermQuery(term=field_term("source", "k1")), n=10)
    assert td.docs.tolist() == [2]  # the re-added doc, old one tombstoned
    assert IndexSearcher(w.reader()).search("version", n=10).docs.tolist() \
        == [2]


def test_force_merge_preserves_results_and_deletes(ray_session, tmp_path):
    from lucenenet_ray.api import IndexSearcher, IndexWriter
    from lucenenet_ray.index.merge_policy import TieredMergePolicy

    w = IndexWriter(str(tmp_path / "w"), n_buckets=2,
                    merge_policy=TieredMergePolicy(
                        max_merge_at_once_explicit=3))
    for i in range(4):
        w.add_documents(_docs([f"common t{i} alpha", f"common t{i} beta"]))
        w.commit()
    w.delete_documents("t1")
    before = IndexSearcher(w.reader()).search("common", n=20)
    assert w.num_shards == 4
    w.force_merge(1)
    assert w.num_shards == 1
    after = IndexSearcher(w.reader()).search("common", n=20)
    # same live docs; scores may differ because the merge RECLAIMS the
    # deletes (df/avgdl stop counting purged docs — reference behavior)
    assert sorted(after.docs.tolist()) == sorted(before.docs.tolist())
    assert 2 not in after.docs.tolist() and 3 not in after.docs.tolist()
    # merged shard starts with an empty tombstone log; a FRESH delete on
    # the merged index still works
    w.delete_documents("t2")
    td = IndexSearcher(w.reader()).search("common", n=20)
    assert {4, 5}.isdisjoint(td.docs.tolist())


def test_writer_reopen_persists_state(ray_session, tmp_path):
    from lucenenet_ray.api import IndexSearcher, IndexWriter

    root = str(tmp_path / "w")
    w = IndexWriter(root, n_buckets=2)
    w.add_documents(_docs(["alpha one", "beta two"]))
    w.commit()
    del w

    w2 = IndexWriter(root, n_buckets=2)
    assert w2.num_shards == 1
    w2.add_document({"text": "gamma three"})
    w2.commit()
    td = IndexSearcher(w2.reader()).search("gamma", n=10)
    assert td.docs.tolist() == [2]  # doc ids continue, no overlap


def test_stored_fields_doc_retrieval(ray_session, tmp_path):
    """IndexSearcher.Doc(docID): stored fields come back for hits, survive
    merges, and unknown ids return None."""
    from lucenenet_ray.api import IndexWriter
    from lucenenet_ray.index.merge_policy import TieredMergePolicy

    w = IndexWriter(str(tmp_path / "w"), n_buckets=2,
                    stored_fields=("text", "title"),
                    merge_policy=TieredMergePolicy(
                        max_merge_at_once_explicit=3))
    w.add_document({"text": "alpha beta", "title": "Doc Zero"})
    w.add_document({"text": "beta gamma", "title": "Doc One"})
    w.commit()
    w.add_document({"text": "gamma delta", "title": "Doc Two"})
    w.commit()

    s = w.searcher()
    hit = s.search("gamma", n=1).docs.tolist()[0]
    d = s.doc(hit)
    assert d["doc_id"] == hit and d["title"] in ("Doc One", "Doc Two")
    assert s.doc(0)["title"] == "Doc Zero"
    assert s.doc(999) is None
    assert s.doc(1, columns=["title"]) == {"title": "Doc One"}

    w.force_merge(1)
    assert w.num_shards == 1
    s2 = w.searcher()
    assert s2.doc(2)["text"] == "gamma delta"
    assert s2.doc(0)["title"] == "Doc Zero"
