"""Index-time field boost baked into the norm byte (Document.Field.Boost /
FieldInvertState.Boost, Index/FieldInvertState.cs:180-196;
BM25Similarity.EncodeNormValue(state.Boost, numTerms)): IndexConfig.boost_col
plumbs a per-doc float through the inverter so the norms file carries
SingleToByte315(boost / sqrt(len)) — and an unboosted build stays
byte-identical to pre-boost code."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucenenet_ray.util.smallfloat import encode_norm
from tests.conftest import SF_DIR


def test_encode_norm_array_boost_matches_scalar():
    lens = np.array([1, 4, 25, 100, 0], dtype=np.int64)
    for b in (1.0, 2.0, 3.0):
        a = encode_norm(lens, b)
        v = encode_norm(lens, np.full(len(lens), b, dtype=np.float32))
        assert (a == v).all()
    # boost shifts the byte: boost 4 on len L equals boost 1 on len L/16
    assert (encode_norm(np.array([16]), 4.0)
            == encode_norm(np.array([1]), 1.0)).all()


@pytest.fixture(scope="module")
def boosted_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index

    path = str(tmp_path_factory.mktemp("boost") / "idx")
    src = os.path.join(SF_DIR, "documents.parquet")
    n = pq.read_metadata(src).num_rows

    def add_boost(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "boost", pa.array((1.0 + (ids % 3)).astype(np.float32)))

    ds = (rd.read_parquet(src, columns=["doc_id", "text"])
          .map_batches(add_boost, batch_format="pyarrow"))
    build_index(ds, IndexConfig(index_path=path, id_min=0,
                                id_max=max(n - 1, 1), n_buckets=4,
                                boost_col="boost"))
    return path


def test_norms_file_carries_boost(boosted_index):
    import glob

    files = sorted(glob.glob(os.path.join(boosted_index, "norms", "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files]).sort_by("doc_id")
    ids = t.column("doc_id").to_numpy()
    lens = t.column("doc_len").to_numpy()
    norms = t.column("norm").to_numpy().astype(np.uint8)
    want = encode_norm(lens, (1.0 + (ids % 3)).astype(np.float32))
    assert (norms == want).all()
    # and it genuinely differs from the unboosted encoding somewhere
    assert (norms != encode_norm(lens)).any()


def test_boost_changes_scores_but_not_matches(boosted_index, documents_index):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    rb = IndexReader(boosted_index)
    rp = IndexReader(documents_index[0])
    tb = search(rb, TermQuery(term="spark"), k=rb.num_docs)
    tp = search(rp, TermQuery(term="spark"), k=rp.num_docs)
    assert tb.total_hits == tp.total_hits       # matching is boost-free
    assert set(tb.docs.tolist()) == set(tp.docs.tolist())
    assert tb.to_list() != tp.to_list()          # ranking is not


def test_prune_identity_on_boosted_index(boosted_index):
    """Block-max pruning metadata must stay lossless with boosted norms
    (block_max_norm is fed the boosted bytes)."""
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    r = IndexReader(boosted_index)
    for q in ["spark window", "data", "vector AND dup"]:
        a = search(r, parse_query(q), k=10, prune=True)
        b = search(r, parse_query(q), k=10, prune=False)
        assert a.to_list() == b.to_list(), q
