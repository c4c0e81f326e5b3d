"""Classification (Lucene.Net.Classification analogs, ops/classify.py):
naive-Bayes math vs a hand-rolled libm oracle, index-trained vs
Ray-pipeline-trained model identity, batch inference vs one-at-a-time
identity, kNN vote semantics."""

import math

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    return IndexReader(path)


@pytest.fixture(scope="module")
def nb(reader):
    from lucenenet_ray.ops.classify import NaiveBayesClassifier

    return NaiveBayesClassifier(reader, "source")


def _hand_nb_logp(text, cls, docs):
    """Reference math by hand (SimpleNaiveBayesClassifier.cs:141-232):
    token-order libm log accumulation over corpus-derived counts."""
    from lucenenet_ray.analysis.standard import StandardAnalyzer

    an = StandardAnalyzer()
    toks_by_doc = {d["doc_id"]: an(d["text"])[0] for d in docs}
    uniq_by_doc = {k: set(v) for k, v in toks_by_doc.items()}
    sumdf = sum(len(s) for s in uniq_by_doc.values())
    dc = sum(1 for s in uniq_by_doc.values() if s)
    D = len(docs)
    dfc = sum(1 for d in docs if d["source"] == cls)
    den = (sumdf / dc) * dfc + D
    toks, _ = an(text)
    lik = 0.0
    for w in toks:
        h = sum(1 for d in docs
                if d["source"] == cls and w in uniq_by_doc[d["doc_id"]])
        lik += math.log((h + 1.0) / den)
    return math.log(dfc) - math.log(D) + lik


def test_nb_matches_hand_oracle(nb):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    docs = t.to_pylist()
    text = docs[5]["text"]
    lp = nb.log_probs(text)
    for ci in (0, 7, 19):
        cls = nb.model.classes[ci]
        assert lp[ci] == _hand_nb_logp(text, cls, docs)


def test_nb_assign_score_contract(nb):
    """score = 10/|max| and the class is the sorted-order strict max
    (SimpleNaiveBayesClassifier.cs:147-164)."""
    text = "spark window merge data"
    lp = nb.log_probs(text)
    cls, score = nb.assign_class(text)
    assert cls == nb.model.classes[int(np.argmax(lp))]
    assert score == 10.0 / abs(float(lp.max()))


def test_pipeline_model_matches_reader_model(ray_session, nb):
    """train_nb_model (ONE groupby(term,class) shuffle) must reproduce the
    index-derived statistics exactly."""
    import ray.data as rd

    from lucenenet_ray.ops.classify import train_nb_model

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    model = train_nb_model(ds, "source")
    assert model.classes == nb.model.classes
    assert model.docs_with_class == nb.model.docs_with_class
    assert model.avg_unique == nb.model.avg_unique
    assert np.array_equal(model.df_c, nb.model.df_c)
    # spot-check hits against the classifier's postings-derived counts
    for w in ("spark", "merge", "window"):
        assert np.array_equal(model.hits[model.vocab[w]], nb._hits(w))


def test_batch_inference_matches_single(ray_session, nb):
    """nb_classify_dataset's reduceat accumulation must equal the
    one-at-a-time classifier for every doc."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucenenet_ray.ops.classify import nb_classify_dataset, train_nb_model

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    model = train_nb_model(ds, "source")
    out = nb_classify_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]),
        model).to_pandas().set_index("doc_id")["cls"]
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    for did, text in list(zip(t.column("doc_id").to_pylist(),
                              t.column("text").to_pylist()))[:12]:
        assert out.loc[did] == nb.assign_class(text)[0]


def test_knn_votes_sum_to_k(reader):
    import pyarrow.parquet as pq

    from lucenenet_ray.ops.classify import KNNClassifier

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "=", 0)])
    kc = KNNClassifier(reader, "source", k=10)
    vt = kc.vote_table(t.column("text")[0].as_py())
    assert sum(n for _c, n in vt) == 10
    # ordered (votes desc, class asc)
    assert vt == sorted(vt, key=lambda kv: (-kv[1], kv[0]))
    cls, frac = kc.assign_class(t.column("text")[0].as_py())
    assert cls == vt[0][0] and frac == vt[0][1] / 10.0


def test_empty_text_classifies_to_prior_argmax(nb):
    cls, _ = nb.assign_class("")
    lp = nb.model.priors()
    assert cls == nb.model.classes[int(np.argmax(lp))]


def test_dataset_split_rule_and_indexes(documents_index, tmp_path):
    """DatasetSplitter.cs:112-124 sequential rule + three self-contained
    output indexes whose doc sets partition the corpus."""
    from lucenenet_ray.ops.classify import (dataset_split,
                                            dataset_split_assignment)
    from lucenenet_ray.search.reader import IndexReader

    a = dataset_split_assignment(10, 0.2, 0.1)
    # size 10: test quota 2 fills at positions 0,2; cv quota 1 at pos 1
    assert a.tolist() == [1, 2, 1, 0, 0, 0, 0, 0, 0, 0]

    path, manifest = documents_index
    outs = [str(tmp_path / s) for s in ("train", "test", "cv")]
    ms = dataset_split(path, *outs, test_ratio=0.2, cv_ratio=0.1)
    n = manifest["n_docs"]
    assert ms[1]["n_docs"] == 100 and ms[2]["n_docs"] == 50  # 500 docs
    assert sum(m["n_docs"] for m in ms) == n
    seen: set[int] = set()
    for out in outs:
        r = IndexReader(out)
        ids = set()
        for b in r.bucket_ids:
            ids.update(r.bucket(b).norms()[0].tolist())
        assert not (ids & seen)
        seen |= ids
    assert len(seen) == n
