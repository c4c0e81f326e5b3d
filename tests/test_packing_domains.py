"""Sequence packing, epoch shuffle, domain hygiene (ops/packing.py,
ops/sampling.py epoch_shuffle, ops/domains.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])


def _naive_pack(ids, ntoks, L, sep):
    starts, first, last = [], [], []
    off = 0
    for n in ntoks:
        starts.append(off)
        first.append(off // L)
        last.append((off + max(n, 1) - 1) // L)
        off += n + sep
    return starts, first, last


def test_pack_sequences_matches_naive(docs_ds):
    import regex

    from lucenenet_ray.ops.packing import pack_sequences
    from lucenenet_ray.ops.textstats import BpeTokenCount
    from lucenenet_ray.util.tables import dataset_to_table

    t = dataset_to_table(pack_sequences(docs_ds, seq_len=64, sep_tokens=1,
                                        n_buckets=7)).sort_by("doc_id")
    raw = pa.concat_tables([b for b in docs_ds.iter_batches(
        batch_format="pyarrow")]).sort_by("doc_id")
    pat = regex.compile(BpeTokenCount.PATTERN)
    ntoks = [len(pat.findall(x or "")) for x in
             raw.column("text").to_pylist()]
    starts, first, last = _naive_pack(raw.column("doc_id").to_pylist(),
                                      ntoks, 64, 1)
    assert t.column("n_tokens").to_pylist() == ntoks
    assert t.column("start_off").to_pylist() == starts
    assert t.column("first_seq").to_pylist() == first
    assert t.column("last_seq").to_pylist() == last
    # spans are contiguous: next start == prev start + n + sep
    got = t.column("start_off").to_pylist()
    for i in range(1, len(got)):
        assert got[i] == got[i - 1] + ntoks[i - 1] + 1


def test_pack_sequences_bucket_count_invariance(docs_ds):
    """The range-bucket partitioning is an implementation detail: any
    n_buckets produces identical offsets."""
    from lucenenet_ray.ops.packing import pack_sequences
    from lucenenet_ray.util.tables import dataset_to_table

    a = dataset_to_table(pack_sequences(docs_ds, seq_len=128,
                                        n_buckets=3)).sort_by("doc_id")
    b = dataset_to_table(pack_sequences(docs_ds, seq_len=128,
                                        n_buckets=41)).sort_by("doc_id")
    assert a.equals(b)


def test_epoch_shuffle_is_reproducible_permutation(docs_ds, ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.sampling import epoch_shuffle
    from lucenenet_ray.util.tables import dataset_to_table

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"])
    t1 = dataset_to_table(epoch_shuffle(ds, seed=1))
    t2 = dataset_to_table(epoch_shuffle(ds, seed=1))
    assert t1.column("doc_id").to_pylist() == t2.column("doc_id").to_pylist()
    # a permutation of the corpus
    assert sorted(t1.column("doc_id").to_pylist()) == list(range(500))
    # different seed → different order
    t3 = dataset_to_table(epoch_shuffle(ds, seed=2))
    assert t1.column("doc_id").to_pylist() != t3.column("doc_id").to_pylist()
    # key formula pinned to md5 hex (DuckDB-parity)
    d0 = t1.column("doc_id")[0].as_py()
    assert (t1.column("shuffle_key")[0].as_py()
            == hashlib.md5(f"epoch:1:{d0}".encode()).hexdigest())


def test_domain_filter_drops_blocked_and_capped(docs_ds, ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.domains import (domain_filter, domain_stats,
                                           synth_domains)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"])
    st = domain_stats(ds)
    n = ds.count()
    counts = dict(zip(st.column("domain").to_pylist(),
                      st.column("n_docs").to_pylist()))
    assert sum(counts.values()) == n
    # the squashed map is skewed: d0 holds several raw slots → capped
    assert st.column("blocked_cap").to_pylist()[
        st.column("domain").to_pylist().index("d0.example.com")]
    blocked = {d for d, bl, bc in zip(st.column("domain").to_pylist(),
                                      st.column("blocked_list").to_pylist(),
                                      st.column("blocked_cap").to_pylist())
               if bl or bc}
    assert "d3.example.com" in blocked
    kept = domain_filter(ds)
    kept_ids = []
    for b in kept.iter_batches(batch_format="pyarrow"):
        kept_ids.extend(b.column("doc_id").to_pylist())
    kept_doms = set(synth_domains(kept_ids))
    assert not (kept_doms & blocked)
    assert len(kept_ids) == n - sum(counts[d] for d in blocked)


def test_classic_fragmenter_closed_form_matches_state_machine():
    """The numpy running-min closed form == the literal SimpleFragmenter
    loop (IsNewFragment: end >= F * currentNumFrags), including jump cases
    where a gap spans multiple fragment sizes (k lags floor(e/F))."""
    import numpy as np

    rng = [(5, 12, 25, 31, 44), (99, 100, 101, 199, 200, 201),
           (10, 350, 360, 980, 990),  # big jumps: k must lag floor
           tuple(range(7, 700, 7))]
    F = 100
    for ends in rng:
        e = np.asarray(ends, dtype=np.int64)
        # literal state machine
        k, frags = 1, []
        for x in e:
            if x >= F * k:
                k += 1
            frags.append(k - 1)
        # closed form (ops/highlight.py classic_best_fragment)
        f = e // F
        i1 = np.arange(1, len(e) + 1, dtype=np.int64)
        runmin = np.minimum.accumulate(np.concatenate(([0], f - i1)))
        got = (i1 + runmin[1:]).tolist()
        assert got == frags, (ends, got, frags)


def test_classic_best_fragment_semantics():
    import numpy as np

    from lucenenet_ray.ops.highlight import classic_best_fragment

    w = {"spark": np.float32(2.0), "merge": np.float32(1.5)}
    # both terms in fragment 0 → score 3.5 there; 'spark' repeats later but
    # unique-per-fragment keeps later frags at lower score
    text = ("spark merge " + "filler " * 20 + "spark " + "pad " * 40
            + "spark merge spark")
    frag, score = classic_best_fragment(text, w, fragment_size=100)
    assert frag == 0
    assert score == np.float32(np.float32(2.0) + np.float32(1.5))
    # no query terms → None
    assert classic_best_fragment("just plain words here", w) is None
    # tie between two fragments → earliest wins
    text2 = "spark " + "x " * 60 + "spark"
    frag2, score2 = classic_best_fragment(text2, w, fragment_size=50)
    assert score2 == np.float32(2.0)
    assert frag2 == 0
