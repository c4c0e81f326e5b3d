"""Corpus-wide paragraph dedup (ops/paradedup.py): first occurrence wins
across docs AND within a doc; empties are structural and always kept."""

import hashlib

import pyarrow as pa


def test_paragraph_dedup_semantics(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.paradedup import paragraph_dedup

    docs = {
        0: "unique zero\nSHARED LINE\n\nanother zero",
        1: "SHARED LINE\nunique one\nSHARED LINE",   # cross-doc + within-doc
        2: "\n\nSHARED LINE",                          # only empties survive
        3: "another zero\nfresh three",                # dup of doc 0's line
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[d] for d in sorted(docs)]),
    }))
    out = paragraph_dedup(ds).to_pandas().set_index("doc_id").sort_index()

    expected_clean = {
        0: "unique zero\nSHARED LINE\n\nanother zero",  # all first
        1: "unique one",                                  # both SHARED gone
        2: "\n",                                          # two empties kept
        3: "fresh three",
    }
    for d, clean in expected_clean.items():
        row = out.loc[d]
        assert row["clean_len"] == len(clean), d
        assert row["clean_md5"] == hashlib.md5(
            clean.encode("utf-8")).hexdigest(), d
    assert out.loc[0, "n_paras"] == 4 and out.loc[0, "n_kept"] == 4
    assert out.loc[1, "n_paras"] == 3 and out.loc[1, "n_kept"] == 1
    assert out.loc[2, "n_paras"] == 3 and out.loc[2, "n_kept"] == 2
    assert out.loc[3, "n_paras"] == 2 and out.loc[3, "n_kept"] == 1
