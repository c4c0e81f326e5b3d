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


def test_paragraph_dedup_fuzz_vs_model(ray_session):
    """Random corpora vs a sequential-Python model of the keep rule."""
    import hashlib as _h
    import random

    import ray.data as rd

    from lucenenet_ray.ops.paradedup import paragraph_dedup

    rng = random.Random(7)
    lines = [f"line {i}" for i in range(6)] + [""]
    docs = ["\n".join(rng.choice(lines)
                      for _ in range(rng.randint(1, 6)))
            for _ in range(12)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    }))
    got = paragraph_dedup(ds).to_pandas().set_index("doc_id").sort_index()

    seen: set[str] = set()
    for d, x in enumerate(docs):
        kept = []
        for seg in x.split("\n"):
            if seg == "":
                kept.append(seg)
            elif seg not in seen:
                seen.add(seg)
                kept.append(seg)
        clean = "\n".join(kept)
        row = got.loc[d]
        assert row["n_paras"] == len(x.split("\n"))
        assert row["n_kept"] == len(kept)
        assert row["clean_md5"] == _h.md5(clean.encode()).hexdigest(), (d, x)
