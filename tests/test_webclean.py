"""Gopher quality rules + C4 line cleaning (ops/webclean.py) — rule unit
tests plus exact parity vs the DuckDB oracles over the augmented corpus."""

import duckdb
import pyarrow as pa

from lucenenet_ray.ops.webclean import (
    C4Clean,
    GopherQuality,
    c4_clean_doc,
    webclean_augmented_text,
)

DOCS = pa.table({
    "doc_id": pa.array(list(range(60)), type=pa.int64()),
    "text": pa.array(
        ["the fast key order sort of and value row line " * (2 + i % 5)
         for i in range(60)], type=pa.string()),
})


def _oracle(sql: str, docs: pa.Table):
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(sql).fetch_arrow_table()


def _one(op, text: str) -> dict:
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array([text], type=pa.string())})
    out = op(t)
    return {k: out.column(k)[0].as_py() for k in out.column_names}


def test_gopher_word_count_bounds():
    good = "the data of value " * 15  # 60 words, stop words present
    assert _one(GopherQuality(), good.strip())["keep"] == 1
    short = "the data of value row"  # 5 words < 50
    assert _one(GopherQuality(), short)["keep"] == 0


def test_gopher_mean_word_length():
    # 60 one-char words -> mean 1 < 3 -> filtered
    r = _one(GopherQuality(), " ".join(["a"] * 58 + ["the", "of"]))
    assert r["n_words"] == 60 and r["total_word_chars"] == 63
    assert r["keep"] == 0


def test_gopher_symbol_ratio():
    base = ("the data of value " * 15).strip()
    r = _one(GopherQuality(), base + " " + "#" * 10)
    assert r["n_symbol_hits"] == 10
    assert r["keep"] == 0  # 10*10 > 61 words
    # "..." counted non-overlapping
    assert _one(GopherQuality(), "a... b....")["n_symbol_hits"] == 2


def test_gopher_bullet_and_ellipsis_lines():
    base = ("the data of value " * 15).strip()
    bullets = "\n".join(["- item x"] * 10)  # 11 lines, 10 bullets
    r = _one(GopherQuality(), base + "\n" + bullets)
    assert r["n_bullet_lines"] == 10 and r["n_lines"] == 11
    assert r["keep"] == 0  # 100 > 99
    ell = "\n".join(["goes on..."] * 5)  # 6 lines, 5 ellipsis-enders
    r2 = _one(GopherQuality(), base + "\n" + ell)
    assert r2["n_ellipsis_lines"] == 5 and r2["keep"] == 0  # 50 > 18


def test_gopher_alpha_words_and_stopwords():
    nums = " ".join(["123"] * 30 + ["the data of value"] * 8)
    r = _one(GopherQuality(), nums)
    assert r["n_alpha_words"] == 32 and r["n_words"] == 62
    assert r["keep"] == 0  # 5*32 < 4*62
    nostop = ("data value row line " * 15).strip()
    r2 = _one(GopherQuality(), nostop)
    assert r2["n_stop_hits"] == 0 and r2["keep"] == 0


def test_c4_line_rules():
    text = ("no terminal punct line\n"
            "the data holds rows.\n"          # kept
            "ok go.\n"                         # < 3 words
            "please enable javascript now.\n"  # javascript
            'she said "stop it here"')         # ends in quote -> kept
    n_lines, n_kept, n_chars, n_sent, keep = c4_clean_doc(text)
    assert (n_lines, n_kept) == (5, 2)
    assert n_sent == 1  # one '.' in kept text ('"' not a sentence mark)
    assert keep == 0  # < 5 sentences


def test_c4_page_filters():
    good = "\n".join(["the data holds many rows."] * 6)
    assert c4_clean_doc(good)[4] == 1
    assert c4_clean_doc(good + "\nlorem ipsum dolor sit amet.")[4] == 0
    assert c4_clean_doc(good + "\nx = { }")[4] == 0


def _augmented(docs: pa.Table) -> pa.Table:
    aug = [webclean_augmented_text(i, x) for i, x in
           zip(docs.column("doc_id").to_pylist(),
               docs.column("text").to_pylist())]
    return pa.table({"doc_id": docs.column("doc_id"),
                     "text": pa.array(aug, type=pa.string())})


def test_gopher_matches_oracle():
    from lucenenet_ray.ops.sql_oracle import gopher_quality_sql

    got = GopherQuality()(_augmented(DOCS))
    want = _oracle(gopher_quality_sql(), DOCS)
    assert got.equals(want.cast(got.schema))


def test_c4_matches_oracle():
    from lucenenet_ray.ops.sql_oracle import c4_clean_sql

    got = C4Clean()(_augmented(DOCS))
    want = _oracle(c4_clean_sql(), DOCS)
    assert got.equals(want.cast(got.schema))
    # both decisions exercised on the synthetic corpus
    keeps = set(got.column("page_keep").to_pylist())
    assert keeps == {0, 1}
