

def test_context_spell_prefers_bigram_context(ray_session):
    """The chosen correction must follow (bigram desc, unigram desc,
    lex) — construct a case where unigram alone would pick wrong."""
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.neardup import md5_int31
    from lucenenet_ray.ops.symspell import context_spell_correct

    # find a doc id where the typo rule fires
    did = next(i for i in range(1000) if md5_int31(f"typo:{i}") % 10 == 0)
    # corpus: 'cart' frequent overall, but after 'blue' only 'card'
    filler = ["card cart x cart blue card"] * 1  # bigram (blue, card)
    texts = {did: "q w e cart zz blue"}  # typo from 'cart', left='blue'
    rows_id, rows_tx = [], []
    for i in range(did + 1):
        rows_id.append(i)
        rows_tx.append(texts.get(i, "cart cart cart cart cart " +
                                 filler[0]))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(rows_id, type=pa.int64()),
        "text": pa.array(rows_tx, type=pa.string()),
    })).repartition(3)
    out = context_spell_correct(ds, k=1000)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert did in rows
    r = rows[did]
    assert r["left_word"] == "blue"
    p = md5_int31(f"typopos:{did}") % 4
    assert r["typo"] == "cart"[:p] + "cart"[p + 1:]
    if r["typo"] == "car":
        # both 'cart' and 'card' are distance-1 from 'car'; the bigram
        # (blue, card) context beats 'cart' despite its higher unigram
        assert r["chosen"] == "card"
        assert r["bigram_n"] >= 1
    else:
        # 'card' is not distance-1 from this typo; 'cart' is the only
        # candidate
        assert r["chosen"] == "cart"
