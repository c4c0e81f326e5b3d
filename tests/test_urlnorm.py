"""URL canonicalization + dedup (ops/urlnorm.py)."""

import pyarrow as pa


def test_canonical_url_rules():
    from lucenenet_ray.ops.urlnorm import canonical_url as c

    assert c("https://WWW.Example.COM/Path") == "example.com/Path"
    assert c("http://example.com/Path/") == "example.com/Path"
    assert c("http://example.com/Path///") == "example.com/Path"
    assert c("https://example.com/p#frag") == "example.com/p"
    assert c("http://example.com/p?utm_source=x&b=2&a=1") \
        == "example.com/p?a=1&b=2"
    assert c("http://example.com/p?b=2&a=1") == c(
        "https://www.Example.com/p/?a=1&b=2#x")
    assert c("http://example.com") == "example.com"
    assert c("example.com/p?fbclid=1&gclid=2&ref=z") == "example.com/p"
    # path case is preserved; host case is not
    assert c("HTTP") == "http"  # not a scheme prefix — left as content


def test_url_dedup_first_wins(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.urlnorm import url_dedup

    urls = [
        "https://www.Example.com/A?utm_source=x",   # 0 — canonical e/A
        "http://example.com/A/",                     # 1 — dup of 0
        "http://example.com/B",                      # 2 — unique
        "example.com/A#frag",                        # 3 — dup of 0
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "url": pa.array(urls),
    }))
    out = url_dedup(ds).to_pandas().set_index("doc_id").sort_index()
    assert out["keep"].tolist() == [1, 0, 1, 0]
    assert out.loc[0, "canonical"] == out.loc[1, "canonical"] \
        == out.loc[3, "canonical"] == "example.com/A"
