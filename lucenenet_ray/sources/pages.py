"""Deterministic synthetic Common-Crawl-style pages table.

BASELINE.json input_hint fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
This module synthesizes that table deterministically (no RNG state — every
choice is a pure function of doc_id) from the driver-generated
``documents.parquet`` (TESTDATA.md), wrapping each document's text in HTML
that exercises every DemoHTMLParser rule the extractor must honor
(FIXTURES.md §1): style/script suppression, ``<img alt>`` → ``[alt]``, meta
tags, ENDLINE elements, unclosed ``<li>``, uppercase tag names, text before
``<body>``, and url duplicates with differing warc_ts for exact dedup.

The ``text`` column is the GOLDEN extracted body: built alongside the HTML by
applying the reference's rules (DemoHTMLParser.cs:100-220) by construction —
the engine's extractor output must equal it byte-for-byte per url.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_BASE_TS_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

_WRAPPERS = ("p", "div", "h2", "blockquote", "pre")


def _mix(doc_id: int, salt: int) -> int:
    """Cheap deterministic per-doc pseudo-choice (no RNG objects)."""
    x = (doc_id * 2654435761 + salt * 40503) & 0xFFFFFFFF
    x ^= x >> 16
    return x


def url_for(doc_id: int) -> str:
    return f"https://example{doc_id % 97}.com/p/{doc_id}"


def doc_id_for_url(url: str) -> int:
    """Deterministic docID from url: first 60 bits of md5 (SQL-expressible:
    DuckDB ``CAST(('0x' || substr(md5(url),1,15)) AS BIGINT)``)."""
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:15], 16)


def _build_html(doc_id: int, words: list[str], lang: str, title: str) -> tuple[str, str]:
    """Return (html, expected_extracted_body)."""
    html: list[str] = []
    golden: list[str] = []
    upper = _mix(doc_id, 1) % 17 == 0

    def tag(t: str) -> str:
        return t.upper() if upper else t

    html.append("<html>")
    if _mix(doc_id, 2) % 19 == 0:
        # text before <body>: TagSoup opens body implicitly, so it IS body text
        html.append("lead-in text ")
        golden.append("lead-in text ")
        # (head elements can no longer apply once body is open; skip title)
        head_open = False
    else:
        html.append(f"<{tag('head')}><{tag('title')}>{title}</{tag('title')}>")
        html.append(f'<{tag("meta")} name="lang" content="{lang}">')
        html.append(f'<{tag("meta")} http-equiv="X-Doc" content="{doc_id}">')
        html.append(f"</{tag('head')}>")
        head_open = True
    if head_open:
        html.append(f"<{tag('body')}>")

    chunk = max(6, 8 + (_mix(doc_id, 3) % 9))
    n_chunks = 0
    for start in range(0, len(words), chunk):
        ws = " ".join(words[start : start + chunk])
        kind = _mix(doc_id, 10 + n_chunks) % 10
        if kind < 5:
            w = _WRAPPERS[_mix(doc_id, 20 + n_chunks) % len(_WRAPPERS)]
            html.append(f"<{tag(w)}>{ws}</{tag(w)}>")
            golden.append(ws + "\n")
        elif kind < 7:
            # unclosed <li> items inside a <ul>
            html.append(f"<{tag('ul')}><{tag('li')}>{ws}<{tag('li')}>tail {n_chunks}</{tag('ul')}>")
            golden.append(ws + "\n" + f"tail {n_chunks}" + "\n\n")
        elif kind == 7:
            html.append(f"<{tag('div')}>{ws}<{tag('br')}>extra</{tag('div')}>")
            golden.append(ws + "\nextra\n")
        elif kind == 8:
            html.append(f"<{tag('style')}>.x{{color:red}}</{tag('style')}><{tag('p')}>{ws}</{tag('p')}>")
            golden.append(ws + "\n")
        else:
            html.append(f"<{tag('script')}>var i={doc_id};</{tag('script')}><{tag('p')}>{ws}</{tag('p')}>")
            golden.append(ws + "\n")
        n_chunks += 1

    if _mix(doc_id, 4) % 5 == 0:
        html.append(f'<{tag("img")} alt="fig{doc_id % 11}">')
        golden.append(f"[fig{doc_id % 11}]")

    if head_open:
        html.append(f"</{tag('body')}>")
    html.append("</html>")
    return "".join(html), "".join(golden)


def synthesize_pages_table(documents_path: str) -> pa.Table:
    """documents.parquet → pages table (pure function, stable row order)."""
    t = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()

    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    goldens: list[str] = []
    out_langs: list[str] = []

    for doc_id, text, lang in zip(doc_ids, texts, langs):
        words = (text or "").split()
        title = f"Doc {doc_id}: " + " ".join(words[:3])
        url = url_for(doc_id)
        html, golden = _build_html(doc_id, words, lang, title)
        urls.append(url)
        tss.append(_BASE_TS_US + doc_id * 1_000_000)
        htmls.append(html.encode("utf-8"))
        goldens.append(golden)
        out_langs.append(lang)
        if doc_id % 23 == 0:
            # older duplicate of the same url (exact-dedup fixture): fewer words
            old_html, old_golden = _build_html(doc_id, words[: max(1, len(words) // 2)], lang, title)
            urls.append(url)
            tss.append(_BASE_TS_US + doc_id * 1_000_000 - 3_600_000_000)
            htmls.append(old_html.encode("utf-8"))
            goldens.append(old_golden)
            out_langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(goldens, type=pa.string()),
            "lang": pa.array(out_langs, type=pa.string()),
        }
    )


def pages_parquet(sf_dir: str, cache_dir: str = "/tmp/lucenenet_ray_pages") -> str:
    """Materialize (once) the synthetic pages parquet for an sf dir; returns
    the file path. Cached by sf-dir basename — deterministic content."""
    from lucenenet_ray.pipelines.flagship import sf_cache_key
    key = sf_cache_key(sf_dir)
    out = os.path.join(cache_dir, f"pages_{key}.parquet")
    if not os.path.exists(out):
        os.makedirs(cache_dir, exist_ok=True)
        table = synthesize_pages_table(os.path.join(sf_dir, "documents.parquet"))
        tmp = out + ".tmp"
        pq.write_table(table, tmp, row_group_size=8192)
        os.replace(tmp, out)
    return out
