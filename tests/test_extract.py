"""DemoHTMLParser-equivalence tests: rule-level goldens + the synthetic
pages corpus byte-identity invariant (BASELINE.json input_hint)."""

import pytest

from lucenenet_ray.extract import parse_html
from lucenenet_ray.sources.pages import synthesize_pages_table

CASES = [
    # title trimmed (DemoHTMLParser.cs:79); ENDLINE elements append '\n'
    ("<html><head><title> T </title></head><body><p>a</p><div>b</div></body></html>",
     ("T", "a\nb\n")),
    # style/script subtrees suppressed (SUPPRESS_ELEMENTS :218-220)
    ("<body><style>h1{c}</style>x<script>v=1;</script>y</body>", ("", "xy")),
    # <img alt="x"> → [x] (:131-139); img without alt contributes nothing
    ("<body><img alt='pic'>t<img src='s'></body>", ("", "[pic]t")),
    # uppercase tag names; implied </li> and list-end newlines
    ("<BODY><P>up<LI>one<LI>two</UL>", ("", "up\none\ntwo\n")),
    # no <body> tag: body implied at first text (TagSoup recovery)
    ("just text", ("", "just text")),
    # text before <body>; unclosed <p> closed at EOF
    ("<title>T</title>lead<p>para", ("T", "leadpara\n")),
    # <br>/<hr> newlines
    ("<body>a<br>b<hr>c</body>", ("", "a\nb\nc")),
    # tables: </tr> newline (td is NOT an ENDLINE element), implied tr close
    ("<body><table><tr><td>c1<td>c2<tr><td>r2</table></body>", ("", "c1c2\nr2\n\n")),
    # select/option are ENDLINE elements
    ("<body><select><option>x<option>y</select></body>", ("", "x\ny\n\n")),
    # entities decoded
    ("<body><p>a&amp;b &lt;c&gt;</p></body>", ("", "a&b <c>\n")),
    # content after </body> ignored
    ("<body>in</body>out", ("", "in")),
]


@pytest.mark.parametrize("html,expected", CASES)
def test_extraction_rules(html, expected):
    title, body, _meta, err = parse_html(html)
    assert err is None
    assert (title, body) == expected


def test_meta_tags_lowercased_keys():
    # meta name|http-equiv → lowercase-keyed props (:110-121)
    _t, _b, meta, _e = parse_html(
        "<head><meta name='Date' content='2020'>"
        "<meta http-equiv='Content-Type' content='text/html'>"
        "<meta content='orphan'></head><body>x</body>"
    )
    assert meta == {"date": "2020", "content-type": "text/html"}


def test_frameset_rejected():
    # :150-152 — framesets raise; we convert to an error column
    _t, body, _m, err = parse_html("<frameset><frame src='x'></frameset>")
    assert body == "" and err is not None


def test_bytes_input_and_garbage():
    _t, body, _m, err = parse_html("<body>ok</body>".encode())
    assert body == "ok" and err is None
    _t, _b, _m, err = parse_html(b"\xff\xfe<body>still ok</body>")
    assert err is None  # decoded with replacement


def test_pages_corpus_byte_identity():
    """THE invariant: extracted text byte-identical per url vs the golden
    column, over every synthesized page (incl. dup rows)."""
    t = synthesize_pages_table("/root/testdata/sf0.001/documents.parquet")
    for i in range(t.num_rows):
        html = t.column("html")[i].as_py()
        golden = t.column("text")[i].as_py()
        _title, body, _meta, err = parse_html(html)
        assert err is None
        assert body == golden, t.column("url")[i].as_py()
