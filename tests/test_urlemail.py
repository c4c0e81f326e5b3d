"""UAX29URLEmailTokenizer analog (analysis/urlemail.py)."""

from lucenenet_ray.analysis.urlemail import url_email_tokenize


def test_url_and_email_kept_whole():
    terms, pos, types = url_email_tokenize(
        "visit https://example.com/a/b or mail Bob@Corp.IO now",
        frozenset({"or"}))
    assert terms == ["visit", "https://example.com/a/b", "mail",
                     "bob@corp.io", "now"]
    assert types == ["<ALPHANUM>", "<URL>", "<ALPHANUM>", "<EMAIL>",
                     "<ALPHANUM>"]
    assert pos == [0, 1, 3, 4, 5]   # stopword hole at 'or'


def test_www_form_and_port():
    t, _, ty = url_email_tokenize("www.example.org http://h.co:8080/x", frozenset())
    assert ty == ["<URL>", "<URL>"]


def test_non_url_split_normally():
    t, _, ty = url_email_tokenize("plain words", frozenset())
    assert t == ["plain", "words"] and ty == ["<ALPHANUM>", "<ALPHANUM>"]
