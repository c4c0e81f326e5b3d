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


def test_atext_local_parts():
    """email fixture family: full RFC-5321 atext local parts
    (email.addresses.from.random.text.with.email.addresses.txt)."""
    for e in ("bvd#@tupjv.sn", "p1zo*raar@[111.99.108.22]",
              "dj8ngfi@avz13m.cc", "jcavlrjg@3aqiq2yui.gm",
              "sbmm0nm.oyk70.rmndd8k.#ru3li.gmmlbi.0dzrd4d.rvk2ny@au58t.b13albgy4u.mt"):
        t, _, ty = url_email_tokenize(e, frozenset())
        assert t == [e] and ty == ["<EMAIL>"], e


def test_bracket_domain_literals():
    """email fixture family: bracketed domain literals."""
    for e in ("ku-l6ds@[082.015.228.189]", "efcup.cppew@[1ae]",
              "iqg6fl@[220.112.120.54]"):
        t, _, ty = url_email_tokenize(e, frozenset())
        assert t == [e] and ty == ["<EMAIL>"], e


def test_url_query_fragments():
    """wiki-URL fixture family: query strings and fragments
    (LuceneResourcesWikiPageURLs.txt)."""
    for u in ("http://www-128.ibm.com/developerworks/java/library/wa-lucene2/index.html?ca=drs-",
              "http://www.theserverside.com/tt/articles/article.tss?l=ilovelucene",
              "http://example.com/p/3?q=7&x=2",
              "http://example.com/page#section"):
        t, _, ty = url_email_tokenize(u, frozenset())
        assert t == [u] and ty == ["<URL>"], u


def test_mailto_scheme_split():
    """TestUAX29URLEmailTokenizer.TestMailtoSchemeEmails (LUCENE-3880):
    mailto:addr -> 'mailto' <ALPHANUM> + addr <EMAIL>, consecutive
    positions."""
    t, p, ty = url_email_tokenize("mailto:test@example.org", frozenset())
    assert t == ["mailto", "test@example.org"]
    assert ty == ["<ALPHANUM>", "<EMAIL>"]
    assert p == [0, 1]
    # non-email mailto stays a plain word token
    t, _, ty = url_email_tokenize("mailto:notanemail", frozenset())
    assert ty == ["<ALPHANUM>"]


def test_bare_domain_and_ip_urls():
    """TestWikiURLs families: bare hostnames and bare IPv4s are whole
    <URL> tokens (the DFA recognizes TLD-anchored hostnames without a
    scheme)."""
    for u in ("amazon.com", "sourceforge.net", "lucenetutorial.com",
              "ist-h335-d03.syr.edu", "128.230.84.100",
              "bilgidata.com/localhost/bilgidata/yazi.jsp@dosya=a.html"):
        t, _, ty = url_email_tokenize(u, frozenset())
        assert t == [u] and ty == ["<URL>"], u
    # non-URL dotted-ish words stay words
    for w in ("3.14", "v1.0", "sf0.01", "a.b"):
        _, _, ty = url_email_tokenize(w, frozenset())
        assert ty == ["<ALPHANUM>"], w


def test_reference_fixture_coverage_floors():
    """Quantified contract subset vs the reference's own fixture corpora:
    URLs 100%, emails >= 90% (the remainder is the quoted-local-part /
    control-char family, documented out of subset). A regression below
    the floor fails loudly."""
    from lucenenet_ray.analysis.urlemail import _EMAIL, _URL

    B = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/"
         "Analysis/Core/")
    emails = [ln.strip() for ln in open(
        B + "email.addresses.from.random.text.with.email.addresses.txt")
        if ln.strip()]
    urls = [ln.strip() for ln in open(
        B + "LuceneResourcesWikiPageURLs.txt") if ln.strip()]
    em_ok = sum(1 for e in emails if _EMAIL.match(e.lower()))
    url_ok = sum(1 for u in urls if _URL.match(u.lower()))
    assert url_ok == len(urls), (url_ok, len(urls))
    assert em_ok / len(emails) >= 0.90, em_ok / len(emails)


def test_bare_hostname_gated_on_iana_tld_allowlist():
    """ADVICE r4: the bare-hostname arm must not accept arbitrary 2+
    letter pseudo-TLDs — the reference DFA gates scheme-less hostnames
    on the IANA ASCIITLD list. 'js'/'bar'/'gz' are not TLDs; 'md'
    (Moldova) and 'py' (Paraguay) ARE, so those stay <URL> exactly as
    the reference's list dictates."""
    from lucenenet_ray.analysis.urlemail import (TYPE_URL, TYPE_WORD,
                                                 url_email_tokenize)

    def ty(tok):
        _t, _p, types = url_email_tokenize(tok)
        return types[0]

    assert ty("node.js") == TYPE_WORD
    assert ty("foo.bar") == TYPE_WORD
    assert ty("data.tar.gz") == TYPE_WORD
    assert ty("readme.md") == TYPE_URL
    assert ty("setup.py") == TYPE_URL
    assert ty("amazon.com") == TYPE_URL
    # a scheme marks any host a URL (DomainNameLoose after scheme)
    assert ty("http://internal.qzx") == TYPE_URL
    assert ty("www.site.zzzz") == TYPE_URL
