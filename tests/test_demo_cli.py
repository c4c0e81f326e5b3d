"""Demo CLI (lucenenet_ray/demo.py — IndexFiles/SearchFiles parity)."""


def test_index_then_search_roundtrip(ray_session, tmp_path, capsys):
    from lucenenet_ray.demo import main

    idx = str(tmp_path / "idx")
    rc = main(["index", "/root/testdata/sf0.001/documents.parquet", idx,
               "--buckets", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Indexed 500 documents" in out

    rc = main(["search", idx, "-q", "spark AND window", "-p", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "total matching documents" in out
    assert "1. doc=" in out

    qf = tmp_path / "queries.txt"
    qf.write_text('"batch merge"\nzzznothing\n')
    rc = main(["search", idx, "--queries-file", str(qf)])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("Searching for:") == 2
    assert "0 total matching documents" in out


def test_search_requires_query(ray_session, tmp_path):
    from lucenenet_ray.demo import main

    assert main(["search", str(tmp_path)]) == 2


def test_terminfo_and_highfreqterms_cli(documents_index, capsys):
    from lucenenet_ray.demo import main

    path, _m = documents_index
    assert main(["terminfo", path, "spark"]) == 0
    out = capsys.readouterr().out
    assert "doc freq" in out and "spark" in out

    assert main(["highfreqterms", path, "-k", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5 and all("docFreq=" in ln for ln in out)

    assert main(["highfreqterms", path, "-t", "-k", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3 and "totalTF=" in out[0]
