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
