"""Demo CLI — IndexFiles / SearchFiles parity (``Lucene.Net.Demo``).

The reference's two console apps re-expressed over the Ray Data engine
(``IndexFiles.cs`` / ``SearchFiles.cs``):

    python -m lucenenet_ray.demo index  <DOCS_PARQUET> <INDEX_DIR> \
        [--buckets N] [--text-col COL] [--id-col COL]
    python -m lucenenet_ray.demo search <INDEX_DIR> \
        [-q QUERY | --queries-file FILE] [--paging HITS] [--repeat N]

``index`` runs the full distributed build (dedup-free raw path: read →
invert → salted term shuffle → merged compressed index) and prints the
docs/sec line IndexFiles prints.  ``search`` parses with the classic
QueryParser subset and pages BM25 top hits like SearchFiles' interactive
loop (non-interactive here: -q or --queries-file; --repeat for the
timing loop SearchFiles has).

Owns its Ray session (CLI entry point — __ray_entry__/library code never
calls ray.init; this module only does under __main__ + a guard).
"""

from __future__ import annotations

import argparse
import sys
import time


def cmd_index(args) -> int:
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index

    n = pq.read_metadata(args.docs).num_rows
    t0 = time.time()
    ds = rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    cfg = IndexConfig(index_path=args.index, id_min=0,
                      id_max=max(n - 1, 1), n_buckets=args.buckets)
    manifest = build_index(ds, cfg, text_col=args.text_col,
                           id_col=args.id_col)
    dt = time.time() - t0
    print(f"Indexed {manifest['n_docs']} documents in {dt:.2f} sec "
          f"({manifest['n_docs'] / dt:.0f} docs/sec) -> {args.index}")
    return 0


def cmd_search(args) -> int:
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    if args.queries_file:
        with open(args.queries_file) as f:
            queries = [ln.strip() for ln in f if ln.strip()]
    elif args.query:
        queries = [args.query]
    else:
        print("search: need -q QUERY or --queries-file FILE",
              file=sys.stderr)
        return 2
    reader = IndexReader(args.index)
    for qtext in queries:
        q = parse_query(qtext)
        if args.repeat > 1:  # SearchFiles' timing loop
            t0 = time.time()
            for _ in range(args.repeat):
                search(reader, q, k=args.paging)
            dt = time.time() - t0
            print(f"Time: {dt * 1000.0 / args.repeat:.2f} ms/query "
                  f"({args.repeat} runs)")
        td = search(reader, q, k=args.paging)
        print(f"Searching for: {qtext}")
        print(f"{td.total_hits} total matching documents")
        for i, (doc, score) in enumerate(td.to_list(), 1):
            print(f"{i}. doc={doc} score={score:.6f}")
    return 0



def cmd_terminfo(args) -> int:
    """GetTermInfo.cs analog: docFreq / totalTermFreq of one term."""
    from lucenenet_ray.search.reader import IndexReader

    r = IndexReader(args.index)
    df, ttf = r.term_stats([args.term]).get(args.term, (0, 0))
    print(f"{args.term}:{args.term} \t totalTF = {ttf:,} \t "
          f"doc freq = {df:,}")
    return 0


def cmd_highfreqterms(args) -> int:
    """HighFreqTerms.cs analog: top-k terms by docFreq (or by
    totalTermFreq with -t), highest first."""
    import pyarrow.compute as pc

    from lucenenet_ray.search.query import FIELD_SEP
    from lucenenet_ray.search.reader import IndexReader

    r = IndexReader(args.index)
    t = r._termstats().to_table(columns=["term", "df", "ttf"])
    t = t.filter(pc.invert(pc.match_substring(t.column("term"),
                                              FIELD_SEP)))
    key = "ttf" if args.t else "df"
    idx = pc.sort_indices(t, sort_keys=[(key, "descending"),
                                        ("term", "ascending")])
    t = t.take(idx[: args.k])
    for term, df, ttf in zip(t.column("term").to_pylist(),
                             t.column("df").to_pylist(),
                             t.column("ttf").to_pylist()):
        if args.t:
            print(f"{term} totalTF={ttf:,} docFreq={df:,}")
        else:
            print(f"{term} docFreq={df:,}")
    return 0


def cmd_merge(args) -> int:
    """IndexMergeTool.cs analog: merge N indexes into one."""
    from lucenenet_ray.index.merge_indexes import merge_indexes

    m = merge_indexes(args.inputs, args.out)
    print(f"Merged {len(args.inputs)} indexes "
          f"({m['n_docs']} docs) -> {args.out}")
    return 0

def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lucenenet_ray.demo")
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("index", help="IndexFiles analog")
    pi.add_argument("docs")
    pi.add_argument("index")
    pi.add_argument("--buckets", type=int, default=8)
    pi.add_argument("--text-col", default="text")
    pi.add_argument("--id-col", default="doc_id")
    ps = sub.add_parser("search", help="SearchFiles analog")
    ps.add_argument("index")
    ps.add_argument("-q", "--query")
    ps.add_argument("-qf", "--queries-file")
    ps.add_argument("-p", "--paging", type=int, default=10)
    ps.add_argument("-r", "--repeat", type=int, default=1)
    pt = sub.add_parser("terminfo", help="GetTermInfo analog")
    pt.add_argument("index")
    pt.add_argument("term")
    ph = sub.add_parser("highfreqterms", help="HighFreqTerms analog")
    ph.add_argument("index")
    ph.add_argument("-t", action="store_true",
                    help="order by totalTermFreq")
    ph.add_argument("-k", type=int, default=100)
    pm = sub.add_parser("merge", help="IndexMergeTool analog")
    pm.add_argument("out")
    pm.add_argument("inputs", nargs="+")
    args = p.parse_args(argv)
    if args.cmd == "index":
        return cmd_index(args)
    if args.cmd == "terminfo":
        return cmd_terminfo(args)
    if args.cmd == "highfreqterms":
        return cmd_highfreqterms(args)
    if args.cmd == "merge":
        return cmd_merge(args)
    return cmd_search(args)


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        rc = main()
    finally:
        ray.shutdown()
    raise SystemExit(rc)
