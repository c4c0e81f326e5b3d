"""lucenenet_ray — a Ray-Data-native full-text inverted-index + BM25 engine.

A from-scratch rebuild of the query/data-processing capabilities of Apache
Lucene.NET 4.8 (reference: /root/reference) expressed idiomatically on
``ray.data.Dataset``:

- HTML→text extraction (DemoHTMLParser-equivalent) and StandardAnalyzer
  tokenization as vectorized ``map_batches`` stages over Arrow batches.
- Distributed posting-list construction via actor-pool segment writers,
  merged with a salted ``groupby(term)`` shuffle into doc-range-bucketed
  shards of delta/VInt-compressed postings with block-max (skip) metadata.
- A BM25 (k1=1.2, b=0.75) top-k query engine, score-identical to Lucene's
  ``BM25Similarity`` (float32 ops, byte-quantized norms), with lossless
  block-max WAND pruning and Lucene ``TopDocs.Merge`` tie-break semantics.

Nothing here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
