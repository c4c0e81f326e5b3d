"""BPE-ish pre-tokenizer count (ops/textstats.py BpeTokenCount)."""

import pyarrow as pa

from lucenenet_ray.ops.textstats import BpeTokenCount


def test_bpe_token_count_edges():
    b = BpeTokenCount()
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "text": pa.array(["hello world", "", "a1b!  c",
                                    "don't stop"])})
    out = b(t)
    # "hello world" -> ["hello", " world"]
    # "a1b!  c" -> ["a", "1", "b", "!", " ", " c"]  (double space: "\s+"
    # grabs one space, " c" the other)
    # "don't stop" -> ["don", "'", "t", " stop"]
    assert out.column("n_bpe_tokens").to_pylist() == [2, 0, 6, 4]
