"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Beyond the reference (Lucene has only exact delete-by-term dedup,
``IndexWriter.cs:1538-1556``); these are the standard large-scale
training-data pipeline ops, built Ray-Data-first:

    map_batches(signatures)          # vectorized per-batch hashing
      → flat (band, band_key, doc)   # explode LSH bands
      → groupby(band, band_key)      # candidate buckets (the only shuffle)
      → pairs → exact-Jaccard verify # verify inside the bucket group

All hashing is md5-based (not Python ``hash``) so results are deterministic
across processes AND reproducible in DuckDB SQL for the driver oracle
(md5 → first 15 hex digits → int64, then affine (a*h+b) mod p transforms in
int64 — no overflow: h < 2^31, a,b < 2^31, p = 2^61-1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MERSENNE61 = (1 << 61) - 1
HASH_DOMAIN = 1 << 31

NUM_PERM = 16
NUM_BANDS = 4  # rows per band r = NUM_PERM / NUM_BANDS = 4
SHINGLE_K = 3


def _perm_params(num_perm: int = NUM_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic affine permutation params derived from md5 (SQL-
    reproducible: a_i = md5_int('a{i}') % (2^31-1) + 1, b_i = md5_int('b{i}') % 2^31)."""
    a = np.empty(num_perm, dtype=np.int64)
    b = np.empty(num_perm, dtype=np.int64)
    for i in range(num_perm):
        a[i] = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:15], 16) % (HASH_DOMAIN - 1) + 1
        b[i] = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:15], 16) % HASH_DOMAIN
    return a, b


def md5_int31(s: str) -> int:
    """md5 → int64 in [0, 2^31): DuckDB equivalent
    ``CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 2147483648``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % HASH_DOMAIN


def shingles(tokens: list[str], k: int = SHINGLE_K) -> list[str]:
    """Word k-shingles joined by single space; whole doc if shorter than k."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray,
                      k: int = SHINGLE_K) -> np.ndarray | None:
    """num_perm minhash values (int64), or None for empty docs."""
    sh = set(shingles(tokens, k))
    if not sh:
        return None
    h = np.array([md5_int31(s) for s in sh], dtype=np.int64)
    # (num_perm, n_shingles) affine transform mod p — vectorized
    vals = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE61
    return vals.min(axis=1)


class MinHashLSH:
    """map_batches stage: text → exploded (doc_id, band, band_key) rows."""

    def __init__(self, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS,
                 shingle_k: int = SHINGLE_K, text_col: str = "text",
                 id_col: str = "doc_id"):
        assert num_perm % num_bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.r = num_perm // num_bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

        self._cache: dict[str, int] = {}  # shingle → md5_int31, shared across batches

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        # flatten the batch to (doc, shingle) pairs, then hash each UNIQUE
        # shingle exactly once (duplicate-heavy corpora re-hash nothing; the
        # per-actor cache carries across batches) — the md5 calls were the
        # throughput ceiling of the per-doc loop version.
        all_sh: list[str] = []
        doc_idx: list[int] = []
        keep_ids: list[int] = []
        for did, text in zip(ids, texts):
            sh = set(shingles((text or "").split(), self.k))
            if not sh:
                continue
            di = len(keep_ids)
            keep_ids.append(did)
            all_sh.extend(sh)
            doc_idx.extend([di] * len(sh))
        if not keep_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int32()),
                    "band_key": pa.array([], type=pa.string()),
                }
            )
        uniq, inv = np.unique(np.array(all_sh, dtype=object), return_inverse=True)
        uh = np.empty(len(uniq), dtype=np.int64)
        cache = self._cache
        for i, s in enumerate(uniq):
            v = cache.get(s)
            if v is None:
                v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % HASH_DOMAIN
                if len(cache) < 2_000_000:
                    cache[s] = v
            uh[i] = v
        h = uh[inv]  # int31 per (doc, shingle)
        ndocs = len(keep_ids)
        didx = np.asarray(doc_idx, dtype=np.int64)
        sig = np.empty((ndocs, self.num_perm), dtype=np.int64)
        for p in range(self.num_perm):
            # a < 2^31, h < 2^31 → product < 2^62: no int64 overflow
            vals = (self.a[p] * h + self.b[p]) % MERSENNE61
            m = np.full(ndocs, np.iinfo(np.int64).max)
            np.minimum.at(m, didx, vals)
            sig[:, p] = m
        out_id: list[int] = []
        out_band: list[int] = []
        out_key: list[str] = []
        for di, did in enumerate(keep_ids):
            for band in range(self.num_bands):
                seg = sig[di, band * self.r : (band + 1) * self.r]
                out_id.append(did)
                out_band.append(band)
                out_key.append("-".join(str(int(v)) for v in seg))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.string()),
            }
        )


DEFAULT_MAX_BUCKET = 256


def candidate_pairs(group: pa.Table, max_bucket: int = DEFAULT_MAX_BUCKET) -> pa.Table:
    """groupby(band, band_key).map_groups: doc pairs in the bucket.

    Buckets larger than ``max_bucket`` are mass-duplication clusters (LSH
    collapses near-identical docs into one bucket): all-pairs there is
    O(n²) — a 1M-doc duplicate cluster would emit 5·10¹¹ rows into the
    shuffle. Above the cap we emit STAR edges to the bucket's min doc (the
    cluster representative) instead: n−1 pairs, same connected component,
    so downstream keep-one-per-component dedup is unchanged. Below the cap
    (every realistic non-attack bucket) output is identical to all-pairs.
    """
    ids = sorted(set(group.column("doc_id").to_pylist()))
    a_out: list[int] = []
    b_out: list[int] = []
    if len(ids) > max_bucket:
        a_out = [ids[0]] * (len(ids) - 1)
        b_out = ids[1:]
    else:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pa.table(
        {
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
        }
    )


def minhash_candidates(ds, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS,
                       shingle_k: int = SHINGLE_K,
                       max_bucket: int = DEFAULT_MAX_BUCKET):
    """Full MinHash-LSH candidate pipeline → distinct (doc_a, doc_b)."""
    import functools

    sig = ds.map_batches(
        MinHashLSH(num_perm, num_bands, shingle_k), batch_format="pyarrow"
    )
    pairs = sig.groupby(["band", "band_key"]).map_groups(
        functools.partial(candidate_pairs, max_bucket=max_bucket),
        batch_format="pyarrow",
    )
    return pairs.groupby(["doc_a", "doc_b"]).count()


# ---------------------------------------------------------------------------


def ngram_jaccard_counts(tokens_a: list[str], tokens_b: list[str],
                         k: int = SHINGLE_K) -> tuple[int, int]:
    """(intersection, union) sizes of the k-shingle sets — integers, so the
    oracle comparison is exact (no float division)."""
    sa, sb = set(shingles(tokens_a, k)), set(shingles(tokens_b, k))
    return len(sa & sb), len(sa | sb)


class ShingleDigests:
    """map_batches stage: doc → sorted unique 16-byte md5 shingle digests
    (restricted to a broadcast doc-id set when given — only candidate docs'
    sets ever leave the text stage)."""

    def __init__(self, doc_ids_ref=None, k: int = SHINGLE_K,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.doc_ids_ref = doc_ids_ref
        self._wanted: frozenset | None = None
        self._resolved = doc_ids_ref is None
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def _wanted_set(self):
        if not self._resolved:
            import ray

            self._wanted = ray.get(self.doc_ids_ref)
            self._resolved = True
        return self._wanted

    def __call__(self, batch: pa.Table) -> pa.Table:
        wanted = self._wanted_set()
        out_id: list[int] = []
        out_dig: list[bytes] = []
        for did, text in zip(batch.column(self.id_col).to_pylist(),
                             batch.column(self.text_col).to_pylist()):
            if wanted is not None and did not in wanted:
                continue
            sh = set(shingles((text or "").split(), self.k))
            dig = np.sort(np.array(
                [hashlib.md5(s.encode("utf-8")).digest() for s in sh], dtype="S16"
            ))
            out_id.append(did)
            out_dig.append(dig.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "digests": pa.array(out_dig, type=pa.large_binary()),
            }
        )


def jaccard_verify(docs_ds, pairs: pa.Table, k: int = SHINGLE_K) -> pa.Table:
    """Exact shingle-Jaccard (inter, uni) for candidate pairs — DISTRIBUTED:

    1. broadcast the candidate doc-id set (ray.put once),
    2. map_batches over the corpus emits sorted md5 digests per candidate doc
       (candidate-scale, not corpus-scale — no driver text dict),
    3. broadcast the digest map and verify pairs in map_batches over the
       PAIRS dataset (sorted-array intersections, np.intersect1d).

    Digest identity == shingle-string identity (md5 collisions negligible),
    so the counts equal the string-set oracle exactly.
    """
    import ray
    import ray.data as rd

    doc_ids = frozenset(pairs.column("doc_a").to_pylist()) | frozenset(
        pairs.column("doc_b").to_pylist()
    )
    ids_ref = ray.put(doc_ids)
    dig_tables = ray.get(
        docs_ds.map_batches(
            ShingleDigests(ids_ref, k), batch_format="pyarrow"
        ).to_arrow_refs()
    )
    digs: dict[int, bytes] = {}
    for t in dig_tables:
        for did, d in zip(t.column("doc_id").to_pylist(),
                          t.column("digests").to_pylist()):
            digs[did] = d
    digs_ref = ray.put(digs)

    def verify(t: pa.Table) -> pa.Table:
        dmap = ray.get(digs_ref)
        inter_out = np.empty(t.num_rows, dtype=np.int64)
        uni_out = np.empty(t.num_rows, dtype=np.int64)
        for i, (a, b) in enumerate(zip(t.column("doc_a").to_pylist(),
                                       t.column("doc_b").to_pylist())):
            da = np.frombuffer(dmap.get(a, b""), dtype="S16")
            db = np.frombuffer(dmap.get(b, b""), dtype="S16")
            inter = np.intersect1d(da, db, assume_unique=True).size
            inter_out[i] = inter
            uni_out[i] = da.size + db.size - inter
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "inter": pa.array(inter_out, type=pa.int64()),
                "uni": pa.array(uni_out, type=pa.int64()),
            }
        )

    from lucenenet_ray.util.tables import dataset_to_table

    pairs_ds = rd.from_arrow(pairs.select(["doc_a", "doc_b"]))
    return dataset_to_table(
        pairs_ds.map_batches(verify, batch_format="pyarrow"),
        schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("inter", pa.int64()), ("uni", pa.int64())]))


# ---------------------------------------------------------------------------


def simhash63(tokens: list[str]) -> int:
    """63-bit SimHash over token md5 hashes weighted by term frequency.

    Bits 0..62 only (top bit dropped) so the value fits a signed int64 both
    here and in the SQL oracle. Empty docs → 0.
    """
    if not tokens:
        return 0
    from collections import Counter

    tf = Counter(tokens)
    acc = np.zeros(63, dtype=np.int64)
    for tok, w in tf.items():
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest(), 16)
        bits = np.array([(h >> i) & 1 for i in range(63)], dtype=np.int64)
        acc += w * (2 * bits - 1)
    out = 0
    for i in range(63):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHash:
    """map_batches stage: text → (doc_id, simhash int64).

    Vectorized across the batch: tokens are uniqued, each unique token is
    md5-hashed ONCE (per-actor cache carries across batches), its ±1 bit
    vector is precomputed, and per-doc accumulation is one scatter-add over
    (doc, token, tf) triples — equal to ``simhash63`` per row (tested)."""

    _POW2 = (np.int64(1) << np.arange(63, dtype=np.int64))

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[str, int] = {}  # token → low-63 bits of md5 int

    def _low63(self, tok: str) -> int:
        v = self._cache.get(tok)
        if v is None:
            v = int(hashlib.md5(tok.encode("utf-8")).hexdigest(), 16) & ((1 << 63) - 1)
            if len(self._cache) < 1_000_000:
                self._cache[tok] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        flat_tok: list[str] = []
        flat_doc: list[int] = []
        for di, t in enumerate(texts):
            toks = (t or "").split()
            flat_tok.extend(toks)
            flat_doc.extend([di] * len(toks))
        out = np.zeros(len(texts), dtype=np.int64)
        if flat_tok:
            uniq, inv = np.unique(np.array(flat_tok, dtype=object),
                                  return_inverse=True)
            lows = np.array([self._low63(t) for t in uniq], dtype=np.int64)
            # ±1 bit matrix for unique tokens: (n_uniq, 63) int8
            bits = (
                (lows[:, None] >> np.arange(63, dtype=np.int64)[None, :]) & 1
            ).astype(np.int8)
            pm = (2 * bits - 1).astype(np.int64)
            # tf per (doc, token) pair
            key = np.asarray(flat_doc, dtype=np.int64) * len(uniq) + inv
            ukey, cnt = np.unique(key, return_counts=True)
            pdoc = ukey // len(uniq)
            ptok = ukey % len(uniq)
            acc = np.zeros((len(texts), 63), dtype=np.int64)
            np.add.at(acc, pdoc, cnt[:, None] * pm[ptok])
            out = ((acc > 0).astype(np.int64) * self._POW2[None, :]).sum(axis=1)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(out, type=pa.int64()),
            }
        )


def connected_components(edges, max_rounds: int = 50):
    """Connected components over candidate pairs — the MinHash-dedup
    finisher (keep one representative per component, drop the rest).

    Input: a Ray Dataset OR pyarrow table of (doc_a, doc_b) edges (the
    minhash_candidates output). Returns a pyarrow table (doc_id, root)
    covering every node that appears in an edge, root = component min.

    Scale shape: distributed min-label propagation (the map-reduce CC /
    label-propagation algorithm): each round every node adopts the min
    label among itself and its neighbors — ONE map_batches over the edges
    plus one groupby-min per round; LSH candidate graphs are star-capped
    (candidate_pairs max_bucket), so the diameter — and the round count —
    stays tiny (2-4). Like jaccard_verify's digest dict, the label map is
    broadcast per round (candidate-scale, NOT corpus-scale); above ~10^8
    clustered docs, swap the broadcast for a hash-partitioned
    label-exchange join keyed the same way as the band shuffle."""
    import numpy as np
    import pyarrow as pa

    if hasattr(edges, "to_arrow_refs"):
        import ray

        from lucenenet_ray.util.tables import dataset_to_table

        edges = dataset_to_table(
            edges, schema=pa.schema([("doc_a", pa.int64()),
                                     ("doc_b", pa.int64())]))
    a = np.asarray(edges.column("doc_a").to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    b = np.asarray(edges.column("doc_b").to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    # symmetrize once; vectorized rounds (the per-round kernel a worker
    # would run in map_batches over its edge shard)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    if src.size == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "root": pa.array([], type=pa.int64())})
    nodes = np.unique(src)
    label = dict(zip(nodes.tolist(), nodes.tolist()))
    for _ in range(max_rounds):
        lab = np.asarray([label[x] for x in dst.tolist()], dtype=np.int64)
        changed = False
        # groupby(src).min(neighbor labels ∪ own)
        order = np.argsort(src, kind="stable")
        s_sorted = src[order]
        l_sorted = lab[order]
        bounds = np.flatnonzero(np.diff(s_sorted)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [s_sorted.size]])
        mins = np.minimum.reduceat(l_sorted, starts)
        for i, st in enumerate(starts):
            node = int(s_sorted[st])
            m = min(int(mins[i]), label[node])
            if m < label[node]:
                label[node] = m
                changed = True
        del ends
        if not changed:
            break
    keys = sorted(label)
    return pa.table({
        "doc_id": pa.array(keys, type=pa.int64()),
        "root": pa.array([label[k] for k in keys], type=pa.int64()),
    })


# SimHash near-dup blocking (Manku, Jain & Sarma, WWW'07 "Detecting
# Near-Duplicates for Web Crawling"): with the 63-bit signature cut into
# `blocks` contiguous chunks, any pair within Hamming distance k shares at
# least (blocks - k) chunks, so blocks = k+1 guarantees ≥1 identical chunk
# — candidates come from ONE groupby(block, chunk-value) shuffle and only
# candidates pay the exact popcount verify.
_SIMHASH_BLOCK_OFFSETS = (0, 16, 32, 48)   # 16/16/16/15 bits of the 63


def _simhash_blocks(sig: "np.ndarray") -> list["np.ndarray"]:
    out = []
    for i, off in enumerate(_SIMHASH_BLOCK_OFFSETS):
        width = (_SIMHASH_BLOCK_OFFSETS + (63,))[i + 1] - off
        out.append((sig >> off) & ((np.int64(1) << width) - 1))
    return out


def simhash_pairs(ds, hamming_k: int = 3, max_bucket: int = DEFAULT_MAX_BUCKET):
    """Distinct (doc_a, doc_b, hamming) pairs with Hamming(simhash) <= k
    (k <= 3 keeps the 4-block pigeonhole exact)."""
    import functools

    import pyarrow as pa

    if hamming_k >= len(_SIMHASH_BLOCK_OFFSETS):
        raise ValueError("hamming_k must be < 4 for the 4-block pigeonhole")

    sig = ds.map_batches(SimHash(), batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
        s = np.asarray(t.column("simhash").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        blks = _simhash_blocks(s)
        n = len(ids)
        return pa.table({
            "block": pa.array(np.repeat(np.arange(len(blks),
                                                  dtype=np.int64), n)),
            "chunk": pa.array(np.concatenate(blks)),
            "doc_id": pa.array(np.tile(ids, len(blks))),
            "simhash": pa.array(np.tile(s, len(blks))),
        })

    def bucket_pairs(t: pa.Table, max_bucket: int) -> pa.Table:
        ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False))
        s = np.asarray(t.column("simhash").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, s = ids[order], s[order]
        n = len(ids)
        if n < 2:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        if n > max_bucket:  # star-edge cap, like candidate_pairs
            a = np.full(n - 1, ids[0], dtype=np.int64)
            b = ids[1:]
            ham = _popcount64(s[0] ^ s[1:])
        else:
            iu, ju = np.triu_indices(n, k=1)
            a, b = ids[iu], ids[ju]
            ham = _popcount64(s[iu] ^ s[ju])
        keep = ham <= hamming_k
        return pa.table({"doc_a": pa.array(a[keep]),
                         "doc_b": pa.array(b[keep]),
                         "hamming": pa.array(ham[keep].astype(np.int64))})

    pairs = sig.map_batches(explode, batch_format="pyarrow") \
        .groupby(["block", "chunk"]) \
        .map_groups(functools.partial(bucket_pairs, max_bucket=max_bucket),
                    batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming")


def _popcount64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized popcount via an 8-bit lookup table."""
    v = x.astype(np.uint64)
    out = np.zeros(v.shape, dtype=np.int64)
    for _ in range(8):
        out += _POP8[(v & np.uint64(0xFF)).astype(np.intp)]
        v = v >> np.uint64(8)
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


# --- Duplicated-window substring dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better": remove every substring that
# appears more than once in the corpus, at token-window granularity).
# Scale shape: windows stage is a stateless map (rows never return to the
# driver), duplicated-hash detection is ONE groupby(h) shuffle, per-doc span
# coverage is ONE groupby(doc_id) shuffle of only the MARKED rows (a small
# fraction of the corpus at realistic dup rates). No broadcast state.

DUPWIN_K = 5


def _md5_int60(s: str) -> int:
    """md5 → int64 in [0, 2^60): DuckDB equivalent
    ``CAST(('0x'||substr(md5(s),1,15)) AS BIGINT)`` — the full 15-hex
    prefix (no % 2^31) so window-hash collisions are negligible while the
    oracle still makes the IDENTICAL dup/keep decision per window."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _window_rows(batch: pa.Table, k: int) -> pa.Table:
    """Stateless stage → (h, doc_id, pos) for every k-token window.
    pos is 1-based (SQL range parity). Docs shorter than k emit nothing."""
    out_h: list[int] = []
    out_d: list[int] = []
    out_p: list[int] = []
    for did, txt in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
        toks = (txt or "").split()
        n = len(toks)
        for i in range(n - k + 1):
            out_h.append(_md5_int60(" ".join(toks[i:i + k])))
            out_d.append(did)
            out_p.append(i + 1)
    return pa.table({
        "h": pa.array(out_h, type=pa.int64()),
        "doc_id": pa.array(out_d, type=pa.int64()),
        "pos": pa.array(out_p, type=pa.int64()),
    })


def duplicated_window_spans(ds, k: int = DUPWIN_K):
    """Per doc: windows whose hash occurs >= 2 times corpus-wide (including
    within-doc repeats) and the token positions they cover.

    Returns a Dataset of (doc_id, n_dup_windows, n_covered) — docs with no
    duplicated window are absent (join against doc lengths downstream)."""

    wins = ds.map_batches(_window_rows, fn_kwargs={"k": k},
                          batch_format="pyarrow", batch_size=512)

    def dup_rows(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        return group.select(["doc_id", "pos"])

    def coverage(group: pa.Table) -> pa.Table:
        did = group.column("doc_id")[0].as_py()
        pos = np.asarray(group.column("pos"), dtype=np.int64)
        covered = np.unique((pos[:, None] + np.arange(k)[None, :]).ravel())
        return pa.table({
            "doc_id": pa.array([did], type=pa.int64()),
            "n_dup_windows": pa.array([group.num_rows], type=pa.int64()),
            "n_covered": pa.array([int(covered.size)], type=pa.int64()),
        })

    return (wins.groupby("h").map_groups(dup_rows, batch_format="pyarrow")
                .groupby("doc_id").map_groups(coverage,
                                              batch_format="pyarrow"))


def dedup_eval(docs_ds_factory, n_docs: int, sample_mod: int = 20,
               k: int = SHINGLE_K) -> pa.Table:
    """Sampled precision/recall report for the MinHash-LSH candidate
    stage — the dedup-quality methodology of Lee et al. 2022 §4 /
    standard blocking-evaluation practice (ground truth on a
    deterministic doc SAMPLE, where exact all-pairs Jaccard is
    affordable; candidates from the FULL LSH run restricted to the
    sample).  Truth = sample pairs with shingle-Jaccard >= 1/2
    (2·inter >= union, union > 0 — cross-multiplied, no float).

    Returns ONE row: (n_sample, n_truth, n_cand, tp, fp, fn,
    precision_fp, recall_fp) with fixed-point = x*10^9 // denom.

    ``docs_ds_factory()`` returns a fresh documents Dataset per pass
    (sample pass + digest pass + LSH pass).  The sample is STRATIFIED —
    the md5 rule 'ndsample-{id}' % sample_mod == 0 (random stratum)
    UNION docs containing the 'dup' marker token (known-positive
    stratum) — the standard blocking-evaluation design: random pairs
    estimate precision, labeled positives make recall measurable."""
    import ray

    def sample_partial(t: pa.Table) -> pa.Table:
        ids = []
        for did, x in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            if (md5_int31(f"ndsample-{did}") % sample_mod == 0
                    or "dup" in (x or "").split(" ")):
                ids.append(did)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    sample_ids = set()
    for t in ray.get(docs_ds_factory().map_batches(
            sample_partial, batch_format="pyarrow").to_arrow_refs()):
        sample_ids.update(t.column("doc_id").to_pylist())
    sample_ids = frozenset(sample_ids)
    ids_ref = ray.put(sample_ids)
    digs: dict[int, bytes] = {}
    for t in ray.get(docs_ds_factory().map_batches(
            ShingleDigests(ids_ref, k),
            batch_format="pyarrow").to_arrow_refs()):
        for did, d in zip(t.column("doc_id").to_pylist(),
                          t.column("digests").to_pylist()):
            digs[did] = d
    sids = sorted(digs)
    truth = set()
    for i, a in enumerate(sids):
        da = np.frombuffer(digs[a], dtype="S16")
        for b in sids[i + 1:]:
            db = np.frombuffer(digs[b], dtype="S16")
            inter = np.intersect1d(da, db, assume_unique=True).size
            union = da.size + db.size - inter
            if union > 0 and 2 * inter >= union:
                truth.add((a, b))

    from lucenenet_ray.util.tables import dataset_to_table

    cand_t = dataset_to_table(
        minhash_candidates(docs_ds_factory()),
        schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("n_bands", pa.int64())]))
    cand = set()
    for a, b in zip(cand_t.column("doc_a").to_pylist(),
                    cand_t.column("doc_b").to_pylist()):
        if a in sample_ids and b in sample_ids:
            cand.add((min(a, b), max(a, b)))

    tp = len(truth & cand)
    fp = len(cand - truth)
    fn = len(truth - cand)
    prec = (tp * 1_000_000_000) // len(cand) if cand else 0
    rec = (tp * 1_000_000_000) // len(truth) if truth else 0
    return pa.table({
        "n_sample": pa.array([len(sample_ids)], type=pa.int64()),
        "n_truth": pa.array([len(truth)], type=pa.int64()),
        "n_cand": pa.array([len(cand)], type=pa.int64()),
        "tp": pa.array([tp], type=pa.int64()),
        "fp": pa.array([fp], type=pa.int64()),
        "fn": pa.array([fn], type=pa.int64()),
        "precision_fp": pa.array([prec], type=pa.int64()),
        "recall_fp": pa.array([rec], type=pa.int64()),
    })
