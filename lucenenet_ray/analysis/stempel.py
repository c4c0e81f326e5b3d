"""Stempel analog: the Egothor patch-command stemmer, trained not shipped.

Re-expresses ``Lucene.Net.Analysis.Stempel`` (Egothor.Stemmer): the
reference ships a compiled Polish table (``stemmer_20000.tbl`` — a data
pack out of copy scope); the ALGORITHM is language-agnostic
(``StempelStemmer.cs:26-33``) and is implemented here with tables
TRAINED from (word, stem) pairs:

* ``Diff.exec(a, b)`` — edit-distance DP emitting a patch string that
  rewrites ``a`` into ``b`` starting from the LAST character:
  run-length ``-x`` (skip run), ``Dx`` (delete run), ``Rc`` (replace
  with c), ``Ic`` (insert c); costs ins=del=rep=1, noop=0, mismatch
  diagonal 100; tie order D,X,Y,R exactly as
  ``Egothor.Stemmer/Diff.cs:176-330``.
* ``Diff.apply(word, patch)`` — ``Diff.cs:113-163`` (cursor from the
  end; '-' skips, 'R' replaces, 'D' deletes a run, 'I' inserts).
* ``Trie`` (suffix direction, ``forward=False`` — the stempel table
  orientation): ``add`` per ``Trie.cs:365-405`` (rows on demand, cmd
  stored at the last key char), ``get_last_on_path`` per
  ``Trie.cs:298-325`` (walk remembering the last command on the path —
  shorter-suffix commands are inherited by unseen longer words).
* ``StempelStemmer.stem`` per ``Stempel/StempelStemmer.cs:53-66``
  (None when no command or the patch empties the word).

MultiTrie2 + the Gener/Lift/Optimizer/Reduce passes are COMPRESSION of
the same table (smaller rows, identical training-set behavior); the
uncompressed Trie keeps exact semantics and is documented as such.

Training is a Ray pipeline: (word, stem) pair batches map to
(key, patch) rows in parallel (the DP is per-pair), the lexicon-sized
result is collected and folded into one Trie on the driver, then
broadcast via ``ray.put`` to the stemming actor pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class Diff:
    """Egothor Diff (Diff.cs): patch generation + application."""

    INSERT = DELETE = REPLACE = 1
    NOOP = 0

    @staticmethod
    def apply(word: str, patch: str | None) -> str:
        if patch is None:
            return word
        buf = list(word)
        pos = len(buf) - 1
        if pos < 0:
            return word
        try:
            for i in range(len(patch) // 2):
                cmd = patch[2 * i]
                param = patch[2 * i + 1]
                par_num = ord(param) - ord("a") + 1
                if cmd == "-":
                    pos = pos - par_num + 1
                elif cmd == "R":
                    if pos < 0 or pos >= len(buf):
                        raise IndexError
                    buf[pos] = param
                elif cmd == "D":
                    o = pos
                    pos -= par_num - 1
                    if pos < 0 or o >= len(buf):
                        raise IndexError
                    del buf[pos:o + 1]
                elif cmd == "I":
                    pos += 1
                    if pos < 0 or pos > len(buf):
                        raise IndexError
                    buf.insert(pos, param)
                pos -= 1
        except IndexError:
            pass  # Diff.cs swallows out-of-range patches (:160-163)
        return "".join(buf)

    def exec(self, a: str, b: str) -> str:
        """Patch transforming a -> b, applied from the last char."""
        X, Y, R, D = 1, 2, 3, 0
        maxx, maxy = len(a) + 1, len(b) + 1
        net = np.zeros((maxx, maxy), dtype=np.int64)
        way = np.zeros((maxx, maxy), dtype=np.int8)
        net[1:, 0] = np.arange(1, maxx)
        way[1:, 0] = X
        net[0, 1:] = np.arange(1, maxy)
        way[0, 1:] = Y
        for x in range(1, maxx):
            for y in range(1, maxy):
                go = [0] * 4
                go[X] = net[x - 1, y] + self.DELETE
                go[Y] = net[x, y - 1] + self.INSERT
                go[R] = net[x - 1, y - 1] + self.REPLACE
                go[D] = net[x - 1, y - 1] + (
                    self.NOOP if a[x - 1] == b[y - 1] else 100)
                mn = D
                if go[mn] >= go[X]:
                    mn = X
                if go[mn] > go[Y]:
                    mn = Y
                if go[mn] > go[R]:
                    mn = R
                way[x, y] = mn
                net[x, y] = go[mn]
        # read the patch (from the string ends backward, Diff.cs:263-330)
        out: list[str] = []
        base = chr(ord("a") - 1)
        deletes = equals = base
        x, y = maxx - 1, maxy - 1
        while x + y != 0:
            w = way[x, y]
            if w == X:
                if equals != base:
                    out.append("-" + equals)
                    equals = base
                deletes = chr(ord(deletes) + 1)
                x -= 1
            elif w == Y:
                if deletes != base:
                    out.append("D" + deletes)
                    deletes = base
                if equals != base:
                    out.append("-" + equals)
                    equals = base
                y -= 1
                out.append("I" + b[y])
            elif w == R:
                if deletes != base:
                    out.append("D" + deletes)
                    deletes = base
                if equals != base:
                    out.append("-" + equals)
                    equals = base
                y -= 1
                out.append("R" + b[y])
                x -= 1
            else:  # D: no change
                if deletes != base:
                    out.append("D" + deletes)
                    deletes = base
                equals = chr(ord(equals) + 1)
                x -= 1
                y -= 1
        if deletes != base:
            out.append("D" + deletes)
        return "".join(out)


class Trie:
    """Egothor Trie (Trie.cs), rows as dicts; forward=False = the
    stempel suffix orientation (StrEnum walks the key from its end)."""

    def __init__(self, forward: bool = False):
        self.forward = forward
        self.cmds: list[str] = []
        self.cmd_index: dict[str, int] = {}
        # row = (refs: dict[ch,row_id], cmd: dict[ch,cmd_id])
        self.rows: list[tuple[dict, dict]] = [({}, {})]
        self.root = 0

    def _iter(self, key: str):
        return iter(key) if self.forward else reversed(key)

    def add(self, key: str, cmd: str) -> None:
        if not key or not cmd:
            return
        cid = self.cmd_index.get(cmd)
        if cid is None:
            cid = len(self.cmds)
            self.cmds.append(cmd)
            self.cmd_index[cmd] = cid
        refs, cmds = self.rows[self.root]
        chars = list(self._iter(key))
        for ch in chars[:-1]:
            node = refs.get(ch)
            if node is None:
                node = len(self.rows)
                self.rows.append(({}, {}))
                refs[ch] = node
            refs, cmds = self.rows[node]
        cmds[chars[-1]] = cid

    def get_last_on_path(self, key: str) -> str | None:
        refs, cmds = self.rows[self.root]
        last = None
        chars = list(self._iter(key))
        for ch in chars[:-1]:
            w = cmds.get(ch)
            if w is not None:
                last = self.cmds[w]
            node = refs.get(ch)
            if node is None:
                return last
            refs, cmds = self.rows[node]
        w = cmds.get(chars[-1]) if chars else None
        return self.cmds[w] if w is not None else last


class StempelStemmer:
    """StempelStemmer.cs:53-66: None when no command applies or the
    patch empties the word."""

    def __init__(self, trie: Trie):
        self.trie = trie

    def stem(self, word: str) -> str | None:
        cmd = self.trie.get_last_on_path(word)
        if cmd is None:
            return None
        out = Diff.apply(word, cmd)
        return out if out else None


def train_trie(pairs_ds) -> Trie:
    """Ray training pipeline: (word, stem) rows -> per-batch patch
    strings (Diff.exec per pair, parallel) -> lexicon-sized collect ->
    one Trie folded on the driver (Compile.cs:171 trie.Add(token,
    diff.Exec(token, stem)))."""

    def patches(t: pa.Table) -> pa.Table:
        d = Diff()
        words = t.column("word").to_pylist()
        stems = t.column("stem").to_pylist()
        return pa.table({
            "word": pa.array(words, pa.string()),
            "patch": pa.array([d.exec(w, s) for w, s in zip(words, stems)],
                              pa.string()),
        })

    trie = Trie(forward=False)
    rows = pairs_ds.map_batches(patches, batch_format="pyarrow").take_all()
    for r in sorted(rows, key=lambda r: r["word"]):
        trie.add(r["word"], r["patch"])
    return trie


class StemTokens:
    """Actor-pool map_batches stage: (doc_id, word) -> (doc_id, stem);
    words the stemmer returns None for pass through unchanged (the
    StempelFilter keepOrig-on-null behavior)."""

    def __init__(self, trie_ref):
        import ray

        trie = (ray.get(trie_ref)
                if not isinstance(trie_ref, Trie) else trie_ref)
        self.stemmer = StempelStemmer(trie)

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        stems = [self.stemmer.stem(w) or w for w in words]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "term": pa.array(stems, pa.string()),
        })
