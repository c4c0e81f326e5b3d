"""NRT push replication: publish/subscribe commit distribution.

The ``Lucene.Net.Replicator`` publish/subscribe loop analog
(``Replicator/LocalReplicator.cs`` Publish/CheckForUpdate/Obtain,
``Replicator/ReplicationClient.cs:44-120`` UpdateNow/StartUpdateThread,
``Replicator/Http/*`` transport) re-expressed Ray-native:

- :class:`ReplicationHub` — an **async Ray actor** playing LocalReplicator:
  writers ``publish(gen)`` after :func:`lucenenet_ray.index.commits.commit`;
  replicas ``wait_for_update(after_gen)`` which parks on an asyncio event
  and returns the moment a newer generation is published. That inverts the
  reference's HTTP poll into a push: zero polling traffic, publish→wake
  latency is one actor call, and a hub serves any number of replicas
  (asyncio wakes all waiters; each call holds no CPU while parked).
- :class:`ReplicaNode` — a **Ray actor** playing ReplicationClient +
  SearcherManager on a serving node: each ``sync_once`` waits for a push,
  checks the commit out via :func:`replicate` (hardlink on same device,
  copy across), and atomically swaps its reader (the handler's
  RevisionReady → IndexReplicationHandler swap). Searches between syncs
  keep serving the previous checkout — replicas never block reads.

Scale shape: the hub moves only (generation, path) metadata — bytes flow
node-to-storage via ``replicate``'s hardlink/copy against the shared
store, exactly the manifest-on-shared-storage model in ``commits.py``. A
256-node cluster runs one hub (or one per index) and 256 ReplicaNodes;
publish is O(replicas) event wakes, not O(replicas × bytes) through the
driver.
"""

from __future__ import annotations

import asyncio

import ray


@ray.remote(num_cpus=0)
class ReplicationHub:
    """LocalReplicator analog: holds the newest published generation of one
    source index and wakes parked subscribers on publish."""

    def __init__(self, index_path: str):
        self.index_path = index_path
        self._gen: int = -1
        self._event = asyncio.Event()

    def publish(self, gen: int) -> int:
        """Record a newer commit generation (Replicator.Publish). Stale or
        duplicate publishes are ignored (the reference releases obsolete
        revisions the same way). Returns the current newest gen."""
        if gen > self._gen:
            self._gen = gen
            self._event.set()
        return self._gen

    def current(self) -> int:
        """Newest published generation, -1 if none (CheckForUpdate)."""
        return self._gen

    async def wait_for_update(self, after_gen: int,
                              timeout_s: float | None = None) -> int:
        """Park until a generation newer than ``after_gen`` is published;
        returns it (or the current one immediately if already newer).
        Returns ``after_gen`` unchanged on timeout — callers loop."""
        while self._gen <= after_gen:
            self._event.clear()
            try:
                await asyncio.wait_for(self._event.wait(), timeout_s)
            except asyncio.TimeoutError:
                return after_gen
        return self._gen

    def source_path(self) -> str:
        return self.index_path


@ray.remote
class ReplicaNode:
    """ReplicationClient + serving-side SearcherManager analog: one actor
    per serving node; owns a local checkout dir and an open reader."""

    def __init__(self, hub, checkout_path: str):
        self.hub = hub
        self.checkout_path = checkout_path
        self.gen: int = -1
        self._reader = None

    def _swap_reader(self):
        from lucenenet_ray.search.reader import IndexReader

        # replicate() swapped the checkout dir atomically; reopening is the
        # IndexReplicationHandler → SearcherManager.MaybeRefresh step
        self._reader = IndexReader(self.checkout_path)

    def sync_once(self, timeout_s: float | None = 30.0) -> int:
        """One UpdateNow cycle: wait for a pushed generation newer than
        ours, check it out, swap the reader. Returns the (possibly
        unchanged, on timeout) serving generation."""
        from lucenenet_ray.index.commits import replicate

        new_gen = ray.get(self.hub.wait_for_update.remote(self.gen, timeout_s))
        if new_gen <= self.gen:
            return self.gen
        src = ray.get(self.hub.source_path.remote())
        replicate(src, new_gen, self.checkout_path)
        self.gen = new_gen
        self._swap_reader()
        return self.gen

    def run(self, n_updates: int, timeout_s: float = 30.0) -> int:
        """StartUpdateThread analog bounded for tests: serve ``n_updates``
        pushes then return the final generation."""
        done = 0
        while done < n_updates:
            before = self.gen
            after = self.sync_once(timeout_s)
            if after > before:
                done += 1
            else:
                break  # timed out with no publish
        return self.gen

    def serving_generation(self) -> int:
        return self.gen

    def search_terms(self, terms: list[str], k: int = 10,
                     mode: str = "or") -> list[tuple[int, float]]:
        """Serve a BM25 query from the replica's current checkout (reads
        never block on syncs — the old reader serves until the swap)."""
        if self._reader is None:
            return []
        from lucenenet_ray.search.query import (
            BooleanClause,
            BooleanQuery,
            Occur,
            TermQuery,
        )
        from lucenenet_ray.search.searcher import search

        occur = Occur.MUST if mode == "and" else Occur.SHOULD
        q = BooleanQuery(clauses=tuple(
            BooleanClause(occur, TermQuery(term=t)) for t in terms))
        return search(self._reader, q, k=k).to_list()


def publish_commit(hub, index_path: str, user_data: dict | None = None) -> int:
    """Commit the live index and push the new generation to subscribers
    (IndexWriter.Commit + Replicator.Publish(IndexRevision) in one step)."""
    from lucenenet_ray.index.commits import commit

    gen = commit(index_path, user_data)
    ray.get(hub.publish.remote(gen))
    return gen
