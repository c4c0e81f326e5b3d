"""Searcher lifetime + live-value NRT plumbing.

* :class:`SearcherLifetimeManager` —
  ``Search/SearcherLifetimeManager.cs``: record a searcher (here: an
  :class:`IndexReader` snapshot) under a token, re-acquire THE SAME
  point-in-time view later (deep paging / "more like these results"
  follow-ups stay consistent across refreshes), prune by age.  The
  reference keys by ``IndexReader.Version`` (:60-104 ``Record``) and
  prunes with ``PruneByAge`` (:150-199); we key by the reader's commit
  version stamp and inject the clock for determinism.

* :class:`LiveFieldValues` — ``Search/LiveFieldValues.cs``: the
  real-time get. Values added since the last refresh are answered from an
  in-RAM map; once a refresh makes the index changes visible the maps
  roll over (current -> old on reopen start, old dropped on reopen end —
  the reference's double-buffer at :51-72) and gets fall through to the
  searcher.
"""

from __future__ import annotations

from typing import Any, Callable

_MISSING = object()  # tombstone for delete-before-refresh


class SearcherLifetimeManager:
    """Record/acquire/prune point-in-time readers by version token."""

    def __init__(self, clock: Callable[[], float] | None = None):
        import time

        self._clock = clock or time.monotonic
        self._readers: dict[tuple, tuple[float, Any]] = {}

    def record(self, reader) -> tuple:
        """Returns the token for this reader's point-in-time view.
        Recording the same version twice keeps the FIRST entry
        (SearcherLifetimeManager.cs:96-101 returns the existing one)."""
        token = reader.version()
        if token not in self._readers:
            self._readers[token] = (self._clock(), reader)
        return token

    def acquire(self, token: tuple):
        """The recorded reader, or None if pruned/never recorded
        (callers fall back to the live searcher, :117-131)."""
        entry = self._readers.get(token)
        return entry[1] if entry is not None else None

    def prune(self, max_age_sec: float) -> int:
        """Drop entries older than ``max_age_sec`` (PruneByAge). Returns
        how many were dropped."""
        now = self._clock()
        dead = [t for t, (ts, _r) in self._readers.items()
                if now - ts > max_age_sec]
        for t in dead:
            del self._readers[t]
        return len(dead)

    def __len__(self) -> int:
        return len(self._readers)


class LiveFieldValues:
    """Real-time id -> value get over a PK keyword field.

    ``searcher_get(id)`` is the index fallback (runs a PK TermQuery on the
    CURRENT searcher and returns the stored value, or None).  ``add`` /
    ``delete_id`` mirror writer operations; call ``before_refresh()`` when
    a commit/reopen STARTS and ``after_refresh()`` when the new searcher
    is live (LiveFieldValues.cs:51-72)."""

    def __init__(self, searcher_get: Callable[[Any], Any]):
        self._get = searcher_get
        self._current: dict[Any, Any] = {}
        self._old: dict[Any, Any] = {}

    def add(self, id_: Any, value: Any) -> None:
        self._current[id_] = value

    def delete_id(self, id_: Any) -> None:
        self._current[id_] = _MISSING

    def before_refresh(self) -> None:
        # reference: old = current; current = new empty map (:51-58)
        self._old = self._current
        self._current = {}

    def after_refresh(self) -> None:
        # the new searcher covers everything in old (:62-72)
        self._old = {}

    def get(self, id_: Any) -> Any:
        for m in (self._current, self._old):
            v = m.get(id_, None)
            if v is _MISSING:
                return None
            if v is not None:
                return v
        return self._get(id_)

    def size(self) -> int:
        return len(self._current) + len(self._old)
