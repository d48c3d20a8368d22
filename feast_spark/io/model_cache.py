"""In-process control-plane cache for persisted-index serving.

Every ``*_index_topk`` call needs the index's small driver-side
artifacts — IVF centroids, PQ codebooks, BM25 corpus stats — before it
can build the (data-plane) query.  Re-reading them per query is
correct but puts a constant ~100s-of-ms floor under serving latency
at ANY corpus size (SCALE.md's hybrid-floor measurement); this cache
makes repeated queries against an unchanged index pay the read once.

Correctness model — cache by IMMUTABLE pointer, never by index path:

* Every cached artifact is keyed by the generation/epoch path (plus a
  cheap content token where one is free) that the shared epoch-append
  protocol (``io/epochs.py``) NEVER rewrites in place: writers stage
  NEW ``gen=``/``epoch=`` names (numbering skips committed AND
  orphaned leftovers, so a crashed rebuild cannot reuse a name), then
  atomically flip ``_MANIFEST.json``.
* The manifest itself is therefore the freshness authority and is NOT
  cached — each query pays one small atomic JSON read.  An append or
  rebuild flips the manifest's epoch list / model pointers; the next
  query reads the new pointers and simply MISSES onto the new
  artifacts.  No TTLs, no invalidation hooks, no staleness window.
* Vacuumed artifacts are never requested again (no committed manifest
  references them); their entries age out of the LRU.

Out of contract: deleting an entire index directory out-of-band and
rebuilding AT THE SAME PATH restarts generation numbering, which can
alias a cached pointer.  The write API never does this (rebuilds go
through the protocol); tests recycling a path should call
:func:`clear`.

Values are shared across callers — treat them as frozen; loaders
should return structures nobody mutates.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable
from threading import Lock

__all__ = ["get_or_load", "clear", "stats"]

_MAX_ENTRIES = 64

_lock = Lock()
_cache: OrderedDict[tuple, object] = OrderedDict()
_hits = 0
_misses = 0


def get_or_load(key: tuple, loader: Callable[[], object]) -> object:
    """Return the cached value for ``key``, loading (and caching) it on
    a miss.  ``key`` must be built from immutable pointers (see module
    docstring); the loader runs OUTSIDE the lock, so concurrent
    first-queries may race to load the same immutable artifact — both
    get correct values, last write wins the slot."""
    global _hits, _misses
    with _lock:
        if key in _cache:
            _hits += 1
            _cache.move_to_end(key)
            return _cache[key]
        _misses += 1
    value = loader()
    with _lock:
        _cache[key] = value
        _cache.move_to_end(key)
        while len(_cache) > _MAX_ENTRIES:
            _cache.popitem(last=False)
    return value


def clear() -> None:
    """Drop every entry (tests; out-of-band path recycling)."""
    global _hits, _misses
    with _lock:
        _cache.clear()
        _hits = 0
        _misses = 0


def stats() -> dict:
    with _lock:
        return {"entries": len(_cache), "hits": _hits, "misses": _misses}
