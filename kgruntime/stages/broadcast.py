"""Broadcast-side cache for stateless task stages.

``ray.get`` of the same ObjectRef inside one worker process re-pays
deserialization per call; actor pools amortize it via ``__init__`` but
pay pool-startup latency instead.  For *light* lookup state (a dict, a
key array) a plain-task stage + this per-process memo gets both: zero
pool spin-up and one deserialization per worker process.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_get(ref, build=None, tag: str = ""):
    """ray.get(ref), memoized per worker process.

    ``build`` (optional) post-processes the fetched object (e.g. wraps a
    dict into a lookup structure); the BUILT value is what gets cached,
    keyed by (ref, tag).
    """
    import ray

    key = (ref.hex() if hasattr(ref, "hex") else id(ref), tag)
    hit = _CACHE.get(key)
    if hit is None:
        obj = ray.get(ref)
        hit = build(obj) if build is not None else obj
        _CACHE[key] = hit
    return hit
