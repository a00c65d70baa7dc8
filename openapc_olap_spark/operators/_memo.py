"""Gateway-scoped memoization for built Column expression trees.

Several operators memoize large py4j-backed ``Column`` trees (hundreds of
gateway round-trips to build — see BASELINE.md round-4 notes). A ``Column``
wraps a JVM object, so a cached tree is only valid for the lifetime of the
py4j gateway: if the SparkContext is torn down and relaunched (test-session
boundaries, notebook driver restarts), stale references fail with opaque
py4j errors. ``memoized`` therefore tags every memo dict with the active
gateway's identity and clears it wholesale when the gateway changes.

Size: entries are keyed by operator parameters (column name, hops, nbits,
seed, ...) — a handful of distinct keys per workload — so the bound that
matters is the gateway lifetime, which this module enforces.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from typing import Any

from pyspark import SparkContext

_TOKEN_KEY = "__gateway_token"


def _gateway_ref() -> weakref.ref | None:
    """Weak reference to the active gateway. A weakref (not ``id()``)
    identifies it: CPython recycles addresses of freed objects, so an
    id-equal token could validate a memo against a NEW gateway that
    happens to land at the old address — exactly the stale-JVM-reference
    failure this module exists to prevent. The weakref also goes dead
    when the old gateway is collected, forcing a clear."""
    sc = SparkContext._active_spark_context
    return weakref.ref(sc._gateway) if sc is not None else None


def memoized(memo: dict, key: Any, build: Callable[[], Any]) -> Any:
    """Return ``memo[key]``, building it with ``build()`` on first use.
    The whole memo is invalidated when the py4j gateway changes."""
    ref = _gateway_ref()
    cur = ref() if ref is not None else None
    old = memo.get(_TOKEN_KEY)
    if old is None or old() is not cur:
        memo.clear()
        memo[_TOKEN_KEY] = ref if ref is not None else (lambda: None)
    if key not in memo:
        memo[key] = build()
    return memo[key]
