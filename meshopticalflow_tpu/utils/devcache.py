"""Process-level cache of built DEVICE state (uploaded buffers, solver
handles) keyed by the problem's artifact identity.

The disk artifact cache (utils/artifacts.py) already amortizes HOST work
(PLY parse, subdivision, operator assembly) across processes; what it cannot
amortize is the per-construction cost of turning those artifacts back into
device state — npz reads of 100+ MB coarse hierarchies, h2d uploads over the
~16 MB/s tunnel, pattern-pack rebuilds. A user aligning many pairs over one
mesh (apps/track_sequence.py; the bench's repeated draws; --serve workers)
pays that per pair: round-4 driver capture charged 10.5-15.6 s of init to
EVERY warm draw, 6.3-8.5 s of it coarse load+upload (VERDICT r4 next #4).

This cache closes that: FlowProblem construction registers its immutable
device state (basis arrays, coarse/patch handles, texel tables, textures,
preprocessed signals, multifrontal index tables) under the same artifact
keys the disk cache uses, and later constructions of the SAME problem reuse
the resident buffers. Device arrays are immutable by construction
(functional JAX), so sharing is safe; the handle objects (PatchLevel etc.)
additionally accumulate lazily-built solver packs, which is exactly the
reuse --serve depends on.

Scope guards: entries are only written when the problem has an artifact
cache key (tests constructing ad-hoc problems bypass it) and never under a
device mesh (sharded placements are per-mesh). The cache is LRU-bounded —
device HBM is the budget — and MESHFLOW_DEVCACHE=0 disables it.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

import os

_CACHE: "OrderedDict[tuple, Any]" = OrderedDict()
_SIZES: dict = {}
_MAX_ENTRIES = 24
# Device HBM is the real budget, so eviction is BYTE-bounded, not just
# entry-bounded: a handful of 4K-atlas entries (texture pair ~400 MB,
# coarse handles 100+ MB) would otherwise pin several GB of HBM alive in a
# long --serve / track_sequence process that visits many meshes.
_MAX_BYTES = int(float(os.environ.get(
    "MESHFLOW_DEVCACHE_GB", "4.0")) * (1 << 30))


def enabled() -> bool:
    return os.environ.get("MESHFLOW_DEVCACHE", "1").strip() not in (
        "0", "off", "no")


def _entry_nbytes(value, _depth=0) -> int:
    """Best-effort byte accounting: walk containers / handle objects one
    structural layer at a time and sum ``.nbytes`` of array leaves. The
    handles cached here (BasisDevice, PatchLevel, ...) are plain
    dataclass-like objects whose fields are jax/numpy arrays."""
    if _depth > 4:
        return 0
    nb = getattr(value, "nbytes", None)
    if isinstance(nb, int):
        return nb
    if isinstance(value, dict):
        items = value.values()
    elif isinstance(value, (tuple, list)):
        items = value
    elif hasattr(value, "__dict__"):
        items = vars(value).values()
    else:
        return 0
    return sum(_entry_nbytes(v, _depth + 1) for v in items)


def get_or_build(key: tuple, build: Callable[[], Any]) -> Any:
    """Return the cached value for ``key`` or build+register it. ``key``
    must capture everything that shapes the value (artifact key, dtype,
    backend); a falsy key bypasses the cache entirely."""
    if not key or not enabled():
        return build()
    import jax

    key = (jax.default_backend(),) + tuple(key)
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    value = build()
    _CACHE[key] = value
    _SIZES[key] = _entry_nbytes(value)
    while len(_CACHE) > 1 and (
            len(_CACHE) > _MAX_ENTRIES
            or sum(_SIZES.values()) > _MAX_BYTES):
        old, _ = _CACHE.popitem(last=False)
        _SIZES.pop(old, None)
    return value


def total_bytes() -> int:
    return sum(_SIZES.values())


def clear() -> None:
    _CACHE.clear()
    _SIZES.clear()
