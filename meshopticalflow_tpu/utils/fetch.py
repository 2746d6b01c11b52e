"""Device-to-host transfer helpers for the tunneled runtime.

The output stage of the alignment pipeline ends in ONE ~12.5 MB uint8
device-to-host fetch (flow/pipeline.py halfway_texture), measured at only
a few MB/s end-to-end over the tunneled axon transport. If the transport
multiplexes concurrent requests (probed on chip by scripts/exp_fetch.py),
splitting the array into K row bands and fetching them from a thread pool
multiplies effective bandwidth; if it does not, parallel fetching only adds
overhead. The parallelism degree therefore defaults to 1 (identical to a
plain ``np.asarray``) and is raised via ``MESHFLOW_FETCH_PARTS`` once the
probe justifies it on a given deployment.

This is host-side I/O orchestration — the analog of nothing in the
reference (its output path is an in-process memcpy, OpticalFlow.cpp:112-178);
it exists purely because the rebuild's device is remote.
"""

from __future__ import annotations

import concurrent.futures as _cf
import os

import numpy as np


def fetch_parts() -> int:
    """Configured d2h fetch parallelism (MESHFLOW_FETCH_PARTS, default 1)."""
    try:
        return max(1, int(os.environ.get("MESHFLOW_FETCH_PARTS", "1")))
    except ValueError:
        return 1


def fetch(arr, parts: int | None = None) -> np.ndarray:
    """Fetch a device array to host, optionally as ``parts`` concurrent
    leading-axis band fetches. Bit-identical to ``np.asarray(arr)``.

    Band slicing happens on device (cheap contiguous views for a
    leading-axis split); the per-band ``np.asarray`` calls run in a thread
    pool so the transport can overlap them. Falls back to one fetch when
    the array is too small or has no leading axis to split.
    """
    if parts is None:
        parts = fetch_parts()
    n = int(arr.shape[0]) if getattr(arr, "ndim", 0) else 0
    if parts <= 1 or n < 2 * parts or arr.size * arr.dtype.itemsize < 1 << 20:
        return np.asarray(arr)
    import jax

    bounds = np.linspace(0, n, parts + 1).astype(int)
    bands = [arr[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    jax.block_until_ready(bands)
    with _cf.ThreadPoolExecutor(max_workers=parts) as ex:
        chunks = list(ex.map(np.asarray, bands))
    return np.concatenate(chunks, axis=0)
