"""Raw binary vector dumps, byte-compatible with the reference
(Src/VectorIO.h:8-31: ``int size`` followed by the raw payload).

Used for Spectrum's ``eigenvector-%03d.bin`` files (Spectrum.cpp:191-195)
and the flow-field debug dumps (OpticalFlow.cpp:641-651).
"""

from __future__ import annotations

import struct

import numpy as np


def write_vector(path: str, data: np.ndarray, dtype=np.float64) -> None:
    """Write ``int32 count`` + raw elements. A (N, 2) array of 2-vectors is
    written as N records of 2 scalars (matching std::vector<Point2D<Real>>)."""
    arr = np.ascontiguousarray(np.asarray(data, dtype=dtype))
    count = arr.shape[0]
    with open(path, "wb") as f:
        f.write(struct.pack("<i", count))
        f.write(arr.tobytes())


def read_vector(path: str, dtype=np.float64, width: int = 1) -> np.ndarray:
    """Read a reference binary vector; returns (N,) or (N, width)."""
    with open(path, "rb") as f:
        (count,) = struct.unpack("<i", f.read(4))
        payload = np.frombuffer(f.read(), dtype=dtype)
    if width > 1:
        payload = payload.reshape(count, width)
    else:
        payload = payload[:count]
    return payload
