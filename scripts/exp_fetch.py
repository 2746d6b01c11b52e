"""On-chip experiment: does the tunneled d2h path parallelize across threads?

The halfway-output stage is dominated by ONE ~12.6 MB uint8 fetch measured
at ~4 MB/s end-to-end. If the tunnel client releases the GIL during device
-to-host copies and the transport multiplexes requests, fetching the image
as K concurrent row-band fetches could multiply effective bandwidth.

    python scripts/exp_fetch.py [--mb 12] [--parts 1 2 4 8] [--reps 3]

Prints one JSON line per (parts, rep) with MB/s; also times h2d for the
upload direction (texture uploads are the other transfer-bound init cost).
"""

import argparse
import concurrent.futures as cf
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=12.0)
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = int(args.mb * 1e6)
    host = np.arange(n, dtype=np.uint8)
    dev = jax.device_put(host)
    jax.block_until_ready(dev)
    # A same-size compute result (fetching a COMPUTED array is what the
    # output stage does; transfers of literals may take different paths).
    dev = jax.block_until_ready(dev + jnp.uint8(1))

    for parts in args.parts:
        bands = np.array_split(np.arange(n), parts)
        slices = [(int(b[0]), int(b[-1]) + 1) for b in bands]
        dev_parts = [jax.block_until_ready(dev[a:b]) for a, b in slices]
        for rep in range(args.reps):
            t0 = time.time()
            if parts == 1:
                out = np.asarray(dev_parts[0])
            else:
                with cf.ThreadPoolExecutor(max_workers=parts) as ex:
                    chunks = list(ex.map(np.asarray, dev_parts))
                out = np.concatenate(chunks)
            dt = time.time() - t0
            assert out.size == n
            print(json.dumps({"dir": "d2h", "parts": parts, "rep": rep,
                              "seconds": round(dt, 3),
                              "mb_per_s": round(n / 1e6 / dt, 2)}), flush=True)

    # Upload direction (init's texture_upload).
    for parts in args.parts:
        bands = np.array_split(host, parts)
        for rep in range(args.reps):
            t0 = time.time()
            if parts == 1:
                ds = [jax.device_put(host)]
            else:
                with cf.ThreadPoolExecutor(max_workers=parts) as ex:
                    ds = list(ex.map(jax.device_put, bands))
            for d in ds:
                jax.block_until_ready(d)
            dt = time.time() - t0
            print(json.dumps({"dir": "h2d", "parts": parts, "rep": rep,
                              "seconds": round(dt, 3),
                              "mb_per_s": round(n / 1e6 / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
