"""Generate the mid-size (256^2) texture-mode golden fixture (VERDICT r3 #5).

Reuses the committed closed-cube atlas mesh (tests/golden/cube.ply, one uv
chart per face in a 4x2 grid) with a NEW 256x256 blocky-noise texture pair
(16x16 uniform cells, seeds 11/12 — same construction as the 64^2 cA/cB at
4x the resolution), runs the rebuilt reference binary
(scripts/refbuild/build_reference.py -> /tmp/refOpticalFlow) at
--eLength 0.06, and writes:

    tests/golden/mA.png, mB.png      the input pair
    tests/golden/ref_cube256.png     the reference's aligned output

Then runs OUR pipeline (CPU, float64) on the same inputs and prints the
comparison so the test tolerance in tests/test_golden.py is grounded in a
measured value.

Usage: python scripts/make_golden_midsize.py [--ref /tmp/refOpticalFlow]
"""

import argparse
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden")
sys.path.insert(0, REPO)

SIZE = 256
CELL = 16
ELENGTH = "0.06"


def blocky(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cells = rng.integers(0, 256, size=(SIZE // CELL, SIZE // CELL, 3),
                         dtype=np.uint8)
    return np.repeat(np.repeat(cells, CELL, axis=0), CELL, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refOpticalFlow")
    args = ap.parse_args()
    if not os.path.exists(args.ref):
        sys.exit(f"reference binary missing at {args.ref}; run "
                 "scripts/refbuild/build_reference.py first")

    from PIL import Image
    pa, pb = os.path.join(GOLD, "mA.png"), os.path.join(GOLD, "mB.png")
    Image.fromarray(blocky(11)).save(pa)
    Image.fromarray(blocky(12)).save(pb)
    print(f"wrote {pa}, {pb}")

    ref_out = os.path.join(GOLD, "ref_cube256.png")
    t0 = time.time()
    subprocess.run([args.ref, "--mesh", os.path.join(GOLD, "cube.ply"),
                    "--in", pa, pb, "--out", ref_out,
                    "--eLength", ELENGTH], check=True)
    print(f"reference: {time.time() - t0:.1f} s -> {ref_out}")

    ours_out = "/tmp/ours_cube256.png"
    t0 = time.time()
    code = ("import sys; sys.path.insert(0, %r)\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_enable_x64', True)\n"
            "from meshopticalflow_tpu.apps.optical_flow import main\n"
            "sys.exit(main(%r))" % (REPO, [
                "--mesh", os.path.join(GOLD, "cube.ply"), "--in", pa, pb,
                "--out", ours_out, "--eLength", ELENGTH,
                "--dtype", "float64"]))
    subprocess.run([sys.executable, "-c", code],
                   env=dict(os.environ, JAX_PLATFORMS="cpu"), check=True)
    ours_s = time.time() - t0
    print(f"ours (CPU f64): {ours_s:.1f} s -> {ours_out}")

    ours = np.asarray(Image.open(ours_out).convert("RGB"), float)
    ref = np.asarray(Image.open(ref_out).convert("RGB"), float)
    rmse = float(np.sqrt(((ours - ref) ** 2).mean()))
    exact = float((ours == ref).all(-1).mean())
    within1 = float((np.abs(ours - ref) <= 1).all(-1).mean())
    print(f"rmse={rmse:.3f}/255 exact={exact:.4f} within1={within1:.4f} "
          f"ours_runtime={ours_s:.1f}s")


if __name__ == "__main__":
    main()
