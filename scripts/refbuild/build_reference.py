"""Rebuild the reference OpticalFlow binary headless for parity testing.

The golden fixtures in tests/golden/ and the 2K/4K baseline rows in
BASELINE.md were produced by the reference binary compiled from
/root/reference with g++ on this machine. The reference is 2015-era
MSVC-leaning C++ with a GLUT GUI; building it headless on a modern
toolchain needs (a) no-op GL/GLUT stub headers (scripts/refbuild/stub/ —
the --out path never executes a GL call, OpticalFlow.cpp:1072-1092) and
(b) six mechanical compile fixes applied here as source patches:

  * OpticalFlow.cpp getWhitneyError/getWhitneySymmetricError reference a
    member `eFlowField` that does not exist (dead code, never called —
    SURVEY 2.9); g++ two-phase lookup still needs a name, so a null alias
    is injected.
  * Misha/PNG.inl reads info_ptr->palette directly — opaque in
    libpng >= 1.5; replaced with png_get_PLTE.
  * Whitney/Conformal/Connection.inl use inherited dependent members
    without qualification (MSVC accepts, two-phase lookup does not):
    `using VectorField<Real>::...` declarations injected after `public:`.
  * Src/VectorField.h prints through a `Verbose` flag declared in the app
    TU; an extern declaration is injected.
  * Src/VectorIO.h uses a backslash include path.

Usage:
    python scripts/refbuild/build_reference.py [--out /tmp/refOpticalFlow]

Writes the binary to --out (default /tmp/refOpticalFlow) and verifies it
reproduces tests/golden/ref_vertex.ply on the committed sphere pair.
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF = "/root/reference"

_USING = ("\tusing VectorField<Real>::coeffs;\n"
          "\tusing VectorField<Real>::smoothOperator;\n"
          "\tusing VectorField<Real>::prolongationOperator;\n"
          "\tusing VectorField<Real>::restrictionOperator;\n")

_DEAD = ("\t\tstd::vector<Real>& eFlowField = *(std::vector<Real>*)nullptr;"
         " // dead code (never called)\n")

PATCHES = {
    "OpticalFlow/OpticalFlow.cpp": [
        ("\tReal getWhitneyError(void)\n\t{\n",
         "\tReal getWhitneyError(void)\n\t{\n" + _DEAD),
        ("\tReal getWhitneySymmetricError(void)\n\t{\n",
         "\tReal getWhitneySymmetricError(void)\n\t{\n" + _DEAD),
    ],
    "include/Misha/PNG.inl": [
        ("png_color clr=info_ptr->palette[*buf++];",
         "png_colorp _plte; int _nplte; "
         "png_get_PLTE(png_ptr, info_ptr, &_plte, &_nplte);\n"
         "\t\t\t\t\t\tpng_color clr=_plte[*buf++];"),
    ],
    "include/Src/Whitney.inl": [
        ("class WhitneyVectorField : public VectorField<Real> {\npublic:\n",
         "class WhitneyVectorField : public VectorField<Real> {\npublic:\n"
         + _USING),
    ],
    "include/Src/Conformal.inl": [
        ("class ConformalVectorField : public VectorField<Real> {\npublic:\n",
         "class ConformalVectorField : public VectorField<Real> {\npublic:\n"
         + _USING),
    ],
    "include/Src/Connection.inl": [
        ("class ConnectionVectorField : public VectorField<Real> {\npublic:\n",
         "class ConnectionVectorField : public VectorField<Real> {\npublic:\n"
         + _USING),
    ],
    "include/Src/VectorField.h": [
        ("#include <Misha/LinearSolvers.h>\n",
         "#include <Misha/LinearSolvers.h>\n"
         "#include <Misha/CmdLineParser.h>\n"
         "extern cmdLineReadable Verbose;\n"),
    ],
    "include/Src/VectorIO.h": [
        ("#include<Misha\\Image.h>", "#include<Misha/Image.h>"),
    ],
}

CXXFLAGS = ("-O3 -DRELEASE -funroll-loops -ffast-math -DNDEBUG -fpermissive "
            "-fopenmp -Wno-deprecated -Wno-unused-result -Wno-format "
            "-msse2 -std=c++14").split()
LIBS = ["-lgomp", "-lz", "-lpng"]


def build(out_path: str) -> None:
    with tempfile.TemporaryDirectory(prefix="refbuild_") as bld:
        src = os.path.join(bld, "src")
        shutil.copytree(os.path.join(REF, "include"),
                        os.path.join(src, "include"))
        os.makedirs(os.path.join(src, "OpticalFlow"))
        shutil.copy(os.path.join(REF, "OpticalFlow", "OpticalFlow.cpp"),
                    os.path.join(src, "OpticalFlow", "OpticalFlow.cpp"))
        for rel, subs in PATCHES.items():
            p = os.path.join(src, rel)
            with open(p, newline="") as f:
                text = f.read()
            for old, new in subs:
                # The vendored sources use \r\n; patch both line conventions.
                if old in text:
                    text = text.replace(old, new)
                elif old.replace("\n", "\r\n") in text:
                    text = text.replace(old.replace("\n", "\r\n"),
                                        new.replace("\n", "\r\n"))
                else:
                    raise SystemExit(f"patch anchor not found in {rel}: {old!r}")
            with open(p, "w", newline="") as f:
                f.write(text)
        cmd = (["g++"] + CXXFLAGS
               + ["-I", os.path.join(HERE, "stub"),
                  "-I", os.path.join(src, "include"),
                  os.path.join(src, "OpticalFlow", "OpticalFlow.cpp"),
                  "-o", out_path] + LIBS)
        print("[refbuild]", " ".join(cmd))
        subprocess.run(cmd, check=True)


def verify(out_path: str) -> None:
    gold = os.path.join(REPO, "tests", "golden")
    with tempfile.TemporaryDirectory(prefix="refverify_") as tmp:
        out = os.path.join(tmp, "out.ply")
        subprocess.run([out_path, "--in", os.path.join(gold, "a.ply"),
                        os.path.join(gold, "b.ply"), "--out", out],
                       check=True, timeout=600)
        ref = open(os.path.join(gold, "ref_vertex.ply"), "rb").read()
        ours = open(out, "rb").read()
        if ref != ours:
            raise SystemExit("rebuilt binary does NOT reproduce "
                             "tests/golden/ref_vertex.ply")
    print("[refbuild] verified: reproduces tests/golden/ref_vertex.ply")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/refOpticalFlow")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args()
    build(args.out)
    if not args.no_verify:
        verify(args.out)
    print(f"[refbuild] binary at {args.out}")


if __name__ == "__main__":
    sys.exit(main())
