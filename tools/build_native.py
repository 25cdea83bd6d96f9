#!/usr/bin/env python
"""Build the native data-ingest extension (native/jpeg_loader.cpp) into
src/flowerdiff/native/libflowerjpeg.so with g++ directly (no pybind11 in
this environment; the .so exposes a C ABI consumed via ctypes)."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "jpeg_loader.cpp")
OUT_DIR = os.path.join(ROOT, "src", "flowerdiff", "native")
OUT = os.path.join(OUT_DIR, "libflowerjpeg.so")


def build() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", OUT, SRC, "-ljpeg", "-lpthread",
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {OUT}")
    return OUT


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
