"""Build the native fastpack shared library with g++.

Usage: python -m pace_tpu._native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "fastpack.cpp")
LIB = os.path.join(HERE, "libfastpack.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        SRC, "-o", LIB,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    sys.exit(0)
