"""Build the native shared-memory cache library with g++.

Invoked lazily by hulc_tpu.data.shm_store on first use; the .so lands next
to this file. No external build deps beyond a C++17 compiler.
"""

from __future__ import annotations

import pathlib
import subprocess

NATIVE_DIR = pathlib.Path(__file__).parent
LIB_PATH = NATIVE_DIR / "libhulc_shm.so"
SRC_PATH = NATIVE_DIR / "shm_cache.cpp"


def build(force: bool = False) -> pathlib.Path:
    if LIB_PATH.exists() and not force:
        if LIB_PATH.stat().st_mtime >= SRC_PATH.stat().st_mtime:
            return LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(SRC_PATH), "-o", str(LIB_PATH), "-lrt",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
