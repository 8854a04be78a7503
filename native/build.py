"""Build the native IO library into modem_tpu/_native/.

Usage: python native/build.py  (or let modem_tpu.io build it on first use).
No packaging machinery — one g++ invocation, loaded via ctypes.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "native" / "modemio.cpp"
OUT = ROOT / "modem_tpu" / "_native" / "libmodemio.so"


def build(force: bool = False) -> pathlib.Path:
    if OUT.exists() and not force:
        if OUT.stat().st_mtime >= SRC.stat().st_mtime:
            return OUT
    OUT.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(OUT),
        str(SRC),
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
