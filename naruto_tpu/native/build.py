"""Build the native C++ extensions with g++ (no pybind11 — plain C ABI via
ctypes). Builds are cached next to the sources; call ensure_built() from the
wrappers."""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parent

SOURCES = {
    "marching_tets": ["marching_tets.cpp"],
    "raycaster": ["raycaster.cpp"],
}

CXXFLAGS = ["-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
            "-fopenmp",
            # strict IEEE mul/add (no FMA contraction): the raycaster's
            # packet/SIMD/scalar paths must agree bit-for-bit (parity tests)
            # — measured free on the packet renderer (264 vs 296 ms ERP)
            "-ffp-contract=off"]


def lib_path(name: str) -> Path:
    return NATIVE_DIR / f"lib{name}.so"


def _dep_stamp(deps: list[Path]) -> str:
    import hashlib

    h = hashlib.sha256()
    for d in deps:
        if d.exists():
            h.update(d.read_bytes())
    return h.hexdigest()


def ensure_built(name: str, verbose: bool = False) -> str:
    srcs = [NATIVE_DIR / s for s in SOURCES[name]]
    out = lib_path(name)
    # Content-hash staleness check (mtimes are unreliable: a fresh git
    # checkout stamps every file with checkout time, which once shadowed a
    # source rewrite behind a stale committed binary). build.py itself
    # counts as a dep so CXXFLAGS changes rebuild.
    deps = srcs + [Path(__file__)]
    stamp_file = NATIVE_DIR / f".{name}.stamp"
    stamp = _dep_stamp(deps)
    if (out.exists() and stamp_file.exists()
            and stamp_file.read_text().strip() == stamp):
        return str(out)
    missing = [s for s in srcs if not s.exists()]
    if missing:
        raise FileNotFoundError(f"missing sources: {missing}")
    cmd = ["g++", *CXXFLAGS, "-o", str(out), *map(str, srcs)]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    stamp_file.write_text(stamp)
    return str(out)


if __name__ == "__main__":
    for name in SOURCES:
        try:
            print(name, "->", ensure_built(name, verbose=True))
        except FileNotFoundError as e:
            print(name, "skipped:", e)
