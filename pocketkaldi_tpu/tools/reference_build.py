"""Build the reference pocketkaldi binary for differential testing/benching.

The reference (mounted read-only at ``/root/reference``) is dependency-free
C++11 with an AVX2 GEMM kernel; autotools is unavailable in this image, so we
compile it directly with g++ into ``.cache/refbuild``.  Used by the
transcript-parity integration tests and by ``bench.py`` to self-measure the
baseline (the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

REFERENCE_SRC = os.environ.get("PKTPU_REFERENCE_SRC", "/root/reference")
DEFAULT_BUILD_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".cache", "refbuild")


def build_reference(build_dir: str = DEFAULT_BUILD_DIR) -> Optional[str]:
    """Compile the reference CLI; returns the binary path or None on failure."""
    binary = os.path.join(build_dir, "pocketkaldi")
    if os.path.exists(binary):
        return binary
    src = os.path.join(REFERENCE_SRC, "src")
    if not os.path.isdir(src) or shutil.which("g++") is None:
        return None
    os.makedirs(build_dir, exist_ok=True)
    build_src = os.path.join(build_dir, "src")
    if not os.path.isdir(build_src):
        shutil.copytree(src, build_src)
    # config.h is autotools-generated; only VERSION is consumed.
    with open(os.path.join(build_src, "config.h"), "w") as fd:
        fd.write('#define VERSION "0.0.1"\n')
    # cblas.h is #included but never called (SURVEY.md §2.4 dead code).
    open(os.path.join(build_dir, "cblas.h"), "w").close()
    sources = sorted(
        os.path.join(build_src, f) for f in os.listdir(build_src)
        if f.endswith(".cc"))
    cmd = ["g++", "-O2", "-std=c++11", "-fPIC", "-mavx2", "-mfma",
           "-I", build_dir, "-o", binary] + sources + ["-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return binary if os.path.exists(binary) else None


def run_reference(binary: str, conf_path: str, input_path: str,
                  timeout: float = 600.0):
    """Run the reference CLI; returns list of (filename, hyp, loglike) rows."""
    out = subprocess.run([binary, conf_path, input_path],
                         capture_output=True, text=True, timeout=timeout)
    if out.returncode != 0:
        raise RuntimeError(
            f"reference binary failed: {out.stdout} {out.stderr}")
    rows = []
    for line in out.stdout.strip().splitlines():
        parts = line.split("\t")
        if len(parts) == 3:
            rows.append((parts[0], parts[1], float(parts[2])))
    return rows
