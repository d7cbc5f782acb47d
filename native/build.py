"""Build the native video-ops extension in place.

Usage: python native/build.py
Produces video_ops_native.*.so next to this file; the data pipeline picks it
up automatically (with a pure-numpy fallback when absent).
"""
from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "video_ops.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, f"video_ops_native{ext}")
    include = sysconfig.get_path("include")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", f"-I{include}", src, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")


if __name__ == "__main__":
    build()
