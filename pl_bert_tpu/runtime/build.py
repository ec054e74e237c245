"""Build the native extension: ``python -m pl_bert_tpu.runtime.build``.

Compiles runtime/native/packer.cc into ``_plbert_native`` next to this
package with the system compiler (no pybind11/setuptools needed).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")


# bump when the C ABI of packer.cc changes (stale .so files from earlier
# ABIs are simply ignored and a fresh build is triggered)
ABI_VERSION = 2


def so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(native_dir(), f"_plbert_native_v{ABI_VERSION}{suffix}")


def build(verbose: bool = True) -> str:
    src = os.path.join(native_dir(), "packer.cc")
    out = so_path()
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}",
        src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"Built {path}")
    sys.exit(0)
