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


# bump when packer.cc changes in any way that must invalidate an
# already-built .so (ABI or behavior — stale files from earlier versions
# are simply ignored and a fresh build is triggered)
ABI_VERSION = 3


def so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(native_dir(), f"_plbert_native_v{ABI_VERSION}{suffix}")


def build(verbose: bool = True) -> str:
    src = os.path.join(native_dir(), "packer.cc")
    out = so_path()
    # compile to a private temp name and rename into place: an
    # interrupted g++ (or two processes racing the build-on-first-import
    # path) must never leave a truncated .so at the final path — that
    # artifact would satisfy os.path.exists forever, fail exec_module,
    # and silently pin every later run to the slow numpy fallback
    tmp = f"{out}.tmp.{os.getpid()}"
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}",
        src, "-o", tmp,
    ]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out


if __name__ == "__main__":
    path = build()
    print(f"Built {path}")
    sys.exit(0)
