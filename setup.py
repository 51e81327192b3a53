"""Build hook: compile the native host runtime during packaging.

The library (runtime/limg_runtime.cpp -> liblimg_runtime.so) is host-side
C++ with no Python API surface (it is loaded via ctypes), so it is built
with a plain g++ invocation rather than an Extension, and shipped as
package data. limg_tpu.native also auto-builds it on first import from a
source checkout, so this hook mainly serves wheel builds.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithRuntime(build_py):
    def run(self):
        root = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(root, "runtime", "limg_runtime.cpp")
        out = os.path.join(root, "limg_tpu", "liblimg_runtime.so")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-march=native", src, "-o", out, "-lpthread"],
                    check=True,
                )
            except Exception as e:  # the package works without it
                print(f"warning: native runtime build skipped: {e}")
        super().run()


setup(cmdclass={"build_py": BuildPyWithRuntime})
