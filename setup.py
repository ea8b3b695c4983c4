"""Build hook: compile the native serving runtime alongside the package.

The analogue of the reference's setup.py (CUDAExtension build, setup.py:20-49)
— here the only native piece is the C++ paged runtime (csrc/), built with
plain make into a shared library loaded via ctypes; the compute path is
JAX/Pallas and needs no build step.
"""

import pathlib
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        csrc = pathlib.Path(__file__).parent / "csrc"
        try:
            subprocess.run(["make", "-C", str(csrc)], check=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            print("WARNING: native runtime build failed; "
                  "the pure-Python fallback will be used")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
