"""Build hook: compile the native host library into the package tree.

The reference drives cmake+make from cargo (``/root/reference/build.rs:7-59``)
to produce the static ``panda-cuda`` lib; here a plain ``make`` in
``panda_tpu/native`` produces ``libpanda_host.so`` (the ``msm_host.cuh`` /
``field_host.cuh`` analog).  The build is best-effort: without a C++
toolchain the package still installs and falls back to the pure-Python
reference path (``panda_tpu/interop/native.py``).
"""

import pathlib
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class BuildWithNative(build_py):
    def run(self):
        native = pathlib.Path(__file__).parent / "panda_tpu" / "native"
        try:
            subprocess.run(["make", "-C", str(native)], check=True)
        except Exception as e:          # toolchain-less install still works
            print(f"warning: native lib build skipped ({e})")
        super().run()


class BinaryDistribution(Distribution):
    """The wheel ships a compiled libpanda_host.so via package-data but has
    no ext_modules, so setuptools would tag it py3-none-any — and a wheel
    built here would silently carry a wrong .so to another platform.
    Forcing has_ext_modules gives the wheel a platform tag."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": BuildWithNative}, distclass=BinaryDistribution)
