"""Build hooks: compile the native host runtime into the wheel.

The package is pure Python + JAX except for the optional host serving
library (native/eet_native.cpp — scene evaluation, polyline generation,
picking at UI rates; see ephemeris_explorer_tpu/native.py).  Building a
wheel on a box with a C++ toolchain embeds the prebuilt shared object as
``ephemeris_explorer_tpu/_eet_native.so``, so installing the WHEEL needs
no compiler (the reference ships release binaries the same way,
.github/workflows/release.yaml).  The extension is marked optional: a
source install without a toolchain still succeeds and every native entry
point has a pure-Python fallback.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CTypesExtension(Extension):
    """A plain shared library loaded via ctypes (no Python C API)."""


class build_ext_ctypes(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CTypesExtension):
            return ext.export_symbols
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        if "_eet_native" in ext_name or "_eet_ddtruth" in ext_name:
            # fixed name (no ABI tag): ctypes.CDLL finds it on any Python
            return ext_name.replace(".", "/") + ".so"
        return super().get_ext_filename(ext_name)


setup(
    ext_modules=[
        CTypesExtension(
            "ephemeris_explorer_tpu._eet_native",
            sources=["native/eet_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fvisibility=default"],
            # no -march=native in the packaged artifact: wheels must run on
            # any host of the platform tag (the dev first-use build in
            # native.py keeps -march=native for the local checkout)
            libraries=["pthread"],
            optional=True,
        ),
        CTypesExtension(
            "ephemeris_explorer_tpu._eet_ddtruth",
            sources=["native/eet_ddtruth.cpp"],
            # -ffp-contract=off is load-bearing: the dd truth's error-free
            # transforms break under FMA contraction.  ddtruth_native.py
            # verifies bitwise equality with the numpy twin at load time
            # and rejects a mis-built library.
            extra_compile_args=[
                "-O3", "-std=c++17", "-ffp-contract=off", "-fno-math-errno",
                "-fvisibility=default",
            ],
            libraries=["pthread"],
            optional=True,
        ),
    ],
    cmdclass={"build_ext": build_ext_ctypes},
)
