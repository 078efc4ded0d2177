"""Build hook: compiles the native host runtime (csrc/host_ops.cpp) into
seismic_bpmf_tpu/lib/libhost_ops.so at build time.  The package degrades to
NumPy fallbacks when the library is absent, so failure here is non-fatal."""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(["make", "-C", "csrc"], check=True)
        except Exception as e:  # pragma: no cover
            print(f"warning: native host runtime build failed ({e}); "
                  "NumPy fallbacks will be used", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative},
      package_data={"seismic_bpmf_tpu": ["lib/*.so"]})
