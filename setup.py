"""Build hook: compile the native C++ runtime into the wheel.

The runtime (native/dvbt2_runtime.cc — BB-frame parser + SPSC IQ ring) is
a single translation unit with a plain C ABI consumed via ctypes, so the
"extension" build is one g++ invocation; the resulting shared library is
shipped as package data at sdr_receiver_dvb_t2_tpu/_native/ where
io/native.py looks first (falling back to the repo-checkout native/ dir,
then to building from source on demand).
"""
import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        root = Path(__file__).resolve().parent
        src = root / "native" / "dvbt2_runtime.cc"
        out_dir = Path(self.build_lib) / "sdr_receiver_dvb_t2_tpu" / "_native"
        out_dir.mkdir(parents=True, exist_ok=True)
        out = out_dir / "libdvbt2_runtime.so"
        cxx = shutil.which("g++") or shutil.which("c++")
        if cxx is None:
            raise RuntimeError("a C++ compiler is required to build the "
                               "native runtime (g++/c++ not found)")
        subprocess.run([cxx, "-O2", "-shared", "-fPIC", "-std=c++17",
                        str(src), "-o", str(out)], check=True)


setup(cmdclass={"build_py": BuildWithNative})
