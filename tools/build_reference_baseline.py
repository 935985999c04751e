#!/usr/bin/env python3
"""Build the REFERENCE's CPU engine (pychain_C) for parity/baseline runs.

Compiles /root/reference/pytorch_binding/src (CPU path only; the CUDA
launchers are stubbed since they are only invoked when tensors are on
GPU) into /tmp/refbuild, OUTSIDE this repo.  No reference code is copied
into the repo; the artifact exists purely to (a) verify numerical parity
of pychain_tpu against the reference implementation and (b) measure the
reference's CPU throughput for BASELINE_MEASURED.json.

Usage: python tools/build_reference_baseline.py
Then:  tests/test_reference_parity.py auto-detects /tmp/refbuild.
"""

import os
import subprocess
import sys
import textwrap

BUILD_DIR = "/tmp/refbuild"
SRC = "/root/reference/pytorch_binding/src"

FAKE_CUDA_H = """\
// CPU-only build shim: minimal decls so the reference's CPU path compiles
// without the CUDA toolkit. Kernels are never launched when !cuda_.
#pragma once
struct dim3 { unsigned x, y, z; dim3(unsigned a=1,unsigned b=1,unsigned c=1):x(a),y(b),z(c){} };
"""

STUBS_CC = """\
// Stub launchers for CPU-only reference build (never called when !cuda_).
#include <cuda.h>
#include <cstdlib>
extern "C" {
void cuda_chain_hmm_forward(dim3, dim3, const int*, const int*, const float*,
                            const float*, float*, int, int, int, int, int, int) { abort(); }
void cuda_chain_hmm_backward(dim3, dim3, const int*, const int*, const float*,
                             const float*, const float*, float*, float*,
                             int, int, int, int, int, int) { abort(); }
void cuda_chain_hmm_log_domain_forward(dim3, dim3, const int*, const int*, const float*,
                            const float*, float*, int, int, int, int, int, int) { abort(); }
void cuda_chain_hmm_log_domain_backward(dim3, dim3, const int*, const int*, const float*,
                             const float*, const float*, float*, float*,
                             int, int, int, int, int, int) { abort(); }
}
"""

SETUP_PY = """\
from setuptools import setup
from torch.utils.cpp_extension import CppExtension, BuildExtension
SRC = "{src}"
setup(
    name="pychain_C_ref",
    ext_modules=[CppExtension(
        "pychain_C",
        [f"{{SRC}}/pychain.cc", f"{{SRC}}/chain-computation.cc",
         f"{{SRC}}/chain-log-domain-computation.cc", f"{{SRC}}/base.cc",
         "stubs.cc"],
        include_dirs=["{build}/fakecuda", SRC],
        extra_compile_args=["-O2", "-DNDEBUG"],
    )],
    cmdclass={{"build_ext": BuildExtension}},
)
"""


def main():
    os.makedirs(f"{BUILD_DIR}/fakecuda", exist_ok=True)
    with open(f"{BUILD_DIR}/fakecuda/cuda.h", "w") as f:
        f.write(FAKE_CUDA_H)
    with open(f"{BUILD_DIR}/fakecuda/cuda_runtime.h", "w") as f:
        f.write('#pragma once\n#include "cuda.h"\n')
    with open(f"{BUILD_DIR}/stubs.cc", "w") as f:
        f.write(STUBS_CC)
    with open(f"{BUILD_DIR}/setup.py", "w") as f:
        f.write(SETUP_PY.format(src=SRC, build=BUILD_DIR))
    subprocess.check_call(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=BUILD_DIR)
    print(f"built reference pychain_C into {BUILD_DIR}")


if __name__ == "__main__":
    main()
