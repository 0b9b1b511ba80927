"""Build the host-side native extension:

    cd iv_slam_tpu/native && python setup.py build_ext --inplace

Output _ivslam_native.*.so is loaded lazily by iv_slam_tpu.native (with a
pure-NumPy fallback when absent).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="ivslam_native",
    ext_modules=[
        Extension(
            "_ivslam_native",
            sources=["src/ivslam_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
        )
    ],
)
