"""Build the host-side native extensions:

    cd iv_slam_tpu/native && python setup.py build_ext --inplace

Outputs:
  _ivslam_native.*.so — vocab parser, tree descent, popcount (no deps)
  _ivslam_io.*.so     — async stereo image loader (needs OpenCV C++ dev
                        headers; skipped automatically when absent)

Both are loaded lazily (iv_slam_tpu.native, iv_slam_tpu.io.prefetch) with
pure-Python fallbacks when a .so is missing.
"""

import os

import numpy as np
from setuptools import Extension, setup

ext_modules = [
    Extension(
        "_ivslam_native",
        sources=["src/ivslam_native.cpp"],
        include_dirs=[np.get_include()],
        extra_compile_args=["-O3", "-std=c++17", "-march=native"],
    )
]

_CV_INC = "/usr/include/opencv4"
if os.path.isdir(_CV_INC):
    ext_modules.append(
        Extension(
            "_ivslam_io",
            sources=["src/ivslam_io.cpp"],
            include_dirs=[np.get_include(), _CV_INC],
            libraries=["opencv_core", "opencv_imgcodecs", "opencv_imgproc"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
        )
    )
else:
    print("OpenCV dev headers not found; skipping _ivslam_io "
          "(iv_slam_tpu.io.prefetch falls back to Python threads)")

setup(name="ivslam_native", ext_modules=ext_modules)
