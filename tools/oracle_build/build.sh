#!/bin/bash
# Oracle build of the reference (headless, shimmed deps) — see
# /root/repo/PARITY_ATE.md "Reference build" for the recipe this
# reconstructs. Incremental: object files are kept in /tmp/refbuild/obj.
set -e
SRC=/tmp/refbuild/src
SHIMS=/tmp/refbuild/shims
OBJ=/tmp/refbuild/obj
TORCH=/opt/venv/lib/python3.12/site-packages/torch
TF=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p $OBJ

INC="-I$SRC -I$SRC/include -I$SHIMS -I$TF -I/usr/include/opencv4 \
     -I$TORCH/include -I$TORCH/include/torch/csrc/api/include"
FLAGS="-std=c++17 -O1 -g0 -DCOMPILEDWITHC11 -D_GLIBCXX_USE_CXX11_ABI=1 \
       -Wno-deprecated-declarations -Wno-unused-variable -fPIC"

compile() {
  local f=$1
  local o=$OBJ/$(echo "$f" | sed "s|$SRC/||; s|/|_|g; s|\.[^.]*$|.o|")
  if [ "$o" -nt "$f" ]; then return; fi
  echo "CC $f"
  g++ $FLAGS $INC -c "$f" -o "$o"
}

for f in $(find $SRC/Thirdparty/g2o/g2o -name "*.cpp" | grep -v test); do
  compile "$f"
done
for f in $SRC/Thirdparty/DBoW2/DBoW2/*.cpp $SRC/Thirdparty/DBoW2/DUtils/*.cpp; do
  compile "$f"
done
for f in $SRC/src/*.cc $SRC/src/*.cpp; do
  compile "$f"
done
compile $SRC/Examples/Stereo/stereo_kitti.cc

echo "LINK stereo_kitti"
g++ $OBJ/*.o -o /tmp/refbuild/stereo_kitti \
  -L$TORCH/lib -ltorch -ltorch_cpu -lc10 \
  -Wl,-rpath,$TORCH/lib \
  -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_highgui \
  -lopencv_features2d -lopencv_calib3d -lopencv_video \
  -lpthread
echo DONE
