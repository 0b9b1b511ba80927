#!/bin/bash
# Reconstruct the reference-oracle build tree at /tmp/refbuild
# (PARITY_ATE.md "Reference build"): copy the reference, apply the two
# comparability patches + portability patches, install the shim headers
# and Pangolin-free Viewer/MapDrawer stubs, then run build.sh.
#
#   bash tools/oracle_build/setup.sh && bash /tmp/refbuild/build.sh
#   python tools/parity_iv.py --work /tmp/parity_iv \
#       --reference_bin /tmp/refbuild/stereo_kitti
set -e
HERE=$(dirname "$(readlink -f "$0")")
mkdir -p /tmp/refbuild
cp -r "$HERE/shims" /tmp/refbuild/
cp "$HERE/build.sh" /tmp/refbuild/
rm -rf /tmp/refbuild/src
cp -r /root/reference/introspective_ORB_SLAM /tmp/refbuild/src
cd /tmp/refbuild/src
# portability patches (see PARITY_ATE.md)
sed -i 's/bool mnFullBAIdx;/int mnFullBAIdx;/' include/LoopClosing.h
sed -i 's/Eigen::aligned_allocator<std::pair<const KeyFrame\*, g2o::Sim3> >/Eigen::aligned_allocator<std::pair<KeyFrame* const, g2o::Sim3> >/' include/LoopClosing.h
sed -e 's/#cmakedefine G2O_OPENMP 1//' -e 's/#cmakedefine G2O_SHARED_LIBS 1//' \
    Thirdparty/g2o/config.h.in > Thirdparty/g2o/config.h
# comparability patches (heatmaps on every frame; per-keypoint err dump)
sed -i 's/const float kMinBadMatchPercent_ = 5.0;/const float kMinBadMatchPercent_ = -1.0;/' include/feature_evaluator.h
sed -i 's/const bool mbEnforceSupervisedFeatureEval = false;/const bool mbEnforceSupervisedFeatureEval = true;/' include/Tracking.h
# Pangolin-free stubs
cp "$HERE/stubs/Viewer.cc" src/Viewer.cc
cp "$HERE/stubs/MapDrawer.cc" src/MapDrawer.cc
echo "setup done: bash /tmp/refbuild/build.sh"
