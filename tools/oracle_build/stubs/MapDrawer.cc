// Headless no-op MapDrawer (Pangolin-free oracle build).
#include "MapDrawer.h"

#include <gflags/gflags.h>

DEFINE_bool(map_drawer_visualize_gt_pose, false,
            "Visualize ground truth camera pose if available.");

namespace ORB_SLAM2 {

MapDrawer::MapDrawer(Map* pMap, const string&) : mpMap(pMap) {}

void MapDrawer::DrawMapPoints() {}
void MapDrawer::DrawKeyFrames(const bool, const bool) {}
void MapDrawer::DrawCurrentCamera(pangolin::OpenGlMatrix&) {}
void MapDrawer::DrawCurrentCameraGT() {}

void MapDrawer::SetCurrentCameraPose(const cv::Mat& Tcw) {
  std::unique_lock<std::mutex> lock(mMutexCamera);
  mCameraPose = Tcw.clone();
  mbGTPoseAvailable = false;
}

void MapDrawer::SetCurrentCameraPose(const cv::Mat& Tcw,
                                     const std::string& strFrameName) {
  SetCurrentCameraPose(Tcw);
  mstrFrameName = strFrameName;
}

void MapDrawer::SetCurrentCameraPosewithGT(const cv::Mat& Tcw,
                                           const cv::Mat& Twc_gt,
                                           const std::string& strFrameName) {
  std::unique_lock<std::mutex> lock(mMutexCamera);
  mCameraPose = Tcw.clone();
  mTwc_gt = Twc_gt.clone();
  mbGTPoseAvailable = true;
  mstrFrameName = strFrameName;
}

void MapDrawer::SetReferenceKeyFrame(KeyFrame*) {}

void MapDrawer::GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix& M) {
  M.SetIdentity();
}

void MapDrawer::ConverT2OpenGLCameraMatrix(const cv::Mat&,
                                           pangolin::OpenGlMatrix& M) {
  M.SetIdentity();
}

cv::Mat MapDrawer::CalculateRelativeTransform(const cv::Mat& dest_frame_pose,
                                              const cv::Mat& src_frame_pose) {
  return dest_frame_pose * CalculateInverseTransform(src_frame_pose);
}

cv::Mat MapDrawer::CalculateInverseTransform(const cv::Mat& transform) {
  cv::Mat R = transform.rowRange(0, 3).colRange(0, 3);
  cv::Mat t = transform.rowRange(0, 3).col(3);
  cv::Mat inv = cv::Mat::eye(4, 4, transform.type());
  cv::Mat Rt = R.t();
  Rt.copyTo(inv.rowRange(0, 3).colRange(0, 3));
  cv::Mat tinv = -Rt * t;
  tinv.copyTo(inv.rowRange(0, 3).col(3));
  return inv;
}

}  // namespace ORB_SLAM2
