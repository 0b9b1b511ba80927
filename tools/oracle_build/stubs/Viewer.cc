// Headless no-op Viewer (Pangolin-free oracle build).
#include "Viewer.h"

namespace ORB_SLAM2 {

Viewer::Viewer(System* pSystem, FrameDrawer* pFrameDrawer,
               MapDrawer* pMapDrawer, Tracking* pTracking,
               const string& strSettingPath)
    : mpSystem(pSystem),
      mpFrameDrawer(pFrameDrawer),
      mpMapDrawer(pMapDrawer),
      mpTracker(pTracking),
      mT(33.0),
      mbFinishRequested(false),
      mbFinished(true),
      mbStopped(true),
      mbStopRequested(false) {}

void Viewer::Run() {
  {
    std::unique_lock<std::mutex> lock(mMutexFinish);
    mbFinished = false;
  }
  {
    std::unique_lock<std::mutex> lock(mMutexStop);
    mbStopped = false;
  }
  SetFinish();
}

void Viewer::RequestFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  mbFinishRequested = true;
}

bool Viewer::CheckFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  return mbFinishRequested;
}

void Viewer::SetFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  mbFinished = true;
}

bool Viewer::isFinished() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  return mbFinished;
}

void Viewer::RequestStop() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  if (!mbStopped) mbStopRequested = true;
}

bool Viewer::isStopped() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  return mbStopped;
}

bool Viewer::Stop() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  std::unique_lock<std::mutex> lock2(mMutexFinish);
  if (mbFinishRequested) return false;
  if (mbStopRequested) {
    mbStopped = true;
    mbStopRequested = false;
    return true;
  }
  return false;
}

void Viewer::Release() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  mbStopped = false;
}

}  // namespace ORB_SLAM2
