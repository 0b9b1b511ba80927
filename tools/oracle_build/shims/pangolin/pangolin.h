// Pangolin stub: just the types the headless build's headers mention.
#pragma once
#include <cstring>

namespace pangolin {
struct OpenGlMatrix {
  double m[16];
  OpenGlMatrix() { SetIdentity(); }
  void SetIdentity() {
    std::memset(m, 0, sizeof(m));
    m[0] = m[5] = m[10] = m[15] = 1.0;
  }
};
inline void DestroyWindow(const char*) {}
}  // namespace pangolin
