// Minimal glog shim: LOG/CHECK stream macros.
#pragma once
#include <cstdint>
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

inline int FLAGS_minloglevel = 0;
inline int FLAGS_stderrthreshold = 0;
inline bool FLAGS_logtostderr = true;
inline bool FLAGS_colorlogtostderr = false;
inline bool FLAGS_alsologtostderr = false;

namespace google {
inline void InitGoogleLogging(const char*) {}
inline void InstallFailureSignalHandler() {}

enum Severity { GLOG_INFO = 0, GLOG_WARNING = 1, GLOG_ERROR = 2,
                GLOG_FATAL = 3 };

class LogMessage {
 public:
  LogMessage(const char* file, int line, int sev) : sev_(sev) {
    ss_ << "[" << "IWEF"[sev] << " " << file << ":" << line << "] ";
  }
  std::ostringstream& stream() { return ss_; }
  ~LogMessage() noexcept(false) {
    if (sev_ >= FLAGS_minloglevel) std::cerr << ss_.str() << std::endl;
    if (sev_ >= GLOG_FATAL) std::abort();
  }

 private:
  std::ostringstream ss_;
  int sev_;
};
// swallow the stream when below the configured level is handled in dtor
struct Voidify {
  void operator&(std::ostream&) {}
};
}  // namespace google

#define IVLOG_INFO google::LogMessage(__FILE__, __LINE__, 0)
#define IVLOG_WARNING google::LogMessage(__FILE__, __LINE__, 1)
#define IVLOG_ERROR google::LogMessage(__FILE__, __LINE__, 2)
#define IVLOG_FATAL google::LogMessage(__FILE__, __LINE__, 3)
#define LOG(severity) IVLOG_##severity.stream()
#define LOG_IF(severity, cond) \
  if (!(cond)) {} else LOG(severity)
#define VLOG(n) IVLOG_INFO.stream()
#define DLOG(severity) LOG(severity)

// statement-form (works both with the stream LOG above and with
// torch/c10's if-prefixed LOG macro, which redefines LOG in TUs that
// include <torch/...> after this header)
#define CHECK(cond) \
  if (cond) {} else LOG(FATAL) << "Check failed: " #cond " "
#define CHECK_OP(a, b, op) \
  if ((a)op(b)) {} else LOG(FATAL) \
      << "Check failed: " #a " " #op " " #b " "
#define CHECK_EQ(a, b) CHECK_OP(a, b, ==)
#define CHECK_NE(a, b) CHECK_OP(a, b, !=)
#define CHECK_LT(a, b) CHECK_OP(a, b, <)
#define CHECK_LE(a, b) CHECK_OP(a, b, <=)
#define CHECK_GT(a, b) CHECK_OP(a, b, >)
#define CHECK_GE(a, b) CHECK_OP(a, b, >=)
#define CHECK_NOTNULL(p) (p)
