// Minimal gflags shim: DEFINE_*/DECLARE_* + command-line parsing.
#pragma once
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>

namespace gflags_shim {
enum Type { T_BOOL, T_INT32, T_INT64, T_DOUBLE, T_STRING };
struct Reg {
  Type type;
  void* ptr;
};
inline std::map<std::string, Reg>& registry() {
  static std::map<std::string, Reg> r;
  return r;
}
inline std::map<std::string, bool>& set_flags() {
  static std::map<std::string, bool> s;
  return s;
}
struct Registrar {
  Registrar(const char* name, Type t, void* p) {
    registry()[name] = Reg{t, p};
  }
};
inline void parse(int* argc, char*** argv) {
  int out = 1;
  for (int i = 1; i < *argc; ++i) {
    char* a = (*argv)[i];
    if (std::strncmp(a, "--", 2) != 0) {
      (*argv)[out++] = a;
      continue;
    }
    std::string body = a + 2;
    std::string name = body, val;
    bool has_val = false;
    size_t eq = body.find('=');
    if (eq != std::string::npos) {
      name = body.substr(0, eq);
      val = body.substr(eq + 1);
      has_val = true;
    }
    bool neg = false;
    if (!has_val && name.rfind("no", 0) == 0 &&
        registry().count(name.substr(2))) {
      name = name.substr(2);
      neg = true;
    }
    auto it = registry().find(name);
    if (it == registry().end()) {
      (*argv)[out++] = a;
      continue;
    }
    set_flags()[name] = true;
    Reg& r = it->second;
    switch (r.type) {
      case T_BOOL:
        *(bool*)r.ptr = neg ? false
                            : (!has_val || val == "true" || val == "1");
        break;
      case T_INT32:
        if (!has_val && i + 1 < *argc) val = (*argv)[++i];
        *(int32_t*)r.ptr = std::atoi(val.c_str());
        break;
      case T_INT64:
        if (!has_val && i + 1 < *argc) val = (*argv)[++i];
        *(int64_t*)r.ptr = std::atoll(val.c_str());
        break;
      case T_DOUBLE:
        if (!has_val && i + 1 < *argc) val = (*argv)[++i];
        *(double*)r.ptr = std::atof(val.c_str());
        break;
      case T_STRING:
        if (!has_val && i + 1 < *argc) val = (*argv)[++i];
        *(std::string*)r.ptr = val;
        break;
    }
  }
  *argc = out;
}
}  // namespace gflags_shim

#define DEFINE_bool(name, def, txt)                          \
  bool FLAGS_##name = def;                                   \
  static gflags_shim::Registrar reg_##name(#name, gflags_shim::T_BOOL, \
                                           &FLAGS_##name)
#define DEFINE_int32(name, def, txt)                          \
  int32_t FLAGS_##name = def;                                 \
  static gflags_shim::Registrar reg_##name(#name, gflags_shim::T_INT32, \
                                           &FLAGS_##name)
#define DEFINE_int64(name, def, txt)                          \
  int64_t FLAGS_##name = def;                                 \
  static gflags_shim::Registrar reg_##name(#name, gflags_shim::T_INT64, \
                                           &FLAGS_##name)
#define DEFINE_double(name, def, txt)                          \
  double FLAGS_##name = def;                                   \
  static gflags_shim::Registrar reg_##name(#name, gflags_shim::T_DOUBLE, \
                                           &FLAGS_##name)
#define DEFINE_string(name, def, txt)                          \
  std::string FLAGS_##name = def;                              \
  static gflags_shim::Registrar reg_##name(#name, gflags_shim::T_STRING, \
                                           &FLAGS_##name)
#define DECLARE_bool(name) extern bool FLAGS_##name
#define DECLARE_int32(name) extern int32_t FLAGS_##name
#define DECLARE_int64(name) extern int64_t FLAGS_##name
#define DECLARE_double(name) extern double FLAGS_##name
#define DECLARE_string(name) extern std::string FLAGS_##name

inline bool FLAGS_help = false;

namespace google {
inline void ParseCommandLineFlags(int* argc, char*** argv, bool) {
  gflags_shim::parse(argc, argv);
}
inline void ParseCommandLineNonHelpFlags(int* argc, char*** argv, bool) {
  gflags_shim::parse(argc, argv);
}
inline void SetUsageMessage(const std::string&) {}
inline void ShowUsageWithFlags(const char*) {}
inline void ShowUsageWithFlagsRestrict(const char*, const char*) {}
struct CommandLineFlagInfo {
  bool is_default;
};
inline CommandLineFlagInfo GetCommandLineFlagInfoOrDie(const char* name) {
  return CommandLineFlagInfo{!gflags_shim::set_flags().count(name)};
}
}  // namespace google
namespace gflags = google;
