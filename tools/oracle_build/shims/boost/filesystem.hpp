// Minimal boost::filesystem shim over POSIX/std::filesystem.
#pragma once
#include <filesystem>
#include <string>

namespace boost {
namespace filesystem {

class path {
 public:
  path() {}
  path(const char* s) : p_(s) {}
  path(const std::string& s) : p_(s) {}
  const std::filesystem::path& std_path() const { return p_; }
  std::string string() const { return p_.string(); }

 private:
  std::filesystem::path p_;
};

inline bool exists(const path& p) {
  std::error_code ec;
  return std::filesystem::exists(p.std_path(), ec);
}
inline bool create_directory(const path& p) {
  std::error_code ec;
  std::filesystem::create_directories(p.std_path(), ec);
  return std::filesystem::exists(p.std_path());
}
inline std::uintmax_t remove_all(const path& p) {
  std::error_code ec;
  return std::filesystem::remove_all(p.std_path(), ec);
}

}  // namespace filesystem
}  // namespace boost
