// Minimal jsoncpp shim: the Json::Value subset the dataset writers use
// (object[], array append, numeric/string leaves, operator<< to valid
// JSON consumed by python json.load).
#pragma once
#include <map>
#include <memory>
#include <ostream>
#include <sstream>
#include <string>
#include <vector>

namespace Json {

class Value {
 public:
  enum Kind { NUL, OBJ, ARR, NUM, STR, BOOL };
  Value() : kind_(NUL) {}
  Value(double v) : kind_(NUM), num_(v) {}
  Value(float v) : kind_(NUM), num_(v) {}
  Value(int v) : kind_(NUM), num_(v) {}
  Value(unsigned v) : kind_(NUM), num_(v) {}
  Value(long v) : kind_(NUM), num_(double(v)) {}
  Value(unsigned long v) : kind_(NUM), num_(double(v)) {}
  Value(bool v) : kind_(BOOL), num_(v ? 1 : 0) {}
  Value(const char* s) : kind_(STR), str_(s) {}
  Value(const std::string& s) : kind_(STR), str_(s) {}

  Value& operator[](const char* key) { return (*this)[std::string(key)]; }
  Value& operator[](const std::string& key) {
    kind_ = OBJ;
    for (auto& kv : obj_)
      if (kv.first == key) return *kv.second;
    obj_.emplace_back(key, std::make_shared<Value>());
    return *obj_.back().second;
  }
  Value& append(const Value& v) {
    kind_ = ARR;
    arr_.push_back(std::make_shared<Value>(v));
    return *arr_.back();
  }
  bool empty() const { return obj_.empty() && arr_.empty() && kind_ == NUL; }
  unsigned size() const {
    return kind_ == ARR ? arr_.size() : obj_.size();
  }
  void clear() {
    obj_.clear();
    arr_.clear();
    kind_ = NUL;
  }

  void write(std::ostream& os) const {
    switch (kind_) {
      case NUL:
        os << "null";
        break;
      case BOOL:
        os << (num_ != 0 ? "true" : "false");
        break;
      case NUM: {
        std::ostringstream ss;
        ss.precision(17);
        ss << num_;
        std::string s = ss.str();
        if (s == "nan" || s == "-nan" || s == "inf" || s == "-inf")
          s = "null";
        os << s;
        break;
      }
      case STR:
        os << '"';
        for (char c : str_) {
          if (c == '"' || c == '\\') os << '\\';
          os << c;
        }
        os << '"';
        break;
      case ARR: {
        os << '[';
        bool first = true;
        for (auto& v : arr_) {
          if (!first) os << ',';
          first = false;
          v->write(os);
        }
        os << ']';
        break;
      }
      case OBJ: {
        os << '{';
        bool first = true;
        for (auto& kv : obj_) {
          if (!first) os << ',';
          first = false;
          os << '"' << kv.first << "\":";
          kv.second->write(os);
        }
        os << '}';
        break;
      }
    }
  }

 private:
  Kind kind_;
  double num_ = 0;
  std::string str_;
  std::vector<std::pair<std::string, std::shared_ptr<Value>>> obj_;
  std::vector<std::shared_ptr<Value>> arr_;
};

inline std::ostream& operator<<(std::ostream& os, const Value& v) {
  v.write(os);
  return os;
}

}  // namespace Json
