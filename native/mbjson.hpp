// Minimal JSON value / parser / serializer for the native host core.
// Self-contained (no third-party deps). Object keys keep sorted order to
// match std::map semantics used throughout the framework's JSON formats.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace mb {

class Json;
using JsonArray = std::vector<Json>;
using JsonObject = std::map<std::string, Json>;

class Json {
public:
  enum Type { Null, Bool, Int, Double, Str, Arr, Obj };

  Json() : type_(Null) {}
  Json(bool b) : type_(Bool), b_(b) {}
  Json(int64_t i) : type_(Int), i_(i) {}
  Json(int i) : type_(Int), i_(i) {}
  Json(double d) : type_(Double), d_(d) {}
  Json(const char* s) : type_(Str), s_(s) {}
  Json(std::string s) : type_(Str), s_(std::move(s)) {}
  Json(JsonArray a) : type_(Arr), arr_(std::make_shared<JsonArray>(std::move(a))) {}
  Json(JsonObject o) : type_(Obj), obj_(std::make_shared<JsonObject>(std::move(o))) {}

  Type type() const { return type_; }
  bool is_null() const { return type_ == Null; }
  bool is_bool() const { return type_ == Bool; }
  bool is_int() const { return type_ == Int; }
  bool is_double() const { return type_ == Double; }
  bool is_number() const { return type_ == Int || type_ == Double; }
  bool is_string() const { return type_ == Str; }
  bool is_array() const { return type_ == Arr; }
  bool is_object() const { return type_ == Obj; }

  bool as_bool() const { return b_; }
  int64_t as_int() const { return type_ == Double ? (int64_t)d_ : i_; }
  double as_double() const { return type_ == Int ? (double)i_ : d_; }
  const std::string& as_string() const { return s_; }
  const JsonArray& arr() const { return *arr_; }
  JsonArray& arr() { return *arr_; }
  const JsonObject& obj() const { return *obj_; }
  JsonObject& obj() { return *obj_; }

  bool contains(const std::string& k) const {
    return type_ == Obj && obj_->count(k);
  }
  const Json& at(const std::string& k) const { return obj_->at(k); }
  size_t size() const {
    if (type_ == Arr) return arr_->size();
    if (type_ == Obj) return obj_->size();
    return 0;
  }

  static Json array() { return Json(JsonArray{}); }
  static Json object() { return Json(JsonObject{}); }

  // ---- serialization (nlohmann-compatible compact dump) -----------------
  void dump(std::string& out) const;
  std::string dump() const {
    std::string out;
    dump(out);
    return out;
  }

  // ---- parsing ----------------------------------------------------------
  static Json parse(const std::string& text);

  bool operator==(const Json& other) const { return dump() == other.dump(); }
  bool operator<(const Json& other) const { return dump() < other.dump(); }

private:
  Type type_;
  bool b_ = false;
  int64_t i_ = 0;
  double d_ = 0;
  std::string s_;
  std::shared_ptr<JsonArray> arr_;
  std::shared_ptr<JsonObject> obj_;
};

// ---------------------------------------------------------------------------

inline void json_escape(const std::string& s, std::string& out) {
  static const char* hexdig = "0123456789abcdef";
  for (unsigned char c : s) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\b': out += "\\b"; break;
      case '\f': out += "\\f"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      case '\t': out += "\\t"; break;
      default:
        if (c < 0x20) {
          out += "\\u00";
          out += hexdig[c >> 4];
          out += hexdig[c & 0xF];
        } else {
          out += (char)c;
        }
    }
  }
}

inline std::string format_double(double d) {
  // shortest representation that round-trips, like Python repr / nlohmann
  char buf[32];
  for (int prec = 1; prec <= 17; ++prec) {
    snprintf(buf, sizeof(buf), "%.*g", prec, d);
    double back = strtod(buf, nullptr);
    if (back == d) break;
  }
  return std::string(buf);
}

inline void Json::dump(std::string& out) const {
  switch (type_) {
    case Null: out += "null"; break;
    case Bool: out += b_ ? "true" : "false"; break;
    case Int: {
      char buf[24];
      snprintf(buf, sizeof(buf), "%lld", (long long)i_);
      out += buf;
      break;
    }
    case Double: out += format_double(d_); break;
    case Str:
      out += '"';
      json_escape(s_, out);
      out += '"';
      break;
    case Arr: {
      out += '[';
      bool first = true;
      for (const auto& v : *arr_) {
        if (!first) out += ',';
        first = false;
        v.dump(out);
      }
      out += ']';
      break;
    }
    case Obj: {
      out += '{';
      bool first = true;
      for (const auto& kv : *obj_) {
        if (!first) out += ',';
        first = false;
        out += '"';
        json_escape(kv.first, out);
        out += "\":";
        kv.second.dump(out);
      }
      out += '}';
      break;
    }
  }
}

// ---------------------------------------------------------------------------

class JsonParser {
public:
  explicit JsonParser(const std::string& text) : t_(text), p_(0) {}

  Json parse() {
    skip_ws();
    Json v = value();
    skip_ws();
    if (p_ != t_.size()) fail("trailing characters");
    return v;
  }

private:
  const std::string& t_;
  size_t p_;

  [[noreturn]] void fail(const char* msg) {
    throw std::runtime_error(std::string("JSON parse error at ") +
                             std::to_string(p_) + ": " + msg);
  }

  void skip_ws() {
    while (p_ < t_.size() &&
           (t_[p_] == ' ' || t_[p_] == '\t' || t_[p_] == '\n' || t_[p_] == '\r'))
      ++p_;
  }

  char peek() { return p_ < t_.size() ? t_[p_] : '\0'; }

  Json value() {
    switch (peek()) {
      case '{': return object();
      case '[': return array();
      case '"': return Json(string());
      case 't':
        expect("true");
        return Json(true);
      case 'f':
        expect("false");
        return Json(false);
      case 'n':
        expect("null");
        return Json();
      default: return number();
    }
  }

  void expect(const char* s) {
    size_t n = strlen(s);
    if (t_.compare(p_, n, s) != 0) fail("unexpected token");
    p_ += n;
  }

  Json object() {
    ++p_;  // {
    JsonObject o;
    skip_ws();
    if (peek() == '}') {
      ++p_;
      return Json(std::move(o));
    }
    while (true) {
      skip_ws();
      if (peek() != '"') fail("expected string key");
      std::string k = string();
      skip_ws();
      if (peek() != ':') fail("expected ':'");
      ++p_;
      skip_ws();
      o.emplace(std::move(k), value());
      skip_ws();
      if (peek() == ',') {
        ++p_;
        continue;
      }
      if (peek() == '}') {
        ++p_;
        return Json(std::move(o));
      }
      fail("expected ',' or '}'");
    }
  }

  Json array() {
    ++p_;  // [
    JsonArray a;
    skip_ws();
    if (peek() == ']') {
      ++p_;
      return Json(std::move(a));
    }
    while (true) {
      skip_ws();
      a.push_back(value());
      skip_ws();
      if (peek() == ',') {
        ++p_;
        continue;
      }
      if (peek() == ']') {
        ++p_;
        return Json(std::move(a));
      }
      fail("expected ',' or ']'");
    }
  }

  std::string string() {
    ++p_;  // "
    std::string out;
    while (p_ < t_.size()) {
      char c = t_[p_++];
      if (c == '"') return out;
      if (c == '\\') {
        if (p_ >= t_.size()) fail("bad escape");
        char e = t_[p_++];
        switch (e) {
          case '"': out += '"'; break;
          case '\\': out += '\\'; break;
          case '/': out += '/'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'n': out += '\n'; break;
          case 'r': out += '\r'; break;
          case 't': out += '\t'; break;
          case 'u': {
            if (p_ + 4 > t_.size()) fail("bad \\u escape");
            unsigned cp = (unsigned)strtoul(t_.substr(p_, 4).c_str(), nullptr, 16);
            p_ += 4;
            // encode UTF-8 (basic multilingual plane; surrogate pairs)
            if (cp >= 0xD800 && cp <= 0xDBFF && p_ + 6 <= t_.size() &&
                t_[p_] == '\\' && t_[p_ + 1] == 'u') {
              unsigned lo = (unsigned)strtoul(t_.substr(p_ + 2, 4).c_str(), nullptr, 16);
              p_ += 6;
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            }
            if (cp < 0x80) {
              out += (char)cp;
            } else if (cp < 0x800) {
              out += (char)(0xC0 | (cp >> 6));
              out += (char)(0x80 | (cp & 0x3F));
            } else if (cp < 0x10000) {
              out += (char)(0xE0 | (cp >> 12));
              out += (char)(0x80 | ((cp >> 6) & 0x3F));
              out += (char)(0x80 | (cp & 0x3F));
            } else {
              out += (char)(0xF0 | (cp >> 18));
              out += (char)(0x80 | ((cp >> 12) & 0x3F));
              out += (char)(0x80 | ((cp >> 6) & 0x3F));
              out += (char)(0x80 | (cp & 0x3F));
            }
            break;
          }
          default: fail("bad escape");
        }
      } else {
        out += c;
      }
    }
    fail("unterminated string");
  }

  Json number() {
    size_t start = p_;
    if (peek() == '-') ++p_;
    bool is_double = false;
    while (p_ < t_.size()) {
      char c = t_[p_];
      if (c >= '0' && c <= '9') {
        ++p_;
      } else if (c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-') {
        if (c == '.' || c == 'e' || c == 'E') is_double = true;
        ++p_;
      } else {
        break;
      }
    }
    if (p_ == start) fail("invalid number");
    std::string tok = t_.substr(start, p_ - start);
    if (!is_double) {
      errno = 0;
      long long v = strtoll(tok.c_str(), nullptr, 10);
      if (errno == 0) return Json((int64_t)v);
    }
    return Json(strtod(tok.c_str(), nullptr));
  }
};

inline Json Json::parse(const std::string& text) {
  return JsonParser(text).parse();
}

}  // namespace mb
