// Symbolic weight-expression algebra (native).
// Same constant-folding and JSON round-trip semantics as the Python host
// layer (machineboss_tpu/core/weight.py) so both produce identical output.
// Expressions are hash-consed in an arena: structurally identical nodes
// share one id, making equality O(1) and keeping composition memory-lean.
#pragma once

#include <cmath>
#include <cstdio>
#include <string>
#include <unordered_map>
#include <vector>

#include "mbjson.hpp"

namespace mb {

enum class Op : uint8_t { Int, Dbl, Param, Mul, Add, Sub, Div, Pow, Log, Exp };

struct ExprNode {
  Op op;
  int64_t ival = 0;
  double dval = 0;
  uint32_t a = 0, b = 0;  // child ids
  std::string param;
};

using ExprId = uint32_t;

class ExprArena {
public:
  ExprArena() {
    // ids 0 and 1 are the canonical zero/one
    intern(make_int_node(0));
    intern(make_int_node(1));
  }

  static constexpr ExprId kZero = 0;
  static constexpr ExprId kOne = 1;

  const ExprNode& node(ExprId id) const { return nodes_[id]; }

  bool is_number(ExprId e) const {
    Op op = nodes_[e].op;
    return op == Op::Int || op == Op::Dbl;
  }
  bool is_zero(ExprId e) const {
    const ExprNode& n = nodes_[e];
    return (n.op == Op::Int && n.ival == 0) || (n.op == Op::Dbl && n.dval == 0);
  }
  bool is_one(ExprId e) const {
    const ExprNode& n = nodes_[e];
    return (n.op == Op::Int && n.ival == 1) || (n.op == Op::Dbl && n.dval == 1);
  }
  double as_double(ExprId e) const {
    const ExprNode& n = nodes_[e];
    return n.op == Op::Int ? (double)n.ival : n.dval;
  }
  bool is_int(ExprId e) const { return nodes_[e].op == Op::Int; }

  ExprId int_const(int64_t v) {
    if (v == 0) return kZero;
    if (v == 1) return kOne;
    return intern(make_int_node(v));
  }

  ExprId dbl_const(double v) {
    if (v == 0) return kZero;
    if (v == 1) return kOne;
    ExprNode n;
    n.op = Op::Dbl;
    n.dval = v;
    return intern(std::move(n));
  }

  ExprId param(const std::string& name) {
    ExprNode n;
    n.op = Op::Param;
    n.param = name;
    return intern(std::move(n));
  }

  ExprId binary(Op op, ExprId a, ExprId b) {
    ExprNode n;
    n.op = op;
    n.a = a;
    n.b = b;
    return intern(std::move(n));
  }

  ExprId unary(Op op, ExprId a) {
    ExprNode n;
    n.op = op;
    n.a = a;
    return intern(std::move(n));
  }

  // ---- algebra with reference folding rules -----------------------------

  ExprId mul(ExprId l, ExprId r) {
    if (is_one(l)) return r;
    if (is_one(r)) return l;
    if (is_zero(l) || is_zero(r)) return kZero;
    if (is_int(l) && is_int(r))
      return int_const(nodes_[l].ival * nodes_[r].ival);
    if (is_number(l) && is_number(r))
      return dbl_const(as_double(l) * as_double(r));
    return binary(Op::Mul, l, r);
  }

  ExprId add(ExprId l, ExprId r) {
    if (is_zero(l)) return r;
    if (is_zero(r)) return l;
    const ExprNode& rn = nodes_[r];
    if (rn.op == Op::Sub && is_zero(rn.a)) return sub(l, rn.b);
    if (is_int(l) && is_int(r))
      return int_const(nodes_[l].ival + nodes_[r].ival);
    if (is_number(l) && is_number(r))
      return dbl_const(as_double(l) + as_double(r));
    return binary(Op::Add, l, r);
  }

  ExprId sub(ExprId l, ExprId r) {
    if (is_zero(r)) return l;
    return binary(Op::Sub, l, r);
  }

  ExprId div(ExprId l, ExprId r) {
    if (is_one(r)) return l;
    if (is_zero(l)) return kZero;
    if (is_number(l) && is_number(r) &&
        (nodes_[l].op == Op::Dbl || nodes_[r].op == Op::Dbl))
      return dbl_const(as_double(l) / as_double(r));
    return binary(Op::Div, l, r);
  }

  ExprId pow(ExprId a, ExprId b) {
    if (is_one(b)) return a;
    if (is_zero(b)) return kOne;
    return binary(Op::Pow, a, b);
  }

  ExprId log_of(ExprId p) {
    if (is_one(p)) return kZero;
    if (nodes_[p].op == Op::Exp) return nodes_[p].a;
    return unary(Op::Log, p);
  }

  ExprId exp_of(ExprId p) {
    if (is_zero(p)) return kOne;
    if (nodes_[p].op == Op::Log) return nodes_[p].a;
    return unary(Op::Exp, p);
  }

  ExprId minus(ExprId x) { return binary(Op::Sub, kZero, x); }
  ExprId negate(ExprId p) { return sub(kOne, p); }
  ExprId reciprocal(ExprId p) { return div(kOne, p); }
  ExprId geometric_sum(ExprId p) { return reciprocal(negate(p)); }

  // ---- numeric evaluation ----------------------------------------------

  double eval(ExprId e, const std::unordered_map<std::string, double>& defs) const {
    const ExprNode& n = nodes_[e];
    switch (n.op) {
      case Op::Int: return (double)n.ival;
      case Op::Dbl: return n.dval;
      case Op::Param: {
        auto it = defs.find(n.param);
        if (it == defs.end())
          throw std::runtime_error("Parameter " + n.param + " not defined");
        return it->second;
      }
      case Op::Log: return std::log(eval(n.a, defs));
      case Op::Exp: return std::exp(eval(n.a, defs));
      case Op::Mul: return eval(n.a, defs) * eval(n.b, defs);
      case Op::Add: return eval(n.a, defs) + eval(n.b, defs);
      case Op::Sub: return eval(n.a, defs) - eval(n.b, defs);
      case Op::Div: return eval(n.a, defs) / eval(n.b, defs);
      case Op::Pow: return std::pow(eval(n.a, defs), eval(n.b, defs));
    }
    return 0;
  }

  // ---- JSON round trip (byte-compatible with the Python writer) ---------

  ExprId from_json(const Json& j) {
    switch (j.type()) {
      case Json::Bool: return j.as_bool() ? kOne : kZero;
      case Json::Int: return int_const(j.as_int());
      case Json::Double: return dbl_const(j.as_double());
      case Json::Str: return param(j.as_string());
      case Json::Obj: {
        const auto& o = j.obj();
        const std::string& op = o.begin()->first;
        const Json& args = o.begin()->second;
        if (op == "log") return log_of(from_json(args));
        if (op == "exp") return exp_of(from_json(args));
        if (op == "not") return negate(from_json(args));
        if (op == "geomsum") return geometric_sum(from_json(args));
        if (op == "*") return mul(from_json(args.arr()[0]), from_json(args.arr()[1]));
        if (op == "/") return div(from_json(args.arr()[0]), from_json(args.arr()[1]));
        if (op == "+") return add(from_json(args.arr()[0]), from_json(args.arr()[1]));
        if (op == "-") return sub(from_json(args.arr()[0]), from_json(args.arr()[1]));
        if (op == "pow") return pow(from_json(args.arr()[0]), from_json(args.arr()[1]));
        throw std::runtime_error("Unknown opcode " + op + " in JSON");
      }
      default: throw std::runtime_error("bad WeightExpr JSON");
    }
  }

  void to_json_str(ExprId e, std::string& out) const {
    const ExprNode& n = nodes_[e];
    if (is_zero(e)) {
      out += '0';
      return;
    }
    if (is_one(e)) {
      out += '1';
      return;
    }
    switch (n.op) {
      case Op::Int: {
        char buf[24];
        snprintf(buf, sizeof(buf), "%lld", (long long)n.ival);
        out += buf;
        break;
      }
      case Op::Dbl: {
        char buf[32];
        snprintf(buf, sizeof(buf), "%.15g", n.dval);
        out += buf;
        break;
      }
      case Op::Param:
        out += '"';
        write_escaped_cpp(n.param, out);
        out += '"';
        break;
      case Op::Log:
      case Op::Exp:
        out += n.op == Op::Log ? "{\"log\":" : "{\"exp\":";
        to_json_str(n.a, out);
        out += '}';
        break;
      case Op::Pow:
        out += "{\"pow\":[";
        to_json_str(n.a, out);
        out += ',';
        to_json_str(n.b, out);
        out += "]}";
        break;
      case Op::Div: {
        const ExprNode& rn = nodes_[n.b];
        if (is_one(n.a) && rn.op == Op::Sub && is_one(rn.a)) {
          out += "{\"geomsum\":";
          to_json_str(rn.b, out);
          out += '}';
          return;
        }
        out += "{\"/\":[";
        to_json_str(n.a, out);
        out += ',';
        to_json_str(n.b, out);
        out += "]}";
        break;
      }
      case Op::Sub:
        if (is_one(n.a)) {
          out += "{\"not\":";
          to_json_str(n.b, out);
          out += '}';
          return;
        }
        out += "{\"-\":[";
        to_json_str(n.a, out);
        out += ',';
        to_json_str(n.b, out);
        out += "]}";
        break;
      case Op::Mul:
      case Op::Add:
        out += n.op == Op::Mul ? "{\"*\":[" : "{\"+\":[";
        to_json_str(n.a, out);
        out += ',';
        to_json_str(n.b, out);
        out += "]}";
        break;
    }
  }

  // byte-wise escaping identical to the Python writer (utils/jsonfmt.py)
  static void write_escaped_cpp(const std::string& s, std::string& out) {
    static const char* hexdig = "0123456789ABCDEF";
    for (unsigned char c : s) {
      if (c >= 0x20 && c <= 0x7E && c != '\\' && c != '"') {
        out += (char)c;
      } else if (c == '"') {
        out += "\\\"";
      } else if (c == '\\') {
        out += "\\\\";
      } else if (c == '\t') {
        out += "\\t";
      } else if (c == '\r') {
        out += "\\r";
      } else if (c == '\n') {
        out += "\\n";
      } else {
        out += "\\x";
        out += hexdig[c >> 4];
        out += hexdig[c & 0xF];
      }
    }
  }

  size_t size() const { return nodes_.size(); }

private:
  std::vector<ExprNode> nodes_;
  std::unordered_map<std::string, ExprId> interned_;

  static ExprNode make_int_node(int64_t v) {
    ExprNode n;
    n.op = Op::Int;
    n.ival = v;
    return n;
  }

  ExprId intern(ExprNode&& n) {
    char key[64];
    std::string skey;
    switch (n.op) {
      case Op::Int:
        snprintf(key, sizeof(key), "i%lld", (long long)n.ival);
        skey = key;
        break;
      case Op::Dbl:
        snprintf(key, sizeof(key), "d%a", n.dval);
        skey = key;
        break;
      case Op::Param:
        skey = "p" + n.param;
        break;
      default:
        snprintf(key, sizeof(key), "%d:%u:%u", (int)n.op, n.a, n.b);
        skey = key;
        break;
    }
    auto it = interned_.find(skey);
    if (it != interned_.end()) return it->second;
    ExprId id = (ExprId)nodes_.size();
    nodes_.push_back(std::move(n));
    interned_.emplace(std::move(skey), id);
    return id;
  }
};

}  // namespace mb
