// C ABI for the native host core (loaded via ctypes from
// machineboss_tpu/native.py). All payloads are JSON strings; returned
// buffers are heap-allocated and released with mb_free().
#include <cstring>

#include "machine.hpp"

using namespace mb;

static char* dup_result(const std::string& s) {
  char* out = (char*)malloc(s.size() + 1);
  memcpy(out, s.data(), s.size() + 1);
  return out;
}

static char* error_result(const std::string& msg) {
  Json err(JsonObject{{"error", Json(msg)}});
  return dup_result(err.dump());
}

extern "C" {

// Compose two machines. cycle_strategy: 0=leave, 1=break, 2=sum.
// Returns the composed machine's canonical JSON text (same format as the
// Python writer), or {"error": ...}.
char* mb_compose(const char* a_json, const char* b_json, int cycle_strategy) {
  try {
    ExprArena arena;
    Machine a = Machine::from_json(Json::parse(a_json), &arena);
    Machine b = Machine::from_json(Json::parse(b_json), &arena);
    Machine c = Machine::compose(a, b, true, true, cycle_strategy);
    return dup_result(c.to_json_str());
  } catch (const std::exception& e) {
    return error_result(e.what());
  }
}

// Generic single-machine transforms: {"op": ..., "machine": {...}}
// ops: advance_sort, advancing, drop_silent_back, ergodic, waiting,
//      eliminate_silent, merge_equivalent, reverse, transpose,
//      zero_or_one, kleene_plus, kleene_star
char* mb_transform(const char* request_json) {
  try {
    Json req = Json::parse(request_json);
    const std::string& op = req.at("op").as_string();
    ExprArena arena;
    Machine m = Machine::from_json(req.at("machine"), &arena);
    Machine out(&arena);
    if (op == "advance_sort")
      out = m.advance_sort();
    else if (op == "advancing")
      out = m.advancing_machine();
    else if (op == "drop_silent_back")
      out = m.drop_silent_back_transitions();
    else if (op == "ergodic")
      out = m.ergodic_machine();
    else if (op == "waiting")
      out = m.waiting_machine();
    else if (op == "eliminate_silent")
      out = m.eliminate_silent_transitions(
          req.contains("cycle_strategy") ? (int)req.at("cycle_strategy").as_int()
                                         : 2);
    else if (op == "merge_equivalent")
      out = m.merge_equivalent_states();
    else if (op == "reverse")
      out = m.reverse();
    else if (op == "transpose")
      out = m.transpose();
    else if (op == "zero_or_one")
      out = Machine::zero_or_one(m);
    else if (op == "kleene_plus")
      out = Machine::kleene_plus(m);
    else if (op == "kleene_star")
      out = Machine::kleene_star(m);
    else
      return error_result("unknown op: " + op);
    return dup_result(out.to_json_str());
  } catch (const std::exception& e) {
    return error_result(e.what());
  }
}

// Two-machine constructions: {"op": ..., "a": {...}, "b": {...}}
// ops: concat, union
char* mb_combine(const char* request_json) {
  try {
    Json req = Json::parse(request_json);
    const std::string& op = req.at("op").as_string();
    ExprArena arena;
    Machine a = Machine::from_json(req.at("a"), &arena);
    Machine b = Machine::from_json(req.at("b"), &arena);
    Machine out(&arena);
    if (op == "concat")
      out = Machine::concatenate(a, b);
    else if (op == "union")
      out = Machine::take_union(a, b);
    else if (op == "intersect")
      out = Machine::intersect(
          a, b,
          req.contains("cycle_strategy")
              ? (int)req.at("cycle_strategy").as_int() : 2);
    else
      return error_result("unknown op: " + op);
    return dup_result(out.to_json_str());
  } catch (const std::exception& e) {
    return error_result(e.what());
  }
}

void mb_free(char* p) { free(p); }

const char* mb_version() { return "machineboss-tpu-native 0.1"; }

}  // extern "C"
