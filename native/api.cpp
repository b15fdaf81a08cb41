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
// ops: advance_sort, advancing, drop_silent_back, ergodic, waiting
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
