// Native machine core: WFST data structure + manipulation algebra.
// Semantics mirror the Python host layer (machineboss_tpu/core/machine.py)
// exactly — same state ordering, transition collapsing, silent-cycle
// processing and JSON text format — so native-built machines are
// byte-identical to Python-built ones. Used as the fast path for large
// compositions (GeneWise-scale and beyond).
#pragma once

#include <algorithm>
#include <deque>
#include <functional>
#include <map>
#include <queue>
#include <set>
#include <string>
#include <vector>

#include "expr.hpp"
#include "mbjson.hpp"

namespace mb {

using StateIndex = int64_t;

struct Transition {
  std::string in, out;
  StateIndex dest = 0;
  ExprId weight = ExprArena::kOne;

  bool input_empty() const { return in.empty(); }
  bool output_empty() const { return out.empty(); }
  bool is_silent() const { return in.empty() && out.empty(); }
  bool is_loud() const { return !is_silent(); }
};

struct State {
  Json name;  // Null = unnamed
  std::vector<Transition> trans;

  bool terminates() const { return trans.empty(); }
  bool exits_with_input() const {
    for (const auto& t : trans)
      if (!t.input_empty()) return true;
    return false;
  }
  bool exits_without_input() const {
    for (const auto& t : trans)
      if (t.input_empty()) return true;
    return false;
  }
  bool waits() const { return !exits_without_input(); }
  bool continues() const { return !exits_with_input() && !terminates(); }
};

class TransAccumulator {
public:
  void accumulate(ExprArena& A, const std::string& in, const std::string& out,
                  StateIndex dest, ExprId w) {
    auto key = std::make_tuple(dest, in, out);
    auto it = t_.find(key);
    if (it != t_.end())
      it->second = A.add(w, it->second);
    else
      t_.emplace(key, w);
  }

  std::vector<Transition> transitions() const {
    std::vector<Transition> out;
    out.reserve(t_.size());
    for (const auto& kv : t_) {
      Transition t;
      t.dest = std::get<0>(kv.first);
      t.in = std::get<1>(kv.first);
      t.out = std::get<2>(kv.first);
      t.weight = kv.second;
      out.push_back(std::move(t));
    }
    return out;
  }

private:
  std::map<std::tuple<StateIndex, std::string, std::string>, ExprId> t_;
};

class Machine {
public:
  std::vector<State> states;
  ExprArena* arena;

  explicit Machine(ExprArena* a) : arena(a) {}

  StateIndex n_states() const { return (StateIndex)states.size(); }
  StateIndex end_state() const { return n_states() - 1; }

  bool state_names_all_null() const {
    for (const auto& s : states)
      if (!s.name.is_null()) return false;
    return true;
  }

  bool is_waiting_machine() const {
    for (const auto& s : states)
      if (!s.waits() && !s.continues()) return false;
    return true;
  }

  bool is_advancing_machine() const {
    for (StateIndex s = 1; s < n_states(); ++s)
      for (const auto& t : states[s].trans)
        if (t.is_silent() && t.dest <= s) return false;
    return true;
  }

  size_t n_silent_back_transitions() const {
    size_t n = 0;
    for (StateIndex s = 1; s < n_states(); ++s)
      for (const auto& t : states[s].trans)
        if (t.is_silent() && t.dest <= s) ++n;
    return n;
  }

  // ---- accessibility / ergodic ------------------------------------------

  std::vector<bool> accessible() const {
    StateIndex n = n_states();
    std::vector<bool> fwd(n, false), back(n, false);
    std::vector<StateIndex> stack{0};
    fwd[0] = true;
    while (!stack.empty()) {
      StateIndex c = stack.back();
      stack.pop_back();
      for (const auto& t : states[c].trans)
        if (!fwd[t.dest]) {
          fwd[t.dest] = true;
          stack.push_back(t.dest);
        }
    }
    std::vector<std::vector<StateIndex>> sources(n);
    for (StateIndex s = 0; s < n; ++s)
      for (const auto& t : states[s].trans) sources[t.dest].push_back(s);
    stack.assign(1, n - 1);
    back[n - 1] = true;
    while (!stack.empty()) {
      StateIndex c = stack.back();
      stack.pop_back();
      for (StateIndex src : sources[c])
        if (!back[src]) {
          back[src] = true;
          stack.push_back(src);
        }
    }
    std::vector<bool> acc(n);
    for (StateIndex s = 0; s < n; ++s) acc[s] = fwd[s] && back[s];
    return acc;
  }

  bool is_ergodic() const {
    auto acc = accessible();
    for (bool a : acc)
      if (!a) return false;
    return acc[n_states() - 1];
  }

  Machine ergodic_machine() const {
    if (is_ergodic()) return *this;
    ExprArena& A = *arena;
    StateIndex n = n_states();
    auto keep = accessible();
    Machine zero(arena);
    zero.states.resize(2);
    if (!keep[n - 1]) return zero;
    std::vector<StateIndex> null_equiv(n, -1);
    for (StateIndex s = 0; s < n; ++s) {
      if (!keep[s]) continue;
      StateIndex d = s;
      std::set<StateIndex> seen;
      while (states[d].trans.size() == 1 && states[d].trans[0].is_silent() &&
             A.is_one(states[d].trans[0].weight) && !seen.count(d)) {
        seen.insert(d);
        d = states[d].trans[0].dest;
      }
      if (d != s) null_equiv[s] = d;
    }
    std::vector<StateIndex> old2new(n, 0);
    StateIndex ns = 0;
    for (StateIndex s = 0; s < n; ++s)
      if (keep[s] && null_equiv[s] < 0) old2new[s] = ns++;
    for (StateIndex s = 0; s < n; ++s)
      if (keep[s] && null_equiv[s] >= 0) old2new[s] = old2new[null_equiv[s]];
    if (!ns) return zero;
    Machine em(arena);
    em.states.reserve(ns);
    for (StateIndex s = 0; s < n; ++s) {
      if (!keep[s] || null_equiv[s] >= 0) continue;
      State st;
      st.name = states[s].name;
      for (const auto& t : states[s].trans)
        if (keep[t.dest]) {
          Transition nt = t;
          nt.dest = old2new[t.dest];
          st.trans.push_back(std::move(nt));
        }
      em.states.push_back(std::move(st));
    }
    return em;
  }

  // ---- waiting machine --------------------------------------------------

  Machine waiting_machine() const {
    if (is_waiting_machine()) return *this;
    Machine wm(arena);
    std::vector<State> new_states = states;
    StateIndex n = n_states();
    std::vector<StateIndex> old2new(n, 0), new2old;
    for (StateIndex s = 0; s < n; ++s) {
      const State& ms = states[s];
      old2new[s] = (StateIndex)new2old.size();
      new2old.push_back(s);
      if (!ms.waits() && !ms.continues()) {
        State c, w;
        c.name = ms.name;
        JsonObject wn;
        wn.emplace("wait", ms.name);
        w.name = Json(std::move(wn));
        for (const auto& t : ms.trans)
          (t.input_empty() ? c : w).trans.push_back(t);
        Transition silent;
        silent.dest = (StateIndex)new_states.size();
        c.trans.push_back(std::move(silent));
        old2new.push_back((StateIndex)new2old.size());
        new2old.push_back((StateIndex)new_states.size());
        std::swap(new_states[s], c);
        new_states.push_back(std::move(w));
      }
    }
    for (StateIndex s : new2old) {
      State ms = new_states[s];
      for (auto& t : ms.trans) t.dest = old2new[t.dest];
      wm.states.push_back(std::move(ms));
    }
    return wm;
  }

  // ---- advance sort (mirrors Python heap semantics exactly) -------------

  Machine advance_sort() const;

  // ---- advancing machine (silent back-transition elimination) -----------

  Machine advancing_machine() const;
  Machine drop_silent_back_transitions() const;
  Machine process_cycles(int strategy) const {
    if (strategy == 0) return *this;  // leave
    if (strategy == 2) return advancing_machine();
    return drop_silent_back_transitions();
  }

  Machine pad_with_null_states() const;
  bool has_null_padding_states() const;

  // ---- silent-transition elimination / state merging ---------------------

  Machine eliminate_silent_transitions(int cycle_strategy = 2) const;
  Machine merge_equivalent_states() const;

  // ---- structural transforms ---------------------------------------------

  Machine reverse() const;
  Machine transpose() const;

  // ---- binary constructions / closures ------------------------------------

  static Machine concatenate(const Machine& left, const Machine& right);
  static Machine take_union(const Machine& first, const Machine& second);
  static Machine zero_or_one(const Machine& q);
  static Machine kleene_plus(const Machine& k);
  static Machine kleene_star(const Machine& k) {
    return zero_or_one(kleene_plus(k));
  }

  // ---- compose ----------------------------------------------------------

  // Intersection of two recognizers (ref src/machine.cpp:909); parity
  // with core/machine.py Machine.intersect
  static Machine intersect(const Machine& first, const Machine& orig_second,
                           int cycle_strategy);

  static Machine compose(const Machine& first, const Machine& orig_second,
                         bool assign_names, bool collapse, int cycle_strategy);

  // ---- JSON -------------------------------------------------------------

  static Machine from_json(const Json& j, ExprArena* arena);
  std::string to_json_str() const;
};

}  // namespace mb
