// Machine algebra implementations (see machine.hpp).
#include "machine.hpp"

namespace mb {

// ---------------------------------------------------------------------------
// advance sort: reorder states to minimize backward silent transitions,
// using the same priority structure as the Python/host implementation
// (lazy-deletion heap keyed (nIncoming, nIncoming - nOutgoing, index)).

Machine Machine::advance_sort() const {
  size_t n_back_before = n_silent_back_transitions();
  if (!n_back_before) return *this;

  StateIndex n = n_states();
  std::vector<std::vector<StateIndex>> silent_in(n), silent_out(n);
  std::vector<int64_t> n_in(n, 0), n_out(n, 0);
  for (StateIndex s = 1; s + 1 < n; ++s)
    for (const auto& t : states[s].trans)
      if (t.is_silent() && t.dest != s && t.dest != n - 1 && t.dest != 0) {
        silent_out[s].push_back(t.dest);
        silent_in[t.dest].push_back(s);
        ++n_out[s];
        ++n_in[t.dest];
      }

  using Key = std::tuple<int64_t, int64_t, StateIndex>;
  using Entry = std::pair<Key, StateIndex>;
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
  std::map<StateIndex, Key> live;

  auto key_of = [&](StateIndex s) {
    return Key(n_in[s], n_in[s] - n_out[s], s);
  };
  auto insert_state = [&](StateIndex s) {
    Key k = key_of(s);
    live[s] = k;
    heap.emplace(k, s);
  };
  auto remove_state = [&](StateIndex s) {
    auto it = live.find(s);
    if (it == live.end()) return false;
    live.erase(it);
    return true;
  };

  std::vector<StateIndex> order;
  auto add_to_order = [&](StateIndex s) {
    order.push_back(s);
    for (StateIndex nxt : silent_out[s]) {
      bool found = remove_state(nxt);
      --n_in[nxt];
      if (found) insert_state(nxt);
    }
    for (StateIndex prv : silent_in[s]) {
      bool found = remove_state(prv);
      --n_out[prv];
      if (found) insert_state(prv);
    }
  };

  add_to_order(0);
  if (n > 1) {
    for (StateIndex s = 1; s + 1 < n; ++s) insert_state(s);
    while (!live.empty()) {
      Entry e = heap.top();
      heap.pop();
      auto it = live.find(e.second);
      if (it == live.end() || it->second != e.first) continue;
      live.erase(it);
      add_to_order(e.second);
    }
    add_to_order(n - 1);
  }

  std::vector<StateIndex> old2new(n);
  bool changed = false;
  for (StateIndex pos = 0; pos < (StateIndex)order.size(); ++pos) {
    changed = changed || order[pos] != pos;
    old2new[order[pos]] = pos;
  }

  Machine result(arena);
  if (!changed) {
    result = *this;
  } else {
    result.states.reserve(n);
    for (StateIndex s : order) {
      State st = states[s];
      for (auto& t : st.trans) t.dest = old2new[t.dest];
      result.states.push_back(std::move(st));
    }
  }

  size_t n_back_after = result.n_silent_back_transitions();
  if (n_back_after >= n_back_before && changed) result = *this;

  if (n_back_after && !has_null_padding_states()) {
    Machine padded = pad_with_null_states();
    Machine sorted_dummy = padded.advance_sort();
    if (sorted_dummy.n_silent_back_transitions() < n_back_after)
      result = sorted_dummy;
  }
  return result;
}

// ---------------------------------------------------------------------------

Machine Machine::drop_silent_back_transitions() const {
  if (is_advancing_machine()) return *this;
  Machine am(arena);
  for (StateIndex s = 0; s < n_states(); ++s) {
    State st;
    st.name = states[s].name;
    for (const auto& t : states[s].trans)
      if (!(t.is_silent() && t.dest <= s)) st.trans.push_back(t);
    am.states.push_back(std::move(st));
  }
  return am;
}

Machine Machine::advancing_machine() const {
  if (is_advancing_machine()) return *this;
  ExprArena& A = *arena;
  StateIndex n = n_states();
  Machine am(arena);
  std::map<std::pair<StateIndex, StateIndex>, std::vector<Transition>> fwd;

  std::function<void(StateIndex, StateIndex)> update = [&](StateIndex i,
                                                           StateIndex mm) {
    if (fwd.count({i, mm})) return;
    const std::vector<Transition>* old;
    std::vector<Transition> tmp;
    if (mm > i) {
      update(i, mm - 1);
      old = &fwd[{i, mm - 1}];
    } else if (mm == i) {
      old = &states[mm].trans;
    } else {
      old = &tmp;
    }
    std::vector<Transition> out;
    for (const auto& t_ij : *old) {
      if (t_ij.is_loud()) {
        out.push_back(t_ij);
      } else {
        StateIndex j = t_ij.dest;
        if (j >= mm) {
          out.push_back(t_ij);
        } else {
          if (i != j) update(j, mm);
          const auto& src = (i == j) ? *old : fwd[{j, mm}];
          for (const auto& t_jk : src) {
            Transition nt = t_jk;
            nt.weight = A.mul(t_ij.weight, t_jk.weight);
            out.push_back(std::move(nt));
          }
        }
      }
    }
    fwd[{i, mm}] = std::move(out);
  };

  for (StateIndex s = 0; s < n; ++s) {
    State st;
    st.name = states[s].name;
    update(s, s);
    TransAccumulator ta;
    for (const auto& t : fwd[{s, s}]) ta.accumulate(A, t.in, t.out, t.dest, t.weight);
    auto et = ta.transitions();
    ExprId exit_self = ExprArena::kOne;
    for (const auto& t : et) {
      if (t.is_silent() && t.dest == s)
        exit_self = A.geometric_sum(t.weight);
      else
        st.trans.push_back(t);
    }
    if (!A.is_one(exit_self))
      for (auto& t : st.trans) t.weight = A.mul(exit_self, t.weight);
    fwd[{s, s}] = st.trans;
    am.states.push_back(std::move(st));
  }
  return am;
}

// ---------------------------------------------------------------------------

bool Machine::has_null_padding_states() const {
  if (states.empty()) return false;
  const State& s0 = states[0];
  bool s0_null_single = s0.trans.size() == 1 && s0.trans[0].is_silent();
  if (!s0_null_single) return false;
  StateIndex ssi = 0, esi = n_states() - 1;
  if (!states[esi].trans.empty()) return false;
  int64_t null_to_end = 0;
  for (const auto& ms : states)
    for (const auto& t : ms.trans) {
      if (t.dest == ssi) return false;
      if (t.dest == esi) {
        if (!t.is_silent()) return false;
        ++null_to_end;
      }
    }
  return null_to_end == 1;
}

Machine Machine::pad_with_null_states() const {
  auto concatenate = [&](const Machine& left, const Machine& right) {
    Machine m(arena);
    m.states.reserve(left.states.size() + right.states.size());
    for (const auto& s : left.states) {
      State st = s;
      if (!st.name.is_null()) {
        JsonArray n{Json("concat-l"), st.name};
        st.name = Json(std::move(n));
      }
      m.states.push_back(std::move(st));
    }
    StateIndex off = left.n_states();
    for (const auto& s : right.states) {
      State st = s;
      if (!st.name.is_null()) {
        JsonArray n{Json("concat-r"), st.name};
        st.name = Json(std::move(n));
      }
      for (auto& t : st.trans) t.dest += off;
      m.states.push_back(std::move(st));
    }
    Transition bridge;
    bridge.dest = off;
    m.states[left.end_state()].trans.push_back(std::move(bridge));
    return m;
  };
  bool has_null_start = !states.empty() && states[0].trans.size() == 1 &&
                        states[0].trans[0].is_silent();
  if (has_null_start) {
    for (const auto& ms : states)
      for (const auto& t : ms.trans)
        if (t.dest == 0) {
          has_null_start = false;
          break;
        }
  }
  Machine dummy(arena);
  dummy.states.resize(1);
  Machine result = has_null_start ? *this : concatenate(dummy, *this);
  if (result.has_null_padding_states()) return result;
  return concatenate(result, dummy);
}

// ---------------------------------------------------------------------------
// silent-transition elimination (mirrors Python
// machine.py:eliminate_silent_transitions; ref src/machine.cpp:1611)

Machine Machine::eliminate_silent_transitions(int cycle_strategy) const {
  if (!is_advancing_machine())
    return process_cycles(cycle_strategy).eliminate_silent_transitions(
        cycle_strategy);
  ExprArena& A = *arena;
  StateIndex n = n_states();
  Machine em(arena);
  if (!n) return em;
  em.states.resize(n);
  for (StateIndex s = 0; s < n; ++s) em.states[s].name = states[s].name;
  std::vector<std::vector<Transition>> silent_trans(n);
  for (StateIndex s = n - 1; s >= 0; --s) {
    const State& ms = states[s];
    State& ems = em.states[s];
    TransAccumulator silent, loud;
    ExprId self_loop = ExprArena::kZero;
    for (const auto& t : ms.trans) {
      if (t.is_silent()) {
        if (t.dest == s)
          self_loop = A.add(self_loop, t.weight);
        else if (states[t.dest].terminates() || t.dest == n - 1)
          silent.accumulate(A, t.in, t.out, t.dest, t.weight);
        else {
          for (const auto& t2 : silent_trans[t.dest])
            silent.accumulate(A, t.in, t.out, t2.dest,
                              A.mul(t.weight, t2.weight));
          for (const auto& t2 : em.states[t.dest].trans)
            loud.accumulate(A, t2.in, t2.out, t2.dest,
                            A.mul(t.weight, t2.weight));
        }
      } else {
        loud.accumulate(A, t.in, t.out, t.dest, t.weight);
      }
    }
    ems.trans = loud.transitions();
    silent_trans[s] = silent.transitions();
    if (!A.is_zero(self_loop)) {
      ExprId self_exit = A.geometric_sum(self_loop);
      for (auto& t : silent_trans[s]) t.weight = A.mul(self_exit, t.weight);
    }
  }
  for (auto& ems : em.states) {
    TransAccumulator loud;
    for (const auto& t : ems.trans) {
      loud.accumulate(A, t.in, t.out, t.dest, t.weight);
      for (const auto& t2 : silent_trans[t.dest])
        loud.accumulate(A, t.in, t.out, t2.dest, A.mul(t.weight, t2.weight));
    }
    ems.trans = loud.transitions();
  }
  for (const auto& t : silent_trans[0]) em.states[0].trans.push_back(t);
  return em.ergodic_machine();
}

// ---------------------------------------------------------------------------
// merge equivalent states (mirrors Python machine.py:merge_equivalent_states;
// ref src/machine.cpp:1435): fixpoint of collapse-degenerates + merge states
// with identical outgoing signature + ergodic trim.

Machine Machine::merge_equivalent_states() const {
  ExprArena& A = *arena;
  Machine current = *this;
  for (;;) {
    StateIndex n_old = current.n_states();
    Machine nxt(arena);
    nxt.states.reserve(n_old);
    for (StateIndex s = 0; s < n_old; ++s) {
      TransAccumulator ta;
      for (const auto& t : current.states[s].trans)
        ta.accumulate(A, t.in, t.out, t.dest, t.weight);
      State st;
      st.name = current.states[s].name;
      st.trans = ta.transitions();
      nxt.states.push_back(std::move(st));
    }
    current = std::move(nxt);
    std::map<std::string, std::vector<StateIndex>> sig_groups;
    for (StateIndex s = 0; s < current.n_states(); ++s) {
      std::vector<std::string> parts;
      for (const auto& t : current.states[s].trans) {
        std::string w;
        A.to_json_str(t.weight, w);
        parts.push_back(std::to_string(t.dest) + "\t" + t.in + "\t" + t.out +
                        "\t" + w);
      }
      std::sort(parts.begin(), parts.end());
      std::string sig;
      for (const auto& p : parts) {
        sig += p;
        sig += '\n';
      }
      sig += '\n';
      sig_groups[sig].push_back(s);
    }
    std::map<StateIndex, StateIndex> redirect;
    for (const auto& kv : sig_groups) {
      const auto& group = kv.second;
      if (group.size() <= 1) continue;
      StateIndex rep = group[0];
      for (StateIndex s : group)
        if (s == 0 || s == current.n_states() - 1) {
          rep = s;
          break;
        }
      for (StateIndex s : group)
        if (s != rep) redirect[s] = rep;
    }
    if (redirect.empty()) break;
    for (auto& ms : current.states)
      for (auto& t : ms.trans) {
        auto it = redirect.find(t.dest);
        if (it != redirect.end()) t.dest = it->second;
      }
    current = current.ergodic_machine();
    if (current.n_states() == n_old) break;
  }
  Machine final_m(arena);
  final_m.states.reserve(current.n_states());
  for (StateIndex s = 0; s < current.n_states(); ++s) {
    TransAccumulator ta;
    for (const auto& t : current.states[s].trans)
      ta.accumulate(A, t.in, t.out, t.dest, t.weight);
    State st;
    st.name = current.states[s].name;
    st.trans = ta.transitions();
    final_m.states.push_back(std::move(st));
  }
  return final_m;
}

// ---------------------------------------------------------------------------
// structural transforms

Machine Machine::reverse() const {
  StateIndex n = n_states();
  Machine m(arena);
  m.states.resize(n);
  for (StateIndex s = 0; s < n; ++s) {
    StateIndex r = n - 1 - s;
    m.states[r].name = states[s].name;
    for (const auto& t : states[s].trans) {
      Transition nt;
      nt.in = t.in;
      nt.out = t.out;
      nt.dest = r;
      nt.weight = t.weight;
      m.states[n - 1 - t.dest].trans.push_back(std::move(nt));
    }
  }
  return m;
}

Machine Machine::transpose() const {
  Machine m = *this;
  for (auto& ms : m.states)
    for (auto& t : ms.trans) std::swap(t.in, t.out);
  return m;
}

// ---------------------------------------------------------------------------
// binary constructions and closures (mirror machine.py; ref
// src/machine.cpp:1748-1860). Name tags match the Python writer exactly.

static Json tagged_name(const char* tag, const Json& name) {
  return Json(JsonArray{Json(tag), name});
}

Machine Machine::concatenate(const Machine& left, const Machine& right) {
  if (!left.n_states() || !right.n_states())
    throw std::runtime_error("Attempt to concatenate uninitialized transducer");
  Machine m(left.arena);
  m.states = left.states;
  for (auto& ms : m.states)
    if (!ms.name.is_null()) ms.name = tagged_name("concat-l", ms.name);
  StateIndex offset = left.n_states();
  for (const auto& rs : right.states) {
    State st = rs;
    if (!st.name.is_null()) st.name = tagged_name("concat-r", st.name);
    for (auto& t : st.trans) t.dest += offset;
    m.states.push_back(std::move(st));
  }
  Transition bridge;
  bridge.dest = offset;
  m.states[left.end_state()].trans.push_back(std::move(bridge));
  return m;
}

Machine Machine::take_union(const Machine& first, const Machine& second) {
  if (!first.n_states() || !second.n_states())
    throw std::runtime_error(
        "Attempt to find union of uninitialized transducer");
  Machine m(first.arena);
  m.states.emplace_back();
  for (const auto& fs : first.states) {
    State st = fs;
    if (!st.name.is_null()) st.name = tagged_name("union-1", st.name);
    for (auto& t : st.trans) t.dest += 1;
    m.states.push_back(std::move(st));
  }
  StateIndex off2 = 1 + first.n_states();
  for (const auto& ss : second.states) {
    State st = ss;
    if (!st.name.is_null()) st.name = tagged_name("union-2", st.name);
    for (auto& t : st.trans) t.dest += off2;
    m.states.push_back(std::move(st));
  }
  m.states.emplace_back();
  StateIndex end = m.n_states() - 1;
  Transition t1;
  t1.dest = 1;
  m.states[0].trans.push_back(std::move(t1));
  Transition t2;
  t2.dest = off2;
  m.states[0].trans.push_back(std::move(t2));
  Transition t3;
  t3.dest = end;
  m.states[1 + first.end_state()].trans.push_back(std::move(t3));
  Transition t4;
  t4.dest = end;
  m.states[off2 + second.end_state()].trans.push_back(std::move(t4));
  return m;
}

Machine Machine::zero_or_one(const Machine& q) {
  if (!q.n_states())
    throw std::runtime_error("Attempt to quantify uninitialized transducer");
  Machine m = q;
  if (!m.states.back().trans.empty()) {
    for (auto& ms : m.states)
      if (!ms.name.is_null()) ms.name = tagged_name("quant-main", ms.name);
    Transition bridge;
    bridge.dest = m.end_state() + 1;
    m.states.back().trans.push_back(std::move(bridge));
    State st;
    if (!q.state_names_all_null()) st.name = Json(JsonArray{Json("quant-end")});
    m.states.push_back(std::move(st));
  }
  Transition skip;
  skip.dest = m.end_state();
  m.states[0].trans.push_back(std::move(skip));
  return m;
}

Machine Machine::kleene_plus(const Machine& k) {
  if (!k.n_states())
    throw std::runtime_error(
        "Attempt to form Kleene closure of uninitialized transducer");
  Machine m(k.arena);
  State front;
  if (!k.state_names_all_null()) front.name = Json("kleene-plus");
  m.states.push_back(std::move(front));
  for (const auto& ks : k.states) {
    State st = ks;
    for (auto& t : st.trans) t.dest += 1;
    m.states.push_back(std::move(st));
  }
  Transition start;
  start.dest = 1;
  m.states[0].trans.push_back(std::move(start));
  Transition loop;
  loop.dest = 1;
  m.states[m.end_state()].trans.push_back(std::move(loop));
  return m;
}

// ---------------------------------------------------------------------------
// compose

static bool is_json_pair(const Json& v) {
  return v.is_array() && v.size() == 2 && v.arr()[0].is_string();
}

static Json make_pair_name(const Json& a, const Json& b) {
  if (is_json_pair(a) && is_json_pair(b)) {
    JsonObject o;
    o.emplace(a.arr()[0].as_string(), a.arr()[1]);
    o.emplace(b.arr()[0].as_string(), b.arr()[1]);  // emplace keeps first
    return Json(std::move(o));
  }
  return Json(JsonArray{a, b});
}

Machine Machine::compose(const Machine& first, const Machine& orig_second,
                         bool assign_names, bool collapse,
                         int cycle_strategy) {
  ExprArena& A = *first.arena;
  Machine second_wm(first.arena);
  const Machine& second =
      orig_second.is_waiting_machine() ? orig_second : (second_wm = orig_second.waiting_machine());

  StateIndex iS = first.n_states(), jS = second.n_states();
  assign_names = assign_names && !first.state_names_all_null() &&
                 !second.state_names_all_null();

  std::vector<bool> sec_waits(jS);
  for (StateIndex j = 0; j < jS; ++j)
    sec_waits[j] = second.states[j].waits() || second.states[j].terminates();

  std::vector<bool> keep((size_t)(iS * jS), false);
  std::vector<StateIndex> to_visit{0}, kept;
  keep[0] = true;
  while (!to_visit.empty()) {
    StateIndex c = to_visit.back();
    to_visit.pop_back();
    kept.push_back(c);
    StateIndex i = c / jS, j = c % jS;
    const State& msi = first.states[i];
    const State& msj = second.states[j];
    std::vector<StateIndex> dest;
    if (sec_waits[j]) {
      for (const auto& it : msi.trans) {
        if (it.output_empty()) {
          dest.push_back(it.dest * jS + j);
        } else {
          for (const auto& jt : msj.trans)
            if (it.out == jt.in) dest.push_back(it.dest * jS + jt.dest);
        }
      }
    } else {
      for (const auto& jt : msj.trans) dest.push_back(i * jS + jt.dest);
    }
    for (StateIndex d : dest)
      if (!keep[d]) {
        keep[d] = true;
        to_visit.push_back(d);
      }
  }
  Machine zero(first.arena);
  zero.states.resize(2);
  if (!keep[(size_t)(iS * jS - 1)]) return zero;
  std::sort(kept.begin(), kept.end());
  std::vector<StateIndex> comp2kept((size_t)(iS * jS), 0);
  for (StateIndex k = 0; k < (StateIndex)kept.size(); ++k)
    comp2kept[kept[k]] = k;

  Machine comp(first.arena);
  comp.states.resize(kept.size());
  for (StateIndex k = 0; k < (StateIndex)kept.size(); ++k) {
    StateIndex c = kept[k];
    StateIndex i = c / jS, j = c % jS;
    State& ms = comp.states[k];
    if (assign_names)
      ms.name = make_pair_name(first.states[i].name, second.states[j].name);
    const State& msi = first.states[i];
    const State& msj = second.states[j];
    TransAccumulator ta;
    auto emit = [&](const std::string& in, const std::string& out, StateIndex d,
                    ExprId w) {
      if (collapse)
        ta.accumulate(A, in, out, comp2kept[d], w);
      else {
        Transition t;
        t.in = in;
        t.out = out;
        t.dest = comp2kept[d];
        t.weight = w;
        ms.trans.push_back(std::move(t));
      }
    };
    if (sec_waits[j]) {
      for (const auto& it : msi.trans) {
        if (it.output_empty()) {
          StateIndex d = it.dest * jS + j;
          if (keep[d]) emit(it.in, std::string(), d, it.weight);
        } else {
          for (const auto& jt : msj.trans)
            if (it.out == jt.in) {
              StateIndex d = it.dest * jS + jt.dest;
              if (keep[d]) emit(it.in, jt.out, d, A.mul(it.weight, jt.weight));
            }
        }
      }
    } else {
      for (const auto& jt : msj.trans) {
        StateIndex d = i * jS + jt.dest;
        if (keep[d]) emit(std::string(), jt.out, d, jt.weight);
      }
    }
    if (collapse) ms.trans = ta.transitions();
  }
  return comp.ergodic_machine()
      .advance_sort()
      .process_cycles(cycle_strategy)
      .ergodic_machine();
}

Machine Machine::intersect(const Machine& first, const Machine& orig_second,
                           int cycle_strategy) {
  // full product (no reachability pruning), exactly like the Python
  // reference path (core/machine.py Machine.intersect); the trailing
  // ergodic_machine passes trim it
  ExprArena& A = *first.arena;
  Machine second_wm(first.arena);
  const Machine& second = orig_second.is_waiting_machine()
      ? orig_second
      : (second_wm = orig_second.waiting_machine());
  StateIndex iS = first.n_states(), jS = second.n_states();
  bool assign = !first.state_names_all_null() &&
                !second.state_names_all_null();
  Machine inter(first.arena);
  inter.states.resize((size_t)(iS * jS));
  for (StateIndex i = 0; i < iS; ++i) {
    const State& msi = first.states[i];
    for (StateIndex j = 0; j < jS; ++j) {
      const State& msj = second.states[j];
      State& ms = inter.states[(size_t)(i * jS + j)];
      if (assign)
        ms.name = make_pair_name(first.states[i].name,
                                 second.states[j].name);
      if (msj.waits() || msj.terminates()) {
        for (const auto& it : msi.trans) {
          if (it.input_empty()) {
            Transition t;
            t.in = it.in;
            t.dest = it.dest * jS + j;
            t.weight = it.weight;
            ms.trans.push_back(std::move(t));
          } else {
            for (const auto& jt : msj.trans) {
              if (it.in == jt.in) {
                Transition t;
                t.in = it.in;
                t.dest = it.dest * jS + jt.dest;
                t.weight = A.mul(it.weight, jt.weight);
                ms.trans.push_back(std::move(t));
              }
            }
          }
        }
      } else {
        for (const auto& jt : msj.trans) {
          Transition t;
          t.dest = i * jS + jt.dest;
          t.weight = jt.weight;
          ms.trans.push_back(std::move(t));
        }
      }
    }
  }
  return inter.ergodic_machine()
      .advance_sort()
      .process_cycles(cycle_strategy)
      .ergodic_machine();
}

// ---------------------------------------------------------------------------
// JSON io

Machine Machine::from_json(const Json& j, ExprArena* arena) {
  Machine m(arena);
  const Json& jstate = j.at("state");
  std::map<std::string, StateIndex> id2n;
  std::set<std::string> dup;
  for (const auto& js : jstate.arr()) {
    State st;
    if (js.contains("id")) {
      st.name = js.at("id");
      std::string key = st.name.dump();
      if (id2n.count(key))
        dup.insert(key);
      else
        id2n[key] = m.n_states();
    }
    m.states.push_back(std::move(st));
  }
  StateIndex idx = 0;
  for (const auto& js : jstate.arr()) {
    State& ms = m.states[idx++];
    if (!js.contains("trans")) continue;
    for (const auto& jt : js.at("trans").arr()) {
      Transition t;
      const Json& dest = jt.at("to");
      if (dest.is_number()) {
        t.dest = dest.as_int();
      } else {
        std::string dstr = dest.dump();
        if (!id2n.count(dstr))
          throw std::runtime_error("No such state in \"to\": " + dstr);
        if (dup.count(dstr))
          throw std::runtime_error("Ambiguous destination state ID: " + dstr);
        t.dest = id2n[dstr];
      }
      if (jt.contains("in")) t.in = jt.at("in").as_string();
      if (jt.contains("out")) t.out = jt.at("out").as_string();
      if (jt.contains("weight")) t.weight = arena->from_json(jt.at("weight"));
      ms.trans.push_back(std::move(t));
    }
  }
  return m;
}

std::string Machine::to_json_str() const {
  const ExprArena& A = *arena;
  std::string out = "{\"state\":\n [";
  StateIndex n = n_states();
  for (StateIndex s = 0; s < n; ++s) {
    const State& ms = states[s];
    if (s) out += "  ";
    out += "{\"n\":" + std::to_string(s);
    if (!ms.name.is_null()) {
      out += ",\n   \"id\":";
      out += ms.name.dump();
    }
    if (!ms.trans.empty()) {
      out += ",\n   \"trans\":[";
      bool first = true;
      for (const auto& t : ms.trans) {
        if (!first) out += ",\n            ";
        first = false;
        out += "{\"to\":" + std::to_string(t.dest);
        if (!t.input_empty()) {
          out += ",\"in\":\"";
          ExprArena::write_escaped_cpp(t.in, out);
          out += '"';
        }
        if (!t.output_empty()) {
          out += ",\"out\":\"";
          ExprArena::write_escaped_cpp(t.out, out);
          out += '"';
        }
        if (!A.is_one(t.weight)) {
          out += ",\"weight\":";
          A.to_json_str(t.weight, out);
        }
        out += '}';
      }
      out += ']';
    }
    out += '}';
    if (s < n - 1) out += ",\n";
  }
  out += "\n ]\n}\n";
  return out;
}

}  // namespace mb
