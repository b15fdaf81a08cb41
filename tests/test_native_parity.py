"""Native C++ core parity: every native op must be BYTE-IDENTICAL to the
Python host layer (the semantic reference) on the reference's own machines.

Covers the full native op surface (native/machine.cpp via the C ABI):
compose, intersect, advance_sort, advancing, drop_silent_back, ergodic,
waiting, eliminate_silent, merge_equivalent, reverse, transpose,
zero_or_one, kleene_plus, kleene_star, concat, union — 16 ops.

Skips when native/libmbcore.so is not built (make -C native)."""

import itertools
import json

import pytest

from conftest import REF

from machineboss_tpu import native
from machineboss_tpu.core.machine import Machine

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

MACHINES = ["bitecho", "bitstutter", "bitnoise", "unitindel",
            "bitstutter-noise", "counter"]


def load(name):
    return Machine.from_file(REF + "/t/machine/%s.json" % name)


def jtext(m):
    """State-graph JSON text (the native core's contract; funcs/cons are
    carried by the Python wrapper, not the library)."""
    m2 = m.clone()
    m2.funcs = type(m2.funcs)()
    m2.cons = type(m2.cons)()
    return m2.to_json_str()


@pytest.mark.parametrize("a,b", [("bitecho", "bitstutter"),
                                 ("bitstutter", "bitnoise"),
                                 ("unitindel", "unitindel"),
                                 ("bitecho", "bitecho")])
def test_native_compose_parity(a, b):
    ma, mb = load(a), load(b)
    py = Machine.compose(ma, mb)
    nat = native.compose_json(jtext(ma), jtext(mb), 2)
    assert nat == jtext(py)


TRANSFORMS = [
    ("advance_sort", lambda m: m.advance_sort()),
    ("advancing", lambda m: m.advancing_machine()),
    ("drop_silent_back", lambda m: m.drop_silent_back_transitions()),
    ("ergodic", lambda m: m.ergodic_machine()),
    ("waiting", lambda m: m.waiting_machine()),
    ("eliminate_silent", lambda m: m.eliminate_silent_transitions()),
    ("merge_equivalent", lambda m: m.merge_equivalent_states()),
    ("reverse", lambda m: m.reverse()),
    ("transpose", lambda m: m.transpose()),
    ("zero_or_one", lambda m: Machine.zero_or_one(m)),
    ("kleene_plus", lambda m: Machine.kleene_plus(m)),
    ("kleene_star", lambda m: Machine.kleene_star(m)),
]


@pytest.mark.parametrize("op,py_fn", TRANSFORMS,
                         ids=[t[0] for t in TRANSFORMS])
def test_native_transform_parity(op, py_fn):
    for name in MACHINES:
        m = load(name)
        nat = native.transform_json(jtext(m), op)
        assert nat == jtext(py_fn(m)), (op, name)
    # composed machines exercise pair names + degenerate transitions
    comp = Machine.compose(load("bitstutter"), load("bitnoise"))
    nat = native.transform_json(jtext(comp), op)
    assert nat == jtext(py_fn(comp)), (op, "composed")


@pytest.mark.parametrize("op,py_fn", [
    ("concat", Machine.concatenate),
    ("union", Machine.take_union),
])
def test_native_combine_parity(op, py_fn):
    for a, b in itertools.combinations(MACHINES[:4], 2):
        ma, mb = load(a), load(b)
        nat = native.combine_json(op, jtext(ma), jtext(mb))
        assert nat == jtext(py_fn(ma, mb)), (op, a, b)


def test_native_wired_compose_matches_python(monkeypatch):
    """MB_NATIVE=1 routes Machine.compose through the library; result must
    equal the pure-Python pipeline (including funcs/cons carry-over)."""
    ma, mb = load("bitnoise"), load("bitstutter")
    monkeypatch.setenv("MB_NATIVE", "0")
    py = Machine.compose(ma, mb)
    monkeypatch.setenv("MB_NATIVE", "1")
    nat = Machine.compose(ma, mb)
    assert jtext(nat) == jtext(py)
    assert nat.funcs.defs == py.funcs.defs
    assert json.loads(nat.to_json_str(show_params=True)) == \
        json.loads(py.to_json_str(show_params=True))


def test_native_wired_transforms_match_python(monkeypatch):
    comp = Machine.compose(load("bitstutter"), load("bitnoise"))
    monkeypatch.setenv("MB_NATIVE", "0")
    py_es = comp.eliminate_silent_transitions()
    py_me = comp.merge_equivalent_states()
    monkeypatch.setenv("MB_NATIVE", "1")
    assert jtext(comp.eliminate_silent_transitions()) == jtext(py_es)
    assert jtext(comp.merge_equivalent_states()) == jtext(py_me)


def test_native_intersect_parity(monkeypatch):
    """Native intersect == Python intersect, byte-identical, on
    recognizer projections of the reference machines (intersect requires
    empty output alphabets)."""
    monkeypatch.setenv("MB_NATIVE", "0")
    pairs = [("bitecho", "bitstutter"), ("bitstutter", "bitnoise"),
             ("bitecho", "bitecho"), ("unitindel", "bitnoise")]
    for a, b in pairs:
        ra = load(a).silence_output()
        rb = load(b).silence_output()
        py = Machine.intersect(ra, rb)
        nat = native.combine_json("intersect", jtext(ra), jtext(rb),
                                  cycle_strategy=2)
        assert nat == jtext(py), (a, b)
    # wired: MB_NATIVE=1 routes Machine.intersect through the library
    ra = load("bitstutter").silence_output()
    rb = load("bitnoise").silence_output()
    py = Machine.intersect(ra, rb)
    monkeypatch.setenv("MB_NATIVE", "1")
    nat = Machine.intersect(ra, rb)
    assert jtext(nat) == jtext(py)
