"""EM checkpoint/resume: an interrupted-and-resumed fit must equal the
uninterrupted run exactly (the property checkpoints exist for).

The reference has no in-process checkpointing — its de-facto checkpoint is
re-seeding from an emitted params JSON (ref src/fitter.cpp:26-45,
target/boss.cpp:768); algo/fitter.py makes that automatic, and these tests
back the claim."""

import json
import os

import numpy as np
import pytest

from conftest import REF

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import Constraints
from machineboss_tpu.core.seqpair import SeqPairList
from machineboss_tpu.algo.fitter import MachineFitter
from machineboss_tpu.algo import counts as counts_mod


def _load(path):
    with open(path) as f:
        return json.load(f)


def _setup():
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    cons = Constraints.from_json(_load(REF + "/t/io/pqcons.json"))
    spl = SeqPairList.from_json(_load(REF + "/t/io/seqpairlist.json"))
    return m, cons, spl


def _params_dict(p):
    return {k: float(p.defs[k]) for k in p.defs}


def test_checkpoint_resume_equals_uninterrupted(tmp_path):
    m, cons, spl = _setup()
    full = MachineFitter(machine=m, constraints=cons,
                         seed=cons.default_params()).fit(spl)

    ck = str(tmp_path / "em.ckpt.json")
    # phase 1: stop after 2 EM iterations, checkpointing each one
    part = MachineFitter(machine=m, constraints=cons,
                         seed=cons.default_params(),
                         checkpoint_path=ck).fit(spl, max_iterations=1)
    assert os.path.exists(ck)
    state = _load(ck)
    assert state["iteration"] == 1
    assert np.isfinite(state["loglike"])
    assert part is not None

    # phase 2: a fresh fitter (fresh seed — the checkpoint must carry the
    # params) resumes from the checkpoint and converges. Prove the resume
    # really reads the checkpoint (iteration + params + loglike restored).
    fitter = MachineFitter(machine=m, constraints=cons,
                           seed=cons.default_params(),
                           checkpoint_path=ck)
    it0, p0, ll0 = fitter._load_checkpoint()
    assert it0 == 1
    got0, want0 = _params_dict(p0), _params_dict(part)
    for k in want0:  # JSON round-trip noise only (~1e-16)
        assert abs(got0[k] - want0[k]) < 1e-12, k
    assert ll0 == state["loglike"]
    resumed = fitter.fit(spl)
    assert _load(ck)["iteration"] > 1  # the resumed loop advanced it
    want, got = _params_dict(full), _params_dict(resumed)
    assert want.keys() == got.keys()
    for k in want:
        assert abs(want[k] - got[k]) < 1e-12, (k, want[k], got[k])


def test_checkpoint_resume_after_kill(tmp_path, monkeypatch):
    """Kill the fit mid-run (exception out of the M-step), then resume."""
    m, cons, spl = _setup()
    full = MachineFitter(machine=m, constraints=cons,
                         seed=cons.default_params()).fit(spl)

    ck = str(tmp_path / "em.ckpt.json")
    calls = {"n": 0}
    real_optimize = counts_mod.MachineObjective.optimize

    def dying_optimize(self, params):
        if calls["n"] >= 1:
            raise KeyboardInterrupt("simulated kill at iteration 1")
        calls["n"] += 1
        return real_optimize(self, params)

    monkeypatch.setattr(counts_mod.MachineObjective, "optimize",
                        dying_optimize)
    with pytest.raises(KeyboardInterrupt):
        MachineFitter(machine=m, constraints=cons,
                      seed=cons.default_params(),
                      checkpoint_path=ck).fit(spl)
    monkeypatch.setattr(counts_mod.MachineObjective, "optimize",
                        real_optimize)

    assert _load(ck)["iteration"] == 1
    resumed = MachineFitter(machine=m, constraints=cons,
                            seed=cons.default_params(),
                            checkpoint_path=ck).fit(spl)
    want, got = _params_dict(full), _params_dict(resumed)
    for k in want:
        assert abs(want[k] - got[k]) < 1e-12, k


def test_checkpoint_atomic_and_overwritten(tmp_path):
    """Each iteration overwrites the checkpoint atomically (no .tmp left)."""
    m, cons, spl = _setup()
    ck = str(tmp_path / "em.ckpt.json")
    MachineFitter(machine=m, constraints=cons, seed=cons.default_params(),
                  checkpoint_path=ck).fit(spl, max_iterations=3)
    assert not os.path.exists(ck + ".tmp")
    state = _load(ck)
    assert set(state) >= {"iteration", "loglike", "params"}
    # this data converges at iteration 2, before the cap
    assert state["iteration"] == 2
