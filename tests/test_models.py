"""Model-family layer tests (machineboss_tpu/models/)."""

import math

import numpy as np
import pytest

from machineboss_tpu import api
from machineboss_tpu.models import casino, ctc, pairhmm, profile, tkf91

ROLLS = "154233314562365566666655661521246"


def test_casino_fixed_vs_parameterized_default():
    m_fix = casino.casino_machine(parameterized=False)
    m_par = casino.casino_machine(parameterized=True)
    ll_fix = api.forward_loglike(m_fix, "", ROLLS)
    ll_par = api.forward_loglike(m_par, "", ROLLS,
                                 params=casino.DEFAULTS)
    assert math.isfinite(ll_fix)
    assert abs(ll_fix - ll_par) < 1e-6


def test_casino_decode_names():
    ll, names = casino.decode("666666666")
    assert math.isfinite(ll)
    assert set(names) <= {"Fair", "Loaded", "End"}
    # a long run of sixes should pass through the Loaded state
    assert "Loaded" in names


def test_casino_fit_improves_loglike():
    m = casino.casino_machine(parameterized=True)
    data = [ROLLS, "66666666666666", "123456123456"]
    ll0 = sum(api.forward_loglike(m, "", r, params=casino.DEFAULTS)
              for r in data)
    fitted = casino.fit(data)
    ll1 = sum(api.forward_loglike(m, "", r, params=fitted) for r in data)
    assert ll1 >= ll0 - 1e-9


def test_pairhmm_align_and_device_score():
    pm = pairhmm.PairModel("dnapsw")
    ll, path = pm.align("ACGTACGT", "ACGAACGT")
    assert math.isfinite(ll)
    assert path.input_sequence() == list("ACGTACGT")
    host = [pm.loglike("ACGT", "ACGA"), pm.loglike("ACGTA", "ACG")]
    dev = pm.score_batch([("ACGT", "ACGA"), ("ACGTA", "ACG")])
    np.testing.assert_allclose(np.array(dev), np.array(host), atol=1e-2)


def test_ctc_model_decode_and_sample():
    csv = "A,C,G,T\n" \
          "0.7,0.1,0.1,0.1\n" \
          "0.6,0.2,0.1,0.1\n" \
          "0.1,0.1,0.1,0.7\n"
    model = ctc.CTCModel(csv)
    seq, ll = model.decode()
    assert math.isfinite(ll)
    # two A-ish positions merge: most likely merged labels are A then T
    assert "".join(seq) == "AT"
    samples = model.sample(5, seed=1)
    assert len(samples) == 5


def test_ctc_merging_machine_collapses_repeats():
    m = ctc.merging_machine("AB")
    # input AB can be output as AAB (repeat of A collapses)
    ll = api.forward_loglike(m, "AB", "AAB")
    assert math.isfinite(ll)
    # output ABA cannot come from input AB
    ll_bad = api.forward_loglike(m, "AB", "ABA")
    assert ll_bad == -math.inf or ll_bad < -1e29


def test_tkf91_root_and_descendant_loglike():
    params = tkf91.tkf91_params(0.5, 1.0, t=0.2)
    root = tkf91.root_machine()
    ll_root = api.forward_loglike(root, "", "ACGT", params=params)
    assert math.isfinite(ll_root)
    # root (x) branch = generator of the descendant sequence
    desc = tkf91.pair_machine()
    ll_desc = api.forward_loglike(desc, "", "ACG", params=params)
    assert math.isfinite(ll_desc)
    with pytest.raises(ValueError):
        tkf91.tkf91_params(1.0, 0.5)


def test_profile_pswm_machine():
    csv = "A,C\n0.9,0.1\n0.2,0.8\n"
    prof = profile.PSWMProfile(csv)
    m = prof.machine()
    ll = api.forward_loglike(m, "", "AC")
    assert abs(ll - math.log(0.9 * 0.8)) < 1e-6
