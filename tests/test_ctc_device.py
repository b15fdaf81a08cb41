"""Device CTC node scoring vs the host PrefixTree node fill."""

import numpy as np

from conftest import REF

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.algo.ctc import PrefixTree
from machineboss_tpu.algo.ctc_device import CTCDeviceModel

TOL = 1e-3


def test_ctc_device_node_fill_matches_host():
    m = Machine.from_file(REF + "/t/machine/bintern.json")
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    out_syms = list("12222")
    tree = PrefixTree(ev, out_syms)
    out_toks = ev.output_tokenizer.tokenize(out_syms)
    model = CTCDeviceModel(ev, out_toks)

    # root
    seq, pref, lpp = model.fill(
        np.zeros((len(out_syms) + 1, ev.n_states())), 0)
    root = tree.root
    _cmp(seq, root.seq_cell)
    _cmp(pref, root.prefix_cell)
    if root.log_prefix_prob == -np.inf:
        assert lpp < -1e20
    else:
        assert abs(lpp - root.log_prefix_prob) < TOL

    # children of root, all tokens at once
    seqs, prefs, lpps = model.fill_all_tokens(root.seq_cell)
    tree._extend_node(root)
    for child in root.child:
        t = child.in_tok - 1
        _cmp(seqs[t], child.seq_cell)
        if child.log_prefix_prob == -np.inf:
            assert lpps[t] < -1e20, (child.in_tok, lpps[t])
        else:
            assert abs(lpps[t] - child.log_prefix_prob) < TOL, (
                child.in_tok, lpps[t], child.log_prefix_prob)


def _cmp(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mask = b > -1e20
    assert np.all(np.abs(np.where(mask, a - b, 0)) < TOL), \
        np.abs(np.where(mask, a - b, 0)).max()
    assert np.all(a[~mask] < -1e20)
