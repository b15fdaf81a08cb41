"""Pallas wavefront kernel (interpret mode) vs host oracle."""

import json

import numpy as np

from conftest import REF

import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops.pallas.wavefront_kernel import make_wavefront_forward

TOL = 1e-2


def test_pallas_wavefront_interpret():
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = lm.matrices_2d()
    B, Li, Lo = 8, 6, 7
    rng = np.random.RandomState(0)
    in_seqs = [["01"[c] for c in rng.randint(0, 2, rng.randint(1, Li + 1))]
               for _ in range(B)]
    out_seqs = [["01"[c] for c in rng.randint(0, 2, rng.randint(1, Lo + 1))]
                for _ in range(B)]
    it = np.zeros((B, Li), np.int32)
    ot = np.zeros((B, Lo), np.int32)
    il = np.zeros(B, np.int32)
    ol = np.zeros(B, np.int32)
    hosts = []
    for n, (i_s, o_s) in enumerate(zip(in_seqs, out_seqs)):
        ti = [ev.input_tokenizer.sym2tok[c] - 1 for c in i_s]
        to = [ev.output_tokenizer.sym2tok[c] - 1 for c in o_s]
        it[n, :len(ti)] = ti
        ot[n, :len(to)] = to
        il[n] = len(ti)
        ol[n] = len(to)
        hosts.append(ForwardMatrix(ev, SeqPair(
            NamedSeq("i", i_s), NamedSeq("o", o_s))).log_like())
    for merged, variant in ((False, None), (True, None),
                            (False, "seqscale")):
        for split in (False, True):
            if variant == "seqscale" and not split:
                continue
            fwd = make_wavefront_forward(ad, al, au, cl, B, Li, Lo,
                                         interpret=True, split=split,
                                         merged=merged, variant=variant)
            dev = np.array(fwd(jnp.array(it), jnp.array(ot), jnp.array(il),
                               jnp.array(ol)))
            for n in range(B):
                if hosts[n] == -np.inf:
                    assert dev[n] < -1e20, (merged, split, n)
                else:
                    assert abs(dev[n] - hosts[n]) < TOL, \
                        (merged, split, n, hosts[n], dev[n])


def test_pallas_wavefront_factored_interpret():
    """Destination-factored variant: exact on full-rank random machines and
    on structured (prot2dna, rank 1/4/0) machines, ragged lengths."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer, CODONS
    from machineboss_tpu.ops.host_oracle import forward_2d_f64

    # full-rank random transducer (factored == generic cost, must be exact)
    alphabet = list("ACGT")
    m = build_random_transducer(6, alphabet, seed=3)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = (np.asarray(x) for x in lm.matrices_2d())
    B, L = 4, 7
    rng = np.random.RandomState(5)
    it = rng.randint(0, 4, (B, L)).astype(np.int32)
    ot = rng.randint(0, 4, (B, L)).astype(np.int32)
    il = np.full(B, L, np.int32)
    ol = np.full(B, L, np.int32)
    il[1], ol[1] = L - 2, L - 2
    fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                 interpret=True, variant="factored")
    dev = np.array(fwd(jnp.array(it), jnp.array(ot), jnp.array(il),
                       jnp.array(ol)))
    f64 = (ad.astype(np.float64), al.astype(np.float64),
           au.astype(np.float64), cl.astype(np.float64))
    for n in range(B):
        ref = forward_2d_f64(*f64, it[n][:il[n]], ot[n][:ol[n]])
        if ref <= -1e29:
            assert dev[n] < -1e20, n
        else:
            assert abs(dev[n] - ref) < TOL, (n, ref, dev[n])

    # prot2dna (S=132, Ti=20, To=4; ranks 1 left / 4 up / 0 diag)
    from machineboss_tpu.core.presets import make_preset
    p = make_preset("prot2dna")
    pev = EvaluatedMachine(p, p.get_param_defs(True))
    plm = LoweredMachine(pev, dtype=np.float32)
    pd, pl_, pu, pc = (np.asarray(x) for x in plm.matrices_2d())
    aas = sorted(CODONS)
    in_tok = {a: pev.input_tokenizer.sym2tok[a] - 1 for a in aas}
    out_tok = {ch: pev.output_tokenizer.sym2tok[ch] - 1 for ch in "ACGT"}
    B2, Lp = 3, 5
    Lo2 = 3 * Lp
    it2 = np.zeros((B2, Lp), np.int32)
    ot2 = np.zeros((B2, Lo2), np.int32)
    for b in range(B2):
        prot = [aas[i] for i in rng.randint(0, len(aas), Lp)]
        dna = "".join(CODONS[a] for a in prot)
        it2[b] = [in_tok[a] for a in prot]
        ot2[b] = [out_tok[ch] for ch in dna]
    fwd2 = make_wavefront_forward(pd, pl_, pu, pc, B2, Lp, Lo2,
                                  interpret=True, variant="factored")
    dev2 = np.array(fwd2(jnp.array(it2), jnp.array(ot2),
                         jnp.full(B2, Lp, np.int32),
                         jnp.full(B2, Lo2, np.int32)))
    p64 = (pd.astype(np.float64), pl_.astype(np.float64),
           pu.astype(np.float64), pc.astype(np.float64))
    for n in range(B2):
        ref = forward_2d_f64(*p64, it2[n], ot2[n])
        assert abs(dev2[n] - ref) < TOL, (n, ref, dev2[n])


def test_host_oracle_matches_dp_host():
    """The f64 oracle (bench accuracy gate) equals the table-lse host DP
    within table precision on a random transducer."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer
    from machineboss_tpu.ops.host_oracle import forward_2d_f64
    alphabet = list("ACGT")
    m = build_random_transducer(8, alphabet, seed=11)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float64)
    ad, al, au, cl = (np.asarray(x) for x in lm.matrices_2d())
    rng = np.random.RandomState(2)
    for _ in range(3):
        L = rng.randint(3, 10)
        xs = rng.randint(0, 4, L)
        ys = rng.randint(0, 4, L)
        sp = SeqPair(NamedSeq("i", [alphabet[t] for t in xs]),
                     NamedSeq("o", [alphabet[t] for t in ys]))
        ref = ForwardMatrix(ev, sp).log_like()
        got = forward_2d_f64(ad, al, au, cl, xs, ys)
        assert abs(ref - got) < 2e-5


def build_indel_transducer(n_states, alphabet, seed=13):
    """Transducer with ONLY input-consuming and output-emitting transitions
    (no in+out "diag" class) — exercises the has_diag=False kernel
    specialization (prot2dna has the same class signature)."""
    rng = np.random.RandomState(seed)
    states = []
    for s in range(n_states + 1):
        if s == n_states:
            states.append({"id": "End", "trans": []})
            continue
        trans = []
        for sym in alphabet:
            trans.append({"in": sym, "to": int(rng.randint(0, n_states)),
                          "weight": round(float(rng.uniform(0.1, 0.5)), 4)})
            trans.append({"out": sym, "to": int(rng.randint(0, n_states)),
                          "weight": round(float(rng.uniform(0.1, 0.5)), 4)})
        trans.append({"to": n_states,
                      "weight": round(float(rng.uniform(0.01, 0.1)), 4)})
        states.append({"id": "S%d" % s, "trans": trans})
    return Machine.from_json({"state": states})


def test_pallas_class_specialization_interpret():
    """Class-presence specialization: left+up-only machine (no diag class)
    through merged and chained vs host oracle."""
    import sys
    sys.path.insert(0, "/root/repo")
    alphabet = list("ACGT")
    m = build_indel_transducer(6, alphabet)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = (np.asarray(x) for x in lm.matrices_2d())
    assert float(np.exp(np.asarray(ad, np.float64)).sum()) == 0.0 or \
        float(np.where(ad > -1e29, 1.0, 0.0).sum()) == 0.0, \
        "machine unexpectedly has diag transitions"
    B, L = 6, 6
    rng = np.random.RandomState(4)
    it = rng.randint(0, 4, (B, L)).astype(np.int32)
    ot = rng.randint(0, 4, (B, L)).astype(np.int32)
    il = np.full(B, L, np.int32)
    ol = np.full(B, L, np.int32)
    hosts = []
    for n in range(B):
        sp = SeqPair(NamedSeq("i", [alphabet[t] for t in it[n]]),
                     NamedSeq("o", [alphabet[t] for t in ot[n]]))
        hosts.append(ForwardMatrix(ev, sp).log_like())
    hosts = np.array(hosts)
    for variant, chain in ((None, None), ("chained", 3)):
        for split in (False, True):
            fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                         interpret=True, split=split,
                                         merged=True, variant=variant,
                                         chain=chain)
            dev = np.array(fwd(jnp.array(it), jnp.array(ot),
                               jnp.array(il), jnp.array(ol)))
            err = np.abs(dev - hosts).max()
            assert err < TOL, (variant, split, err)


def test_pallas_wavefront_chained_interpret():
    """Chained (sequence-packed) variant vs host oracle, uniform lengths."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer
    alphabet = list("ACGT")
    m = build_random_transducer(6, alphabet, seed=7)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = lm.matrices_2d()
    for chain, nw, L in ((3, 4, 6), (1, 6, 5), (5, 1, 7)):
        B = chain * nw
        rng = np.random.RandomState(chain)
        it = rng.randint(0, 4, (B, L)).astype(np.int32)
        ot = rng.randint(0, 4, (B, L)).astype(np.int32)
        hosts = []
        for n in range(B):
            sp = SeqPair(NamedSeq("i", [alphabet[t] for t in it[n]]),
                         NamedSeq("o", [alphabet[t] for t in ot[n]]))
            hosts.append(ForwardMatrix(ev, sp).log_like())
        il = np.full(B, L, np.int32)
        ol = np.full(B, L, np.int32)
        for split in (False, True):
            fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                         interpret=True, split=split,
                                         variant="chained", chain=chain)
            dev = np.array(fwd(jnp.array(it), jnp.array(ot),
                               jnp.array(il), jnp.array(ol)))
            err = np.abs(dev - np.array(hosts)).max()
            assert err < TOL, (chain, split, err)


def build_allclass_transducer(n_states, alphabet, seed=9):
    """Machine with all three transition classes (in+out, in-only,
    out-only) — the exact configuration whose generic-kernel handling
    miscompiled on real TPU at L>=200 (see _merged_kernel docstring)."""
    import json as _json
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer
    m = build_random_transducer(n_states, alphabet, seed=seed)
    js = _json.loads(m.to_json_str())
    for s in js["state"][:-1]:
        s["trans"].append({"in": alphabet[0], "to": 0, "weight": 0.11})
        s["trans"].append({"out": alphabet[-1], "to": 1, "weight": 0.13})
    return Machine.from_json(js)


def test_pallas_all_classes_ragged_interpret():
    """All-class machine, ragged lengths, through merged (unified
    left-fold) and lowrank; chained (uniform lengths) separately."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer  # noqa: F401 (fixture dep)
    from machineboss_tpu.ops.host_oracle import forward_2d_f64
    alphabet = list("AC")
    m = build_allclass_transducer(5, alphabet)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = (np.asarray(x) for x in lm.matrices_2d())
    # all three classes must be present for this test to mean anything
    for t_ in (ad, al, au):
        assert float(np.where(t_ > -1e29, 1.0, 0.0).sum()) > 0
    B, L = 6, 7
    rng = np.random.RandomState(8)
    it = rng.randint(0, 2, (B, L)).astype(np.int32)
    ot = rng.randint(0, 2, (B, L)).astype(np.int32)
    il = np.full(B, L, np.int32)
    ol = np.full(B, L, np.int32)
    il[1], ol[1] = L - 3, L - 1
    il[2], ol[2] = L - 1, L - 4
    f64 = tuple(x.astype(np.float64) for x in (ad, al, au, cl))
    refs = np.array([forward_2d_f64(*f64, it[b][:il[b]], ot[b][:ol[b]])
                     for b in range(B)])

    def check(dev, refs, tag):
        for b in range(B):
            if refs[b] <= -1e29:
                assert dev[b] < -1e20, (tag, b, dev[b])
            else:
                assert abs(dev[b] - refs[b]) < TOL, (tag, b, refs[b],
                                                     dev[b])

    for variant, merged in ((None, True), ("lowrank", False)):
        for split in (False, True):
            fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                         interpret=True, split=split,
                                         merged=merged, variant=variant)
            dev = np.array(fwd(jnp.array(it), jnp.array(ot),
                               jnp.array(il), jnp.array(ol)))
            check(dev, refs, (variant, split))
    # chained needs uniform lengths
    il[:] = L
    ol[:] = L
    refs_u = np.array([forward_2d_f64(*f64, it[b], ot[b])
                       for b in range(B)])
    for variant in ("chained", "lowrank"):
        fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                     interpret=True, variant=variant,
                                     chain=3)
        dev = np.array(fwd(jnp.array(it), jnp.array(ot),
                           jnp.array(il), jnp.array(ol)))
        check(dev, refs_u, ("chained", variant))


def test_pallas_split_quality_tight():
    """Split (bf16x2) kernels must track the f64 oracle to <=2e-3 nats at
    L>=16 — tight enough to catch an accidental single-pass-bf16
    regression (~5e-2 measured; PERF.md error budget)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer
    from machineboss_tpu.ops.host_oracle import forward_2d_f64
    alphabet = list("ACGT")
    m = build_random_transducer(8, alphabet, seed=15)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = (np.asarray(x) for x in lm.matrices_2d())
    B, L = 2, 20
    rng = np.random.RandomState(6)
    it = rng.randint(0, 4, (B, L)).astype(np.int32)
    ot = rng.randint(0, 4, (B, L)).astype(np.int32)
    il = np.full(B, L, np.int32)
    ol = np.full(B, L, np.int32)
    f64 = tuple(x.astype(np.float64) for x in (ad, al, au, cl))
    refs = np.array([forward_2d_f64(*f64, it[b], ot[b]) for b in range(B)])
    # lowrank's SVD factors cancel more than the nonneg merged layout,
    # so its bound is looser — still 10x below the single-pass drift mode
    for merged, variant, bound in ((True, None, 2e-3),
                                   (False, "lowrank", 5e-3)):
        fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                     interpret=True, split=True,
                                     merged=merged, variant=variant)
        dev = np.array(fwd(jnp.array(it), jnp.array(ot), jnp.array(il),
                           jnp.array(ol)))
        err = np.abs(dev - refs).max()
        assert err < bound, (merged, variant, err)


def test_chained_ragged_matches_oracle():
    """The RAGGED chained kernel (per-window per-chain stagger
    D[w,k+1] = D[w,k] + ol[k,w] + 2, host-streamed validity/finish
    metadata) matches the f64 oracle on mixed-length batches, for both
    a diag-only machine and one with insert/delete classes."""
    from machineboss_tpu.ops.pallas.wavefront_kernel import \
        make_wavefront_forward
    from machineboss_tpu.ops.host_oracle import forward_2d_f64
    from bench import build_random_transducer
    from machineboss_tpu.core.machine import Machine

    rng = np.random.RandomState(1)

    def check(machine, same_len):
        ev = EvaluatedMachine(machine, machine.get_param_defs(True))
        lm = LoweredMachine(ev, dtype=np.float32)
        mats = tuple(np.asarray(x) for x in lm.matrices_2d())
        B_total, Li, Lo, K = 8, 14, 14, 4
        it = rng.randint(0, 4, (B_total, Li)).astype(np.int32)
        ot = rng.randint(0, 4, (B_total, Lo)).astype(np.int32)
        il = rng.randint(7, Li + 1, B_total).astype(np.int32)
        ol = il.copy() if same_len else \
            rng.randint(7, Lo + 1, B_total).astype(np.int32)
        fn = make_wavefront_forward(*mats, B_total, Li, Lo, merged=True,
                                    variant="chained_ragged", chain=K,
                                    interpret=True)
        got = np.array(fn(jnp.array(it), jnp.array(ot), jnp.array(il),
                          jnp.array(ol)))
        m64 = tuple(np.asarray(x, np.float64) for x in mats)
        for b in range(B_total):
            want = forward_2d_f64(*m64, it[b][:il[b]], ot[b][:ol[b]])
            if want < -1e29:
                assert got[b] < -1e29, b
            else:
                assert abs(got[b] - want) < 2e-3, (b, want, got[b])

    check(build_random_transducer(6, list("ACGT"), seed=3), True)
    indel = {"state": [
        {"id": "s", "trans": [
            {"in": a, "out": b, "to": "s",
             "weight": 0.4 if a == b else 0.04}
            for a in "ACGT" for b in "ACGT"
        ] + [{"in": a, "to": "s", "weight": 0.01} for a in "ACGT"
        ] + [{"out": b, "to": "s", "weight": 0.01} for b in "ACGT"
        ] + [{"to": "e", "weight": 0.1}]},
        {"id": "e", "trans": []}]}
    check(Machine.from_json(indel), False)


def test_chained_ragged_odd_start_deep_chain():
    """Regression: a chain starting on an ODD diagonal whose path
    log-weight passes -87.9 nats (the f32 exp underflow line). Diagonal-
    class mass lives on one parity, so a rescale condition firing only
    at d % k == 0 never renormalized odd-parity chains — this exact
    configuration returned -inf before the both-parity rescale fix."""
    from machineboss_tpu.ops.pallas.wavefront_kernel import \
        make_wavefront_forward
    from machineboss_tpu.ops.host_oracle import forward_2d_f64
    from bench import build_random_transducer

    m = build_random_transducer(64, list("ACGT"), seed=42)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    mats = tuple(np.asarray(x) for x in lm.matrices_2d())
    rng = np.random.RandomState(1)
    Li = Lo = 100
    it = rng.randint(0, 4, (4, Li)).astype(np.int32)
    ot = rng.randint(0, 4, (4, Lo)).astype(np.int32)
    il = np.array([56, 53, 99], np.int32)   # chain 2 starts at d=113 (odd)
    fn = make_wavefront_forward(*mats, 3, Li, Lo, merged=True,
                                variant="chained_ragged", chain=3,
                                interpret=True)
    got = np.array(fn(jnp.array(it[:3]), jnp.array(ot[:3]),
                      jnp.array(il), jnp.array(il)))
    m64 = tuple(np.asarray(x, np.float64) for x in mats)
    want = forward_2d_f64(*m64, it[2][:99], ot[2][:99])
    assert want < -87        # the scenario must actually cross the line
    assert got[2] > -1e29
    assert abs(got[2] - want) < 5e-3, (want, got[2])
