/**
 * HMMER3 profile parser for the JS runtime.
 *
 * Mirrors machineboss_tpu/core/hmmer.HmmerModel.read (ref src/hmmer.cpp):
 * '*' is probability zero, other fields are exp(-score) with the score
 * parsed at float32 precision (Math.fround of the decimal, matching the
 * C++ stof / Python struct-f32 round trip). The SwissProt background
 * frequencies provide the null model.
 */

const BG_FREQ = {
  A: 0.0825, C: 0.0138, D: 0.0546, E: 0.0673,
  F: 0.0386, G: 0.0708, H: 0.0227, I: 0.0592,
  K: 0.0581, L: 0.0965, M: 0.0241, N: 0.0405,
  P: 0.0473, Q: 0.0393, R: 0.0553, S: 0.0663,
  T: 0.0535, V: 0.0686, W: 0.0109, Y: 0.0292,
};

function strToProb(s) {
  if (s === '*') return 0.0;
  return Math.exp(-Math.fround(parseFloat(s)));
}

function splitFields(line) {
  return line.trim().split(' ').filter(f => f.length > 0);
}

/**
 * Parse HMMER3 text -> {alph, ins0Emit, nullEmit, bToM1, bToI0, bToD1,
 * i0ToM1, i0ToI0, node: [{matchEmit, insEmit, mToM, mToI, mToD, iToM,
 * iToI, dToM, dToD}]}.
 */
export function parseHmmer(text) {
  const lines = text.split('\n');
  const model = {
    alph: [], ins0Emit: [], nullEmit: [], node: [],
    bToM1: 0, bToI0: 0, bToD1: 0, i0ToM1: 0, i0ToI0: 0,
  };
  let i = 0;
  let found = false;
  for (; i < lines.length; i++) {
    const line = lines[i];
    // the tag is the full leading run of capitals: "HMMER3/f" is not "HMM"
    let tag = '';
    for (let c = 0; c < line.length; c++) {
      const ch = line.charAt(c);
      if (ch >= 'A' && ch <= 'Z') tag = tag + ch; else break;
    }
    if (tag === 'HMM') {
      const fields = splitFields(line);
      if (fields.length <= 1) throw new Error('HMM parse error: empty alphabet');
      model.alph = fields.slice(1);
      found = true;
      break;
    }
  }
  if (!found) throw new Error('HMM parse error: no HMM line');
  i += 3;  // transition header + COMPO line -> node-0 insert line
  const ins0 = splitFields(lines[i]);
  if (ins0.length !== model.alph.length) {
    throw new Error('HMM parse error: wrong number of fields in node 0 insert line');
  }
  model.ins0Emit = ins0.map(strToProb);
  i += 1;
  const begin = splitFields(lines[i]);
  model.bToM1 = strToProb(begin[0]);
  model.bToI0 = strToProb(begin[1]);
  model.bToD1 = strToProb(begin[2]);
  model.i0ToM1 = strToProb(begin[3]);
  model.i0ToI0 = strToProb(begin[4]);
  i += 1;
  for (; i < lines.length; i++) {
    if (lines[i].startsWith('//')) break;
    const matchLine = splitFields(lines[i]);
    if (matchLine.length !== model.alph.length + 6) {
      throw new Error('HMM parse error: wrong number of fields in node match line');
    }
    if (parseInt(matchLine[0], 10) !== model.node.length + 1) {
      throw new Error('HMM parse error: incorrect node index');
    }
    const insLine = splitFields(lines[i + 1]);
    if (insLine.length !== model.alph.length) {
      throw new Error('HMM parse error: wrong number of fields in node insert line');
    }
    const transLine = splitFields(lines[i + 2]);
    if (transLine.length !== 7) {
      throw new Error('HMM parse error: wrong number of fields in node transitions line');
    }
    const n = {
      matchEmit: matchLine.slice(1, model.alph.length + 1).map(strToProb),
      insEmit: insLine.map(strToProb),
      mToM: strToProb(transLine[0]),
      mToI: strToProb(transLine[1]),
      mToD: strToProb(transLine[2]),
      iToM: strToProb(transLine[3]),
      iToI: strToProb(transLine[4]),
      dToM: strToProb(transLine[5]),
      dToD: strToProb(transLine[6]),
    };
    model.node.push(n);
    i += 2;
  }
  model.nullEmit = model.alph.map(
    sym => (sym in BG_FREQ ? BG_FREQ[sym] : 1.0 / model.alph.length));
  return model;
}

/**
 * Match-state occupancy probabilities (p7_hmm_CalculateOccupancy), used
 * for local-entry weights. Mirrors core/hmmer.calc_match_occupancy.
 */
export function calcMatchOccupancy(model) {
  const K = model.node.length;
  const mocc = new Float64Array(K);
  if (K > 1) mocc[1] = model.node[0].mToI + model.node[0].mToM;
  for (let k = 2; k < K; k++) {
    mocc[k] = mocc[k - 1] * (model.node[k].mToM + model.node[k].mToI)
      + (1.0 - mocc[k - 1]) * model.node[k].dToM;
  }
  return mocc;
}
