/**
 * WebGPU 1D engines: transfer-matrix build, Hillis-Steele prefix scan,
 * and readout — all three stages on GPU
 * (shaders/transferbuild1d{,-profile}.wgsl, prefixscan1d.wgsl,
 * extract1d.wgsl). Forward, Viterbi (max-plus mode), and Backward
 * (suffix products via reversed-and-transposed matrices through the
 * same forward scan), each in token and PSWM-profile variants.
 *
 * Reference capability: ref js/webgpu/gpu/forward-1d.mjs,
 * forward-1d-profile.mjs, viterbi-1d.mjs, viterbi-1d-profile.mjs,
 * backward-1d.mjs, backward-1d-profile.mjs, shaders/transfer-build
 * {,-profile}.wgsl, prefix-scan.wgsl, extract.wgsl.
 */

import {
  createStorageBuffer, createUniformBuffer, readbackFloats,
  makeComputePipeline, bindGroupFor,
} from './pipeline.mjs';

const URLS = {
  build: './shaders/transferbuild1d.wgsl',
  buildProfile: './shaders/transferbuild1d-profile.wgsl',
  scan: './shaders/prefixscan1d.wgsl',
  extract: './shaders/extract1d.wgsl',
};
const sources = {};

async function loadShader(which) {
  if (sources[which] !== undefined) return sources[which];
  const resp = await fetch(URLS[which]);
  if (!resp.ok) throw new Error(`cannot load ${URLS[which]}`);
  sources[which] = await resp.text();
  return sources[which];
}

function f32Clamped(arr) {
  const out = new Float32Array(arr.length);
  for (let i = 0; i < arr.length; i++) {
    out[i] = arr[i] === -Infinity ? -3.0e38 : arr[i];
  }
  return out;
}

function dispatch(device, pipeline, buffers, nGroups) {
  const bind = bindGroupFor(device, pipeline, buffers);
  const enc = device.createCommandEncoder();
  const pass = enc.beginComputePass();
  pass.setPipeline(pipeline);
  pass.setBindGroup(0, bind);
  pass.dispatchWorkgroups(nGroups);
  pass.end();
  device.queue.submit([enc.finish()]);
}

function startVector(machine, mode) {
  // closed start vector: row 0 of the mode-matched silent closure
  const closure = mode === 1 && machine.closureMax !== undefined
    ? machine.closureMax : machine.closure;
  const S = machine.nStates;
  const start = new Float32Array(S);
  for (let s = 0; s < S; s++) {
    const v = closure[s];
    start[s] = v === -Infinity ? -3.0e38 : v;
  }
  return start;
}

function endVector(machine) {
  // one-hot end state: the Backward pass's boundary vector
  const S = machine.nStates;
  const start = new Float32Array(S).fill(-3.0e38);
  start[S - 1] = 0;
  return start;
}

async function scanAndExtract(device, machine, matsBuf, L, mode, start) {
  const S = machine.nStates;
  const scanPipe = makeComputePipeline(device, await loadShader('scan'));
  let bufA = matsBuf;
  let bufB = createStorageBuffer(device, new Float32Array(L * S * S));
  for (let stride = 1; stride < L; stride *= 2) {
    const params = createUniformBuffer(device, [S, L, stride, mode]);
    dispatch(device, scanPipe, [params, bufA, bufB],
             Math.ceil((L * S) / 64));
    const t = bufA; bufA = bufB; bufB = t;
  }
  // readout: start vector through every prefix product on GPU
  if (start === undefined) start = startVector(machine, mode);
  const extractPipe = makeComputePipeline(device,
                                          await loadShader('extract'));
  const startBuf = createStorageBuffer(device, start);
  const outBuf = createStorageBuffer(device, new Float32Array(L * S));
  const params = createUniformBuffer(device, [S, L, mode, 0]);
  dispatch(device, extractPipe, [params, bufA, startBuf, outBuf],
           Math.ceil((L * S) / 64));
  const out = await readbackFloats(device, outBuf, L * S);
  bufA.destroy(); bufB.destroy(); startBuf.destroy(); outBuf.destroy();
  return out;
}

function closureFor(machine, mode) {
  return mode === 1 && machine.closureMax !== undefined
    ? machine.closureMax : machine.closure;
}

async function buildMats(device, machine, seq, isInput, mode, revT) {
  const S = machine.nStates;
  const L = seq.length;
  const buildPipe = makeComputePipeline(device, await loadShader('build'));
  const transBuf = createStorageBuffer(device, f32Clamped(machine.logTrans));
  const closBuf = createStorageBuffer(
    device, f32Clamped(closureFor(machine, mode)));
  const tokBuf = createStorageBuffer(device, new Uint32Array(seq));
  const matsBuf = createStorageBuffer(device, new Float32Array(L * S * S));
  const params = createUniformBuffer(
    device,
    [S, machine.nIn, machine.nOut, L, isInput ? 1 : 0, mode, revT, 0]);
  dispatch(device, buildPipe, [params, transBuf, closBuf, tokBuf, matsBuf],
           Math.ceil((L * S * S) / 64));
  transBuf.destroy(); closBuf.destroy(); tokBuf.destroy();
  return matsBuf;
}

async function buildMatsProfile(device, machine, profile, L, nTok, isInput,
                                mode, revT) {
  const S = machine.nStates;
  const buildPipe = makeComputePipeline(device,
                                        await loadShader('buildProfile'));
  const transBuf = createStorageBuffer(device, f32Clamped(machine.logTrans));
  const closBuf = createStorageBuffer(
    device, f32Clamped(closureFor(machine, mode)));
  const profBuf = createStorageBuffer(device, f32Clamped(profile));
  const matsBuf = createStorageBuffer(device, new Float32Array(L * S * S));
  const params = createUniformBuffer(
    device,
    [S, machine.nIn, machine.nOut, L, isInput ? 1 : 0, mode, nTok, revT]);
  dispatch(device, buildPipe, [params, transBuf, closBuf, profBuf, matsBuf],
           Math.ceil((L * S * S) / 64));
  transBuf.destroy(); closBuf.destroy(); profBuf.destroy();
  return matsBuf;
}

async function run1D(device, machine, seq, isInput, mode) {
  const S = machine.nStates;
  const L = seq.length;
  if (L === 0) return closureFor(machine, mode)[S - 1];
  const matsBuf = await buildMats(device, machine, seq, isInput, mode, 0);
  const out = await scanAndExtract(device, machine, matsBuf, L, mode);
  const v = out[(L - 1) * S + (S - 1)];
  return v <= -1.0e38 ? -Infinity : v;
}

export async function forward1DGPU(device, machine, inputTokens,
                                   outputTokens) {
  const isInput = !(inputTokens === null || inputTokens === undefined);
  return run1D(device, machine, isInput ? inputTokens : outputTokens,
               isInput, 0);
}

/** Viterbi 1D: max-plus scan over the same transfer pipeline
 * (ref js/webgpu/gpu/viterbi-1d.mjs). */
export async function viterbi1DGPU(device, machine, inputTokens,
                                   outputTokens) {
  const isInput = !(inputTokens === null || inputTokens === undefined);
  return run1D(device, machine, isInput ? inputTokens : outputTokens,
               isInput, 1);
}

/**
 * Backward 1D: per-position backward value vectors b_p = M_{p+1} (x)
 * ... (x) M_L (x) e_end, computed with the SAME forward prefix scan
 * over reversed-and-transposed transfer matrices (revT=1 in
 * transferbuild1d.wgsl) and the one-hot end vector in the extract
 * stage; out[(L-1-p)*S + d] = b_p[d]. Returns { values, logLike }
 * where logLike contracts b_0 against the closed start vector
 * (ref js/webgpu/gpu/backward-1d.mjs).
 */
export async function backward1DGPU(device, machine, inputTokens,
                                    outputTokens, mode = 0) {
  const isInput = !(inputTokens === null || inputTokens === undefined);
  const seq = isInput ? inputTokens : outputTokens;
  const S = machine.nStates;
  const L = seq.length;
  if (L === 0) {
    const v = closureFor(machine, mode)[S - 1];
    return { values: new Float32Array(0), logLike: v };
  }
  const matsBuf = await buildMats(device, machine, seq, isInput, mode, 1);
  const values = await scanAndExtract(device, machine, matsBuf, L, mode,
                                      endVector(machine));
  return { values, logLike: contractStart(machine, values, L, mode) };
}

function contractStart(machine, values, L, mode) {
  // log-likelihood from the backward vectors: start (x) b_0
  const S = machine.nStates;
  const start = startVector(machine, mode);
  let ll = -Infinity;
  for (let s = 0; s < S; s++) {
    const b0 = values[(L - 1) * S + s];     // b_0[s]
    if (start[s] > -1.0e38 && b0 > -1.0e38) {
      const term = start[s] + b0;
      if (mode === 1) {
        ll = Math.max(ll, term);
      } else if (ll === -Infinity) {
        ll = term;
      } else {
        ll = Math.max(ll, term)
          + Math.log1p(Math.exp(-Math.abs(ll - term)));
      }
    }
  }
  return ll;
}

/**
 * PSWM profile variant: profile is an (L x nTok) row-major log-prob
 * array (column 0 = epsilon, unused); emissions marginalize over
 * tokens on GPU (transferbuild1d-profile.wgsl).
 */
export async function forward1DProfileGPU(device, machine, profile, L,
                                          nTok, isInput) {
  const S = machine.nStates;
  if (L === 0) return machine.closure[S - 1];
  const matsBuf = await buildMatsProfile(device, machine, profile, L, nTok,
                                         isInput, 0, 0);
  const out = await scanAndExtract(device, machine, matsBuf, L, 0);
  const v = out[(L - 1) * S + (S - 1)];
  return v <= -1.0e38 ? -Infinity : v;
}

/** Profile Viterbi: max-plus over the profile transfer pipeline
 * (ref js/webgpu/gpu/viterbi-1d-profile.mjs). */
export async function viterbi1DProfileGPU(device, machine, profile, L,
                                          nTok, isInput) {
  const S = machine.nStates;
  if (L === 0) return closureFor(machine, 1)[S - 1];
  const matsBuf = await buildMatsProfile(device, machine, profile, L, nTok,
                                         isInput, 1, 0);
  const out = await scanAndExtract(device, machine, matsBuf, L, 1);
  const v = out[(L - 1) * S + (S - 1)];
  return v <= -1.0e38 ? -Infinity : v;
}

/** Profile Backward: suffix products over the profile-marginalized
 * transfer matrices (ref js/webgpu/gpu/backward-1d-profile.mjs). */
export async function backward1DProfileGPU(device, machine, profile, L,
                                           nTok, isInput, mode = 0) {
  const S = machine.nStates;
  if (L === 0) {
    return { values: new Float32Array(0),
             logLike: closureFor(machine, mode)[S - 1] };
  }
  const matsBuf = await buildMatsProfile(device, machine, profile, L, nTok,
                                         isInput, mode, 1);
  const values = await scanAndExtract(device, machine, matsBuf, L, mode,
                                      endVector(machine));
  return { values, logLike: contractStart(machine, values, L, mode) };
}
