/**
 * WebGPU 1D forward: transfer-matrix build, Hillis-Steele prefix scan,
 * and readout — all three stages on GPU
 * (shaders/transferbuild1d{,-profile}.wgsl, prefixscan1d.wgsl,
 * extract1d.wgsl).
 *
 * Reference capability: ref js/webgpu/gpu/forward-1d.mjs,
 * forward-1d-profile.mjs, shaders/transfer-build{,-profile}.wgsl,
 * prefix-scan.wgsl, extract.wgsl.
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

async function scanAndExtract(device, machine, matsBuf, L, mode) {
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
  // readout: closed start vector through every prefix product on GPU
  const start = new Float32Array(S);
  for (let s = 0; s < S; s++) {
    const v = machine.closure[s];
    start[s] = v === -Infinity ? -3.0e38 : v;
  }
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

export async function forward1DGPU(device, machine, inputTokens,
                                   outputTokens) {
  const isInput = !(inputTokens === null || inputTokens === undefined);
  const seq = isInput ? inputTokens : outputTokens;
  const S = machine.nStates;
  const L = seq.length;
  if (L === 0) {
    return machine.closure[S - 1];
  }
  const buildPipe = makeComputePipeline(device, await loadShader('build'));
  const transBuf = createStorageBuffer(device, f32Clamped(machine.logTrans));
  const closBuf = createStorageBuffer(device, f32Clamped(machine.closure));
  const tokBuf = createStorageBuffer(device, new Uint32Array(seq));
  const matsBuf = createStorageBuffer(device, new Float32Array(L * S * S));
  const params = createUniformBuffer(
    device, [S, machine.nIn, machine.nOut, L, isInput ? 1 : 0, 0, 0, 0]);
  dispatch(device, buildPipe, [params, transBuf, closBuf, tokBuf, matsBuf],
           Math.ceil((L * S * S) / 64));
  transBuf.destroy(); closBuf.destroy(); tokBuf.destroy();
  const out = await scanAndExtract(device, machine, matsBuf, L, 0);
  const v = out[(L - 1) * S + (S - 1)];
  return v <= -1.0e38 ? -Infinity : v;
}

/**
 * PSWM profile variant: profile is an (L x nTok) row-major log-prob
 * array (column 0 = epsilon, unused); emissions marginalize over
 * tokens on GPU (transferbuild1d-profile.wgsl).
 */
export async function forward1DProfileGPU(device, machine, profile, L,
                                          nTok, isInput) {
  const S = machine.nStates;
  if (L === 0) {
    return machine.closure[S - 1];
  }
  const buildPipe = makeComputePipeline(device,
                                        await loadShader('buildProfile'));
  const transBuf = createStorageBuffer(device, f32Clamped(machine.logTrans));
  const closBuf = createStorageBuffer(device, f32Clamped(machine.closure));
  const profBuf = createStorageBuffer(device, f32Clamped(profile));
  const matsBuf = createStorageBuffer(device, new Float32Array(L * S * S));
  const params = createUniformBuffer(
    device, [S, machine.nIn, machine.nOut, L, isInput ? 1 : 0, 0, nTok, 0]);
  dispatch(device, buildPipe, [params, transBuf, closBuf, profBuf, matsBuf],
           Math.ceil((L * S * S) / 64));
  transBuf.destroy(); closBuf.destroy(); profBuf.destroy();
  const out = await scanAndExtract(device, machine, matsBuf, L, 0);
  const v = out[(L - 1) * S + (S - 1)];
  return v <= -1.0e38 ? -Infinity : v;
}
