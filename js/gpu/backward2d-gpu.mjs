/**
 * WebGPU 2D backward fill + Forward-Backward posteriors.
 *
 * Backward: one dispatch per anti-diagonal, DESCENDING from Li+Lo to 0
 * (shaders/wavefront2d-backward.wgsl — the mirror of the forward
 * wavefront). Posteriors: forward + backward lattices on device, then
 * one elementwise dispatch (shaders/posteriors2d.wgsl) producing
 * exp(f + b - LL) for every (cell, state).
 *
 * Reference capability: ref js/webgpu/gpu/backward-2d.mjs and the
 * posteriors pipeline (shaders/posteriors.wgsl).
 */

import {
  createStorageBuffer, createUniformBuffer, readbackFloats,
  makeComputePipeline, bindGroupFor,
} from './pipeline.mjs';
import { fillLatticeGPU } from './dp2d-gpu.mjs';

const BWD_URL = './shaders/wavefront2d-backward.wgsl';
const POST_URL = './shaders/posteriors2d.wgsl';
const sources = {};

async function loadShader(url) {
  if (sources[url] !== undefined) return sources[url];
  const resp = await fetch(url);
  if (!resp.ok) throw new Error(`cannot load ${url}`);
  sources[url] = await resp.text();
  return sources[url];
}

function f32Clamped(arr) {
  const out = new Float32Array(arr.length);
  for (let i = 0; i < arr.length; i++) {
    out[i] = arr[i] === -Infinity ? -3.0e38 : arr[i];
  }
  return out;
}

/** Fill the full backward lattice on GPU; returns Float32Array. */
export async function fillBackwardGPU(device, machine, x, y, mode) {
  const S = machine.nStates;
  if (S > 256) throw new Error('GPU wavefront supports at most 256 states');
  const Li = x.length;
  const Lo = y.length;
  const code = await loadShader(BWD_URL);
  const pipeline = makeComputePipeline(device, code);
  const closure = mode === 1 ? machine.closureMax : machine.closure;

  const latBuf = createStorageBuffer(
    device, new Float32Array((Li + 1) * (Lo + 1) * S).fill(-3.0e38));
  const transBuf = createStorageBuffer(device, f32Clamped(machine.logTrans));
  const closBuf = createStorageBuffer(device, f32Clamped(closure));
  const xBuf = createStorageBuffer(device, new Uint32Array(x.length ? x : [0]));
  const yBuf = createStorageBuffer(device, new Uint32Array(y.length ? y : [0]));

  for (let d = Li + Lo; d >= 0; d--) {
    const iLo = Math.max(0, d - Lo);
    const iHi = Math.min(Li, d);
    const params = createUniformBuffer(
      device, [S, machine.nIn, machine.nOut, Li, Lo, d, iLo, mode]);
    const bind = bindGroupFor(device, pipeline,
                              [params, transBuf, closBuf, xBuf, yBuf,
                               latBuf]);
    const enc = device.createCommandEncoder();
    const pass = enc.beginComputePass();
    pass.setPipeline(pipeline);
    pass.setBindGroup(0, bind);
    pass.dispatchWorkgroups(iHi - iLo + 1);
    pass.end();
    device.queue.submit([enc.finish()]);
  }
  const lat = await readbackFloats(device, latBuf,
                                   (Li + 1) * (Lo + 1) * S);
  latBuf.destroy(); transBuf.destroy(); closBuf.destroy();
  xBuf.destroy(); yBuf.destroy();
  return lat;
}

/** Backward log-likelihood (must equal the forward GPU fill). */
export async function backward2DGPU(device, machine, x, y) {
  const lat = await fillBackwardGPU(device, machine, x, y, 0);
  return lat[0] <= -1.0e38 ? -Infinity : lat[0];
}

/**
 * Forward-Backward posteriors on GPU: runs the forward wavefront
 * (dp2d-gpu.mjs fillLatticeGPU), the backward wavefront, and the
 * elementwise posteriors shader. Returns {logLikelihood, posteriors}.
 */
export async function posteriors2DGPU(device, machine, x, y) {
  const S = machine.nStates;
  const n = (x.length + 1) * (y.length + 1) * S;
  const fwd = await fillLatticeGPU(device, machine, x, y, 0);
  const bwd = await fillBackwardGPU(device, machine, x, y, 0);
  const llRaw = fwd[n - S + (S - 1)];
  const logLikelihood = llRaw <= -1.0e38 ? -Infinity : llRaw;
  if (logLikelihood === -Infinity) {
    return { logLikelihood, posteriors: new Float32Array(n) };
  }
  const code = await loadShader(POST_URL);
  const pipeline = makeComputePipeline(device, code);
  const fwdBuf = createStorageBuffer(device, fwd);
  const bwdBuf = createStorageBuffer(device, bwd);
  const outBuf = createStorageBuffer(device, new Float32Array(n));
  const params = createUniformBuffer(device, [n, logLikelihood, 0, 0],
                                     ['u32', 'f32', 'u32', 'u32']);
  const bind = bindGroupFor(device, pipeline,
                            [params, fwdBuf, bwdBuf, outBuf]);
  const enc = device.createCommandEncoder();
  const pass = enc.beginComputePass();
  pass.setPipeline(pipeline);
  pass.setBindGroup(0, bind);
  pass.dispatchWorkgroups(Math.ceil(n / 64));
  pass.end();
  device.queue.submit([enc.finish()]);
  const posteriors = await readbackFloats(device, outBuf, n);
  fwdBuf.destroy(); bwdBuf.destroy(); outBuf.destroy();
  return { logLikelihood, posteriors };
}
