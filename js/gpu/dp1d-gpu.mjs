/**
 * WebGPU 1D DP via parallel prefix scan over per-position transfer
 * matrices (shaders/prefixscan1d.wgsl) — O(log L) dispatch depth, the
 * GPU analog of machineboss_tpu/ops/dp1d.forward_1d_assoc.
 *
 * Reference capability: ref js/webgpu/gpu/forward-1d.mjs,
 * shaders/prefix-scan.wgsl.
 */

import {
  createStorageBuffer, createUniformBuffer, readbackFloats,
  makeComputePipeline, bindGroupFor,
} from './pipeline.mjs';
import { NEG_INF, logsum, vecMat } from '../internal/logmath.mjs';
import { transMatrix } from '../internal/prep.mjs';

const SHADER_URL = './shaders/prefixscan1d.wgsl';
let shaderSource = null;

async function loadShader() {
  if (shaderSource !== null) return shaderSource;
  const resp = await fetch(SHADER_URL);
  if (!resp.ok) throw new Error(`cannot load ${SHADER_URL}`);
  shaderSource = await resp.text();
  return shaderSource;
}

/**
 * Host-side transfer matrix for position p: closure-folded step
 * M_p = step(tok) (x) closure (the start vector is already closed).
 */
function transferMatrices(machine, seq, isInput) {
  const S = machine.nStates;
  const L = seq.length;
  const out = new Float32Array(L * S * S);
  const tmp = new Float64Array(S);
  for (let p = 0; p < L; p++) {
    const m = isInput ? transMatrix(machine, seq[p], 0)
      : transMatrix(machine, 0, seq[p]);
    for (let s = 0; s < S; s++) {
      // row s of step (x) closure
      for (let d = 0; d < S; d++) {
        for (let k = 0; k < S; k++) tmp[k] = m[s * S + k] + machine.closure[k * S + d];
        const v = logsum(tmp);
        out[(p * S + s) * S + d] = v === NEG_INF ? -3.0e38 : v;
      }
    }
  }
  return out;
}

export async function forward1DGPU(device, machine, inputTokens, outputTokens) {
  const isInput = !(inputTokens === null || inputTokens === undefined);
  const seq = isInput ? inputTokens : outputTokens;
  const S = machine.nStates;
  const L = seq.length;
  if (L === 0) {
    return machine.closure[S - 1];
  }
  const code = await loadShader();
  const pipeline = makeComputePipeline(device, code);
  const mats = transferMatrices(machine, seq, isInput);
  let bufA = createStorageBuffer(device, mats);
  let bufB = createStorageBuffer(device, new Float32Array(mats.length));
  for (let stride = 1; stride < L; stride *= 2) {
    const bufParams = createUniformBuffer(device, [S, L, stride, 0]);
    const bind = bindGroupFor(device, pipeline, [bufParams, bufA, bufB]);
    const enc = device.createCommandEncoder();
    const pass = enc.beginComputePass();
    pass.setPipeline(pipeline);
    pass.setBindGroup(0, bind);
    pass.dispatchWorkgroups(Math.ceil((L * S) / 64));
    pass.end();
    device.queue.submit([enc.finish()]);
    const t = bufA; bufA = bufB; bufB = t;
  }
  // read back the full prefix product for position L
  const full = await readbackFloats(device, bufA, mats.length);
  bufA.destroy();
  bufB.destroy();
  const lastBase = (L - 1) * S * S;
  const prod = new Float64Array(S * S);
  for (let i = 0; i < S * S; i++) {
    const v = full[lastBase + i];
    prod[i] = v <= -1.0e38 ? NEG_INF : v;
  }
  // start vector (closed) through the product, read end state
  const start = new Float64Array(S);
  for (let s = 0; s < S; s++) start[s] = machine.closure[s];
  const final = vecMat(start, prod, S, logsum);
  return final[S - 1];
}
