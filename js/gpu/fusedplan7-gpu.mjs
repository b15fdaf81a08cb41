/**
 * WebGPU fused Plan7 scoring: batch (one thread per read, throughput)
 * and single (one workgroup, latency) dispatches of the shared row
 * solver in shaders/fusedplan7-common.wgsl — the GPU counterpart of the
 * executable CPU contract (cpu/fusedplan7.mjs), scoring reads against a
 * HMMER profile through a transducer WITHOUT materializing the
 * composition.
 *
 * Reference capability: ref js/webgpu/gpu/fused-plan7-batch.mjs,
 * fused-plan7-single.mjs, shaders/fused-plan7-{common,single,batch}.wgsl.
 */

import {
  createStorageBuffer, createUniformBuffer, readbackFloats,
  makeComputePipeline, bindGroupFor, loadShaderChain,
} from './pipeline.mjs';
import { packFusedTensors } from '../cpu/fusedplan7.mjs';

const COMMON = ['./shaders/logmath.wgsl',
                './shaders/fusedplan7-common.wgsl'];
const codes = {};

async function loadEntry(entry) {
  if (codes[entry] !== undefined) return codes[entry];
  codes[entry] = await loadShaderChain(
    COMMON.concat(['./shaders/fusedplan7-' + entry + '.wgsl']));
  return codes[entry];
}

function flagsOf(fused, sr) {
  let f = 0;
  if (fused.mode === 'plan7') f = f | 1;
  if (fused.local) f = f | 2;
  if (fused.multihit) f = f | 4;
  if (sr === 'maxplus') f = f | 8;
  return f;
}

async function dispatchFused(device, fused, reads, sr, entry) {
  const St = fused.machine.nStates;
  const K = fused.hmm.node.length;
  const nOut = fused.machine.nOutputTokens;
  const nReads = reads.length;
  let maxLen = 1;
  for (let r = 0; r < reads.length; r++) {
    if (reads[r].length > maxLen) maxLen = reads[r].length;
  }
  const nBase = 5 * K + 12;
  const nRow = 5 * K + 17;
  const workPerRead = (2 * nBase + nRow + 2) * St;

  const { tens, scal } = packFusedTensors(fused, sr);
  const toks = new Uint32Array(nReads * maxLen);
  const lens = new Uint32Array(nReads);
  for (let r = 0; r < nReads; r++) {
    lens[r] = reads[r].length;
    for (let o = 0; o < reads[r].length; o++) {
      toks[r * maxLen + o] = reads[r][o];
    }
  }
  const code = await loadEntry(entry);
  const pipeline = makeComputePipeline(device, code);
  const params = createUniformBuffer(
    device, [St, K, nOut, flagsOf(fused, sr), fused.nHit, maxLen,
             nReads, workPerRead]);
  const tensBuf = createStorageBuffer(device, tens);
  const scalBuf = createStorageBuffer(device, scal);
  const tokBuf = createStorageBuffer(device, toks.length ? toks : new Uint32Array([0]));
  const lenBuf = createStorageBuffer(device, lens);
  const workBuf = createStorageBuffer(
    device, new Float32Array(nReads * workPerRead));
  const outBuf = createStorageBuffer(device, new Float32Array(nReads));
  const bind = bindGroupFor(device, pipeline,
                            [params, tensBuf, scalBuf, tokBuf, lenBuf,
                             workBuf, outBuf]);
  const enc = device.createCommandEncoder();
  const pass = enc.beginComputePass();
  pass.setPipeline(pipeline);
  pass.setBindGroup(0, bind);
  pass.dispatchWorkgroups(entry === 'single' ? 1
                          : Math.ceil(nReads / 64));
  pass.end();
  device.queue.submit([enc.finish()]);
  const out = await readbackFloats(device, outBuf, nReads);
  const bufs = [tensBuf, scalBuf, tokBuf, lenBuf, workBuf, outBuf];
  for (let i = 0; i < bufs.length; i++) bufs[i].destroy();
  const res = new Array(out.length);
  for (let i = 0; i < out.length; i++) {
    res[i] = out[i] <= -1.0e38 ? -Infinity : out[i];
  }
  return res;
}

/** Batch Forward scores for tokenized reads (1-based out tokens). */
export async function fusedPlan7ForwardBatchGPU(device, fused, reads) {
  return dispatchFused(device, fused, reads, 'logsumexp', 'batch');
}

/** Batch Viterbi scores. */
export async function fusedPlan7ViterbiBatchGPU(device, fused, reads) {
  return dispatchFused(device, fused, reads, 'maxplus', 'batch');
}

/** Single-read latency path. */
export async function fusedPlan7ForwardGPU(device, fused, read) {
  const out = await dispatchFused(device, fused, [read], 'logsumexp',
                                  'single');
  return out[0];
}
