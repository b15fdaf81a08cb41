/**
 * machineboss-tpu JS runtime — public API.
 *
 * Browser/Node companion to the TPU framework: load a Machine Boss JSON
 * transducer, then run Forward / Backward / Viterbi(+path) / posteriors
 * on token sequences or PSWM profiles, with automatic WebGPU dispatch
 * and a pure-JS CPU fallback. The CPU numerics share the TPU engines'
 * lowering contract (post-closure cells), so results are
 * interchangeable with machineboss_tpu's device engines.
 *
 * Usage:
 *   import { MachineBoss } from './machineboss.mjs';
 *   const mb = await MachineBoss.create(machineJSON, { p: 0.9 });
 *   const ll = await mb.forward(mb.tokenize('101', 'input'),
 *                               mb.tokenize('001', 'output'));
 *   const { score, path } = await mb.viterbi(xToks, yToks);
 *   const { logLikelihood, posteriors } = await mb.posteriors(xToks, yToks);
 *
 * Reference API parity: ref js/webgpu/machineboss-gpu.mjs (create,
 * forward, viterbi, posteriors, forwardProfile, viterbiProfile,
 * posteriorsProfile, tokenize, nAlpha, logProfile, destroy).
 */

import { prepareMachine, tokenize } from './internal/prep.mjs';
import { detectBackend } from './internal/detect.mjs';
import { forward2D, backward2D, viterbi2D, posteriors2D } from './cpu/dp2d.mjs';
import {
  forward1D, backward1D, viterbi1D, posteriors1D,
  forward1DProfile, viterbi1DProfile, posteriors1DProfile, logProfile,
} from './cpu/dp1d.mjs';
import { forward2DGPU, viterbi2DGPU } from './gpu/dp2d-gpu.mjs';
import { forward1DGPU } from './gpu/dp1d-gpu.mjs';
import { backward2DGPU, posteriors2DGPU } from './gpu/backward2d-gpu.mjs';
import {
  fusedPlan7ForwardBatchGPU, fusedPlan7ViterbiBatchGPU,
} from './gpu/fusedplan7-gpu.mjs';
import { parseHmmer } from './internal/hmmer.mjs';
import { buildFusedPlan7, fusedPlan7Forward, fusedPlan7Viterbi } from './cpu/fusedplan7.mjs';

function is1D(inputTokens, outputTokens) {
  return inputTokens === null || inputTokens === undefined ||
         outputTokens === null || outputTokens === undefined;
}

export class MachineBoss {
  constructor(machine, backend, device) {
    this._machine = machine;
    this.backend = backend;
    this._device = device;
    this._fusedPlan7 = null;
  }

  /**
   * Create an instance from machine JSON + parameter values.
   * options.backend: 'auto' (default) | 'webgpu' | 'cpu'.
   */
  static async create(machineJSON, params = {}, options = {}) {
    const machine = prepareMachine(machineJSON, params);
    const pref = options.backend || 'auto';
    let backend = 'cpu';
    let device = null;
    if (pref === 'webgpu' || pref === 'auto') {
      const det = await detectBackend();
      if (det.backend === 'webgpu') {
        backend = 'webgpu';
        device = det.device;
      } else if (pref === 'webgpu') {
        throw new Error('WebGPU is not available; use backend "cpu" or "auto"');
      }
    }
    return new MachineBoss(machine, backend, device);
  }

  get nStates() { return this._machine.nStates; }
  get inputAlphabet() { return this._machine.inputAlphabet; }
  get outputAlphabet() { return this._machine.outputAlphabet; }

  /** Emitting-symbol count for 'input' or 'output'. */
  nAlpha(direction) {
    const n = direction === 'input'
      ? this._machine.nInputTokens : this._machine.nOutputTokens;
    return n - 1;
  }

  /** Tokenize a symbol string/array to 1-based indices. */
  tokenize(seq, direction) {
    const alphabet = direction === 'input'
      ? this._machine.inputAlphabet : this._machine.outputAlphabet;
    return tokenize(seq, alphabet);
  }

  static logProfile(probs) { return logProfile(probs); }

  /** Forward log-likelihood; pass null for the absent axis (1D). */
  async forward(inputTokens, outputTokens) {
    if (this.backend === 'webgpu') {
      try {
        if (is1D(inputTokens, outputTokens)) {
          return await forward1DGPU(this._device, this._machine, inputTokens, outputTokens);
        }
        return await forward2DGPU(this._device, this._machine, inputTokens, outputTokens);
      } catch (e) {
        // fall back to CPU on any GPU failure
      }
    }
    if (is1D(inputTokens, outputTokens)) {
      return forward1D(this._machine, inputTokens, outputTokens);
    }
    return forward2D(this._machine, inputTokens, outputTokens);
  }

  /** Backward log-likelihood (equals forward; exposed for testing). */
  async backward(inputTokens, outputTokens) {
    if (this.backend === 'webgpu' && !is1D(inputTokens, outputTokens)) {
      try {
        return await backward2DGPU(this._device, this._machine,
                                   inputTokens, outputTokens);
      } catch (e) {
        // fall back to CPU
      }
    }
    if (is1D(inputTokens, outputTokens)) {
      return backward1D(this._machine, inputTokens, outputTokens);
    }
    return backward2D(this._machine, inputTokens, outputTokens);
  }

  /** Viterbi best score + path [{from, to, inTok, outTok}, ...]. */
  async viterbi(inputTokens, outputTokens) {
    if (this.backend === 'webgpu') {
      try {
        if (!is1D(inputTokens, outputTokens)) {
          return await viterbi2DGPU(this._device, this._machine, inputTokens, outputTokens);
        }
      } catch (e) {
        // fall back to CPU
      }
    }
    if (is1D(inputTokens, outputTokens)) {
      return viterbi1D(this._machine, inputTokens, outputTokens);
    }
    return viterbi2D(this._machine, inputTokens, outputTokens);
  }

  /** Forward-Backward visiting-state posteriors. */
  async posteriors(inputTokens, outputTokens) {
    if (this.backend === 'webgpu' && !is1D(inputTokens, outputTokens)) {
      try {
        return await posteriors2DGPU(this._device, this._machine,
                                     inputTokens, outputTokens);
      } catch (e) {
        // fall back to CPU
      }
    }
    if (is1D(inputTokens, outputTokens)) {
      return posteriors1D(this._machine, inputTokens, outputTokens);
    }
    return posteriors2D(this._machine, inputTokens, outputTokens);
  }

  /** Forward over a (L x nAlpha) log-weight profile. */
  async forwardProfile(profile, direction) {
    const nAlpha = this.nAlpha(direction);
    const L = profile.length / nAlpha;
    return forward1DProfile(this._machine, profile, direction, L);
  }

  /** Viterbi score over a profile. */
  async viterbiProfile(profile, direction) {
    const nAlpha = this.nAlpha(direction);
    const L = profile.length / nAlpha;
    return viterbi1DProfile(this._machine, profile, direction, L);
  }

  /** Posteriors over a profile. */
  async posteriorsProfile(profile, direction) {
    const nAlpha = this.nAlpha(direction);
    const L = profile.length / nAlpha;
    return posteriors1DProfile(this._machine, profile, direction, L);
  }

  /**
   * Create an instance for fused Plan7 (HMMER profile ∘ transducer)
   * scoring without materializing the composition.
   * options: {multihit=false, local=true, backend}.
   */
  static async createFusedPlan7(hmmerText, transducerJSON, params = {}, options = {}) {
    const hmm = parseHmmer(hmmerText);
    const prepared = prepareMachine(transducerJSON, params);
    const fused = buildFusedPlan7(hmm, prepared, options);
    const inst = await MachineBoss.create(transducerJSON, params,
                                          { backend: options.backend || 'auto' });
    inst._fusedPlan7 = fused;
    return inst;
  }

  /** Fused Plan7 Forward log-likelihood of one tokenized read. */
  async fusedForward(outputTokens) {
    if (!this._fusedPlan7) throw new Error('Not a fused Plan7 instance; use createFusedPlan7()');
    return fusedPlan7Forward(this._fusedPlan7, outputTokens);
  }

  /** Fused Plan7 Viterbi score of one tokenized read. */
  async fusedViterbi(outputTokens) {
    if (!this._fusedPlan7) throw new Error('Not a fused Plan7 instance; use createFusedPlan7()');
    return fusedPlan7Viterbi(this._fusedPlan7, outputTokens);
  }

  /** Batch fused Plan7 Forward (GPU batch shader when available). */
  async fusedForwardBatch(reads) {
    if (!this._fusedPlan7) throw new Error('Not a fused Plan7 instance; use createFusedPlan7()');
    if (this.backend === 'webgpu') {
      try {
        return await fusedPlan7ForwardBatchGPU(this._device,
                                               this._fusedPlan7, reads);
      } catch (e) {
        // fall back to CPU
      }
    }
    const out = new Float64Array(reads.length);
    for (let i = 0; i < reads.length; i++) {
      out[i] = fusedPlan7Forward(this._fusedPlan7, reads[i]);
    }
    return out;
  }

  /** Batch fused Plan7 Viterbi (GPU batch shader when available). */
  async fusedViterbiBatch(reads) {
    if (!this._fusedPlan7) throw new Error('Not a fused Plan7 instance; use createFusedPlan7()');
    if (this.backend === 'webgpu') {
      try {
        return await fusedPlan7ViterbiBatchGPU(this._device,
                                               this._fusedPlan7, reads);
      } catch (e) {
        // fall back to CPU
      }
    }
    const out = new Float64Array(reads.length);
    for (let i = 0; i < reads.length; i++) {
      out[i] = fusedPlan7Viterbi(this._fusedPlan7, reads[i]);
    }
    return out;
  }

  /** Release GPU resources. */
  destroy() {
    if (this._device && this._device.destroy) this._device.destroy();
    this._device = null;
    this.backend = 'cpu';
  }
}
