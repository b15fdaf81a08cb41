/**
 * Backend detection: WebGPU when available, CPU otherwise.
 * Reference capability: ref js/webgpu/internal/detect-backend.mjs.
 */

export async function detectBackend() {
  if (typeof navigator !== 'undefined' && navigator && navigator.gpu) {
    try {
      const adapter = await navigator.gpu.requestAdapter();
      if (adapter) {
        const device = await adapter.requestDevice();
        if (device) return { backend: 'webgpu', device };
      }
    } catch (e) {
      // fall through to cpu
    }
  }
  return { backend: 'cpu', device: null };
}
