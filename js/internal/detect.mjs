/**
 * Backend detection for the machineboss-tpu JS runtime.
 *
 * Probes, in order: WebGPU (browser or Node >= 20 with the flag),
 * then falls back to the pure-JS CPU path. Returns
 * {backend, device, adapterInfo} — adapterInfo is kept for
 * diagnostics so callers can report WHICH GPU the wavefront shaders
 * landed on.
 */

function gpuEntryPoint() {
  if (typeof navigator === 'undefined' || !navigator) return null;
  return navigator.gpu || null;
}

export async function detectBackend(options = {}) {
  const gpu = gpuEntryPoint();
  if (gpu === null) {
    return { backend: 'cpu', device: null, adapterInfo: null };
  }
  let adapter = null;
  try {
    adapter = await gpu.requestAdapter({
      powerPreference: options.powerPreference || 'high-performance',
    });
  } catch (e) {
    adapter = null;
  }
  if (adapter === null) {
    return { backend: 'cpu', device: null, adapterInfo: null };
  }
  let device = null;
  try {
    device = await adapter.requestDevice();
  } catch (e) {
    device = null;
  }
  if (device === null) {
    return { backend: 'cpu', device: null, adapterInfo: null };
  }
  let info = null;
  if (adapter.info) {
    info = { vendor: adapter.info.vendor, architecture: adapter.info.architecture };
  }
  return { backend: 'webgpu', device, adapterInfo: info };
}
