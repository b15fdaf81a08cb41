/**
 * WebGPU pipeline helpers: buffer upload, bind groups, readback.
 * Reference capability: ref js/webgpu/gpu/pipeline.mjs.
 */

export function createStorageBuffer(device, data, usage) {
  const GPUBufferUsage = globalThis.GPUBufferUsage || { STORAGE: 0x80, COPY_DST: 0x8, COPY_SRC: 0x4 };
  const buf = device.createBuffer({
    size: Math.max(16, data.byteLength !== undefined ? data.byteLength : data.length * 4),
    usage: (usage !== undefined ? usage : (GPUBufferUsage.STORAGE | GPUBufferUsage.COPY_DST | GPUBufferUsage.COPY_SRC)),
    mappedAtCreation: true,
  });
  const range = buf.getMappedRange();
  if (data instanceof Float32Array || (data.constructor && data.constructor.name === 'Float32Array')) {
    new Float32Array(range).set(data);
  } else {
    new Uint32Array(range).set(data);
  }
  buf.unmap();
  return buf;
}

export function createUniformBuffer(device, words, kinds) {
  // kinds: optional per-word type tags ('u32' | 'f32'); default all u32
  const GPUBufferUsage = globalThis.GPUBufferUsage || { UNIFORM: 0x40, COPY_DST: 0x8 };
  const buf = device.createBuffer({
    size: Math.max(16, words.length * 4),
    usage: GPUBufferUsage.UNIFORM | GPUBufferUsage.COPY_DST,
  });
  if (kinds) {
    const raw = new ArrayBuffer(words.length * 4);
    const u = new Uint32Array(raw);
    const f = new Float32Array(raw);
    for (let i = 0; i < words.length; i++) {
      if (kinds[i] === 'f32') f[i] = words[i]; else u[i] = words[i];
    }
    device.queue.writeBuffer(buf, 0, u);
  } else {
    device.queue.writeBuffer(buf, 0, new Uint32Array(words));
  }
  return buf;
}

/**
 * Load + concatenate shader sources (plain WGSL has no includes; shared
 * blocks like logmath.wgsl and fusedplan7-common.wgsl are prepended to
 * their entry shaders here, as the reference pipeline does for
 * fused-plan7-common.wgsl).
 */
export async function loadShaderChain(urls) {
  const parts = [];
  for (const url of urls) {
    const resp = await fetch(url);
    if (!resp.ok) throw new Error(`cannot load ${url}`);
    parts.push(await resp.text());
  }
  return parts.join('\n');
}

export async function readbackFloats(device, buf, nFloats) {
  const GPUBufferUsage = globalThis.GPUBufferUsage || { MAP_READ: 0x1, COPY_DST: 0x8 };
  const GPUMapMode = globalThis.GPUMapMode || { READ: 0x1 };
  const staging = device.createBuffer({
    size: nFloats * 4,
    usage: GPUBufferUsage.MAP_READ | GPUBufferUsage.COPY_DST,
  });
  const enc = device.createCommandEncoder();
  enc.copyBufferToBuffer(buf, 0, staging, 0, nFloats * 4);
  device.queue.submit([enc.finish()]);
  await staging.mapAsync(GPUMapMode.READ);
  const out = new Float32Array(staging.getMappedRange().slice(0));
  staging.unmap();
  staging.destroy();
  return out;
}

export function makeComputePipeline(device, shaderCode, entry = 'main') {
  const module = device.createShaderModule({ code: shaderCode });
  return device.createComputePipeline({
    layout: 'auto',
    compute: { module, entryPoint: entry },
  });
}

export function bindGroupFor(device, pipeline, buffers) {
  const entries = [];
  for (let i = 0; i < buffers.length; i++) {
    entries.push({ binding: i, resource: { buffer: buffers[i] } });
  }
  return device.createBindGroup({
    layout: pipeline.getBindGroupLayout(0),
    entries,
  });
}
