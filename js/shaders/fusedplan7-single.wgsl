// Fused Plan7 single-read entry: one workgroup, thread 0 drives the
// sequential row solve for read 0 (latency shape: no batch assembly,
// minimal buffer setup — the API's fusedForward(read) path;
// gpu/fusedplan7-gpu.mjs prepends logmath.wgsl + fusedplan7-common.wgsl).
//
// Reference capability: ref js/webgpu/shaders/fused-plan7-single.wgsl,
// gpu/fused-plan7-single.mjs.

@compute @workgroup_size(1)
fn main(@builtin(global_invocation_id) gid : vec3<u32>) {
  if (gid.x != 0u) { return; }
  runRead(0u);
}
