// Fused Plan7 batch scoring entry: one thread per read (throughput
// shape — reads are independent, the row solve is sequential per read;
// gpu/fusedplan7-gpu.mjs prepends logmath.wgsl + fusedplan7-common.wgsl).
//
// Reference capability: ref js/webgpu/shaders/fused-plan7-batch.wgsl,
// gpu/fused-plan7-batch.mjs.

@compute @workgroup_size(64)
fn main(@builtin(global_invocation_id) gid : vec3<u32>) {
  let read = gid.x;
  if (read >= P.nReads) { return; }
  runRead(read);
}
