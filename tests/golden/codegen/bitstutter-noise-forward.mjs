// generated ES module wrapper for the WGSL Forward shader
export async function computeForward(device, logTrans, xs, ys) {
  // host driver: upload buffers, dispatch forwardDiagonal for each
  // anti-diagonal d = 0..lx+ly, read back final cell.
  throw new Error("wire this wrapper to your WebGPU pipeline helper");
}
