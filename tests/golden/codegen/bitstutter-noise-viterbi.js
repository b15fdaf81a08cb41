// machine-specific Forward/Viterbi kernel (generated).
function lseUnary(x) {
  if (x >= 10 || !isFinite(x)) return 0;
  if (x < 0) return -x;
  return Math.log1p(Math.exp(-x));
}
function lse(a, b) {
  if (a === -Infinity) return b;
  if (b === -Infinity) return a;
  var mx = Math.max(a, b);
  return mx + lseUnary(Math.abs(a - b));
}
function maxReduce(a, b) { return Math.max(a, b); }
function getParam(params, name) {
  if (!(name in params)) throw new Error("Parameter " + name + " not defined");
  return params[name];
}
var xTokMap = {"0": 1, "1": 2};
var yTokMap = {"0": 1, "1": 2};
function computeViterbi(x, y, params) {
  var w0 = Math.log(1.0);
  var w1 = Math.log(0.99);
  var w2 = Math.log((0.01*getParam(params, "p")));
  var w3 = Math.log((0.01*getParam(params, "q")));
  var w4 = Math.log(getParam(params, "p"));
  var w5 = Math.log(getParam(params, "q"));
  var xs = (typeof x === "string" ? x.split("").map(function(c){return xTokMap[c];}) : x);
  var Lx = xs.length;
  var ys = (typeof y === "string" ? y.split("").map(function(c){return yTokMap[c];}) : y);
  var Ly = ys.length;
  function newRow() {
    var r = [];
    for (var i = 0; i <= Lx; ++i) {
      r.push(new Array(5).fill(-Infinity));
    }
    return r;
  }
  var buf0 = newRow(), buf1 = newRow();
  for (var iy = 0; iy <= Ly; ++iy) {
    var cur = (iy & 1) ? buf1 : buf0;
    var prev = (iy & 1) ? buf0 : buf1;
    for (var ix = 0; ix <= Lx; ++ix) {
      for (var d = 0; d < 5; ++d) cur[ix][d] = -Infinity;
      if (ix === 0 && iy === 0) cur[0][0] = 0;
      var acc0 = cur[ix][0];
      cur[ix][0] = acc0;
      var acc1 = cur[ix][1];
      if (iy > 0 && ys[iy-1] === 1) acc1 = maxReduce(acc1, prev[ix][1] + w2);
      if (iy > 0 && ys[iy-1] === 2) acc1 = maxReduce(acc1, prev[ix][1] + w3);
      if (ix > 0 && iy > 0 && xs[ix-1] === 1 && ys[iy-1] === 1) acc1 = maxReduce(acc1, prev[ix-1][3] + w4);
      if (ix > 0 && iy > 0 && xs[ix-1] === 1 && ys[iy-1] === 2) acc1 = maxReduce(acc1, prev[ix-1][3] + w5);
      cur[ix][1] = acc1;
      var acc2 = cur[ix][2];
      if (iy > 0 && ys[iy-1] === 1) acc2 = maxReduce(acc2, prev[ix][2] + w3);
      if (iy > 0 && ys[iy-1] === 2) acc2 = maxReduce(acc2, prev[ix][2] + w2);
      if (ix > 0 && iy > 0 && xs[ix-1] === 2 && ys[iy-1] === 1) acc2 = maxReduce(acc2, prev[ix-1][3] + w5);
      if (ix > 0 && iy > 0 && xs[ix-1] === 2 && ys[iy-1] === 2) acc2 = maxReduce(acc2, prev[ix-1][3] + w4);
      cur[ix][2] = acc2;
      var acc3 = cur[ix][3];
      acc3 = maxReduce(acc3, cur[ix][0] + w0);
      acc3 = maxReduce(acc3, cur[ix][1] + w1);
      acc3 = maxReduce(acc3, cur[ix][2] + w1);
      cur[ix][3] = acc3;
      var acc4 = cur[ix][4];
      acc4 = maxReduce(acc4, cur[ix][3] + w0);
      cur[ix][4] = acc4;
    }
  }
  return ((Ly & 1) ? buf1 : buf0)[Lx][4];
}
if (typeof module !== "undefined") module.exports = { computeViterbi: computeViterbi };
