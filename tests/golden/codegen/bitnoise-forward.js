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
function computeForward(x, y, params) {
  var w0 = Math.log(getParam(params, "p"));
  var w1 = Math.log(getParam(params, "q"));
  var xs = (typeof x === "string" ? x.split("").map(function(c){return xTokMap[c];}) : x);
  var Lx = xs.length;
  var ys = (typeof y === "string" ? y.split("").map(function(c){return yTokMap[c];}) : y);
  var Ly = ys.length;
  function newRow() {
    var r = [];
    for (var i = 0; i <= Lx; ++i) {
      r.push(new Array(1).fill(-Infinity));
    }
    return r;
  }
  var buf0 = newRow(), buf1 = newRow();
  for (var iy = 0; iy <= Ly; ++iy) {
    var cur = (iy & 1) ? buf1 : buf0;
    var prev = (iy & 1) ? buf0 : buf1;
    for (var ix = 0; ix <= Lx; ++ix) {
      for (var d = 0; d < 1; ++d) cur[ix][d] = -Infinity;
      if (ix === 0 && iy === 0) cur[0][0] = 0;
      var acc0 = cur[ix][0];
      if (ix > 0 && iy > 0 && xs[ix-1] === 1 && ys[iy-1] === 1) acc0 = lse(acc0, prev[ix-1][0] + w0);
      if (ix > 0 && iy > 0 && xs[ix-1] === 1 && ys[iy-1] === 2) acc0 = lse(acc0, prev[ix-1][0] + w1);
      if (ix > 0 && iy > 0 && xs[ix-1] === 2 && ys[iy-1] === 2) acc0 = lse(acc0, prev[ix-1][0] + w0);
      if (ix > 0 && iy > 0 && xs[ix-1] === 2 && ys[iy-1] === 1) acc0 = lse(acc0, prev[ix-1][0] + w1);
      cur[ix][0] = acc0;
    }
  }
  return ((Ly & 1) ? buf1 : buf0)[Lx][0];
}
if (typeof module !== "undefined") module.exports = { computeForward: computeForward };
