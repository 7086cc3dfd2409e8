package graft.ops

/** Deterministic fixed-iteration power method for the top eigenpair of
  * a dense symmetric matrix.
  *
  * Division of labor at scale: the matrix itself is dim² (a few KB for
  * embedding dims) — the DISTRIBUTED work is the exact Gram reduction
  * that produced it (x_gram_matrix's 2²⁰ fixed-point DECIMAL(38,0)
  * accumulation); the iteration is a driver-local loop, the same split
  * as [[KMeans]]' broadcast-centroid step. Every float operation runs
  * in a FIXED order (fold seeds 0.0, ascending index), so an engine
  * re-implementing the identical sequence (the DuckDB oracle's
  * list_reduce unroll) reproduces the vector bit-for-bit — sqrt is
  * IEEE-correctly-rounded everywhere, unlike log, so no quantization
  * fudge is needed anywhere in the loop.
  *
  * Sign/start determinism: v₀ = (1/n, …, 1/n); the returned eigenvector
  * sign follows v₀ (no arbitrary normalization-sign choice).
  */
object Eigen {

  /** Returns (unit eigenvector after `iters` normalized multiplies,
    * last pre-normalization L2 norm — the eigenvalue estimate). */
  def power(g: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val n = g.length
    var v = Array.fill(n)(1.0 / n)
    var lastNorm = 0.0
    var it = 0
    var degenerate = false
    while (it < iters && !degenerate) {
      val w = Array.tabulate(n) { i =>
        var acc = 0.0
        var j = 0
        while (j < n) { acc += g(i)(j) * v(j); j += 1 }
        acc
      }
      var s = 0.0
      var i = 0
      while (i < n) { s += w(i) * w(i); i += 1 }
      lastNorm = math.sqrt(s)
      // a zero (or fully underflowed) matrix maps everything to 0 —
      // dividing would poison v with NaN; report eigenvalue 0 with the
      // current direction instead (degenerate inputs only; the Gram of
      // any non-empty corpus has positive trace)
      if (lastNorm == 0.0) degenerate = true
      else { v = w.map(_ / lastNorm); it += 1 }
    }
    (v, lastNorm)
  }
}
