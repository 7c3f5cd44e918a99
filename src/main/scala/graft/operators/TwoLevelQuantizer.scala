package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Two-level coarse quantization: group the k cell centroids into
  * ~sqrt(k) super-cells (a tiny driver-side Lloyd run over the
  * centroid set), then assign each vector by (1) nearest super-cell,
  * (2) nearest member cell WITHIN that super-cell. Per-row work drops
  * from O(k·d) dot products to O(sqrt(k)·d) — the fix for the
  * measured superlinearity of flat assignment once k is sized to the
  * corpus (SCALEPROBE.md note; the same trick as FAISS's IVF-on-IVF
  * coarse quantizers). Assignment is approximate at super-cell
  * boundaries (the nearest global cell can live in a non-nearest
  * super-cell) — acceptable for clustering-style consumers
  * (SemDedup), NOT used for the exact-contract IvfAnn oracles.
  *
  * Cost shape: Spark's codegen'd CASE evaluates only the matching
  * arm, so the member-cell argmax runs for exactly one super-cell's
  * members per row — two chained projections, zero shuffle, zero
  * state. Determinism: the grouping is computed once on the driver
  * (fixed-order double arithmetic over <= k points) and inlined into
  * the plan as literals, so both the plan and the DuckDB oracle see
  * identical constants; per-row argmax ties break to the HIGHER index
  * at both levels (array_max over (score, idx) structs), replayed by
  * the oracle's descending CASE ladders.
  */
object TwoLevelQuantizer {

  /** Super-centroids + each super-cell's member cell ids (ascending —
    * the tie-break order the assignment expressions rely on).
    */
  final case class Grouping(superCentroids: Array[Array[Double]],
                            members: Array[Array[Int]])

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Driver-side Lloyd over the centroid set: deterministic (fixed
    * iteration count, fixed-order sums, ties to the higher super
    * index — the same convention as the distributed trainer). k is
    * driver-scale by construction (it IS the cell count).
    */
  def group(centroids: Array[Array[Double]], superK: Int,
            iterations: Int = 3): Grouping = {
    require(superK >= 1 && superK <= centroids.length,
      s"superK must be in [1, ${centroids.length}], got $superK")
    val dim = centroids.head.length
    var supers = centroids.take(superK).map(_.clone())
    def assignAll(): Array[Int] = centroids.map { c =>
      var best = 0; var bestScore = Double.NegativeInfinity
      for (j <- supers.indices) {
        val s = dot(c, supers(j)) - supers(j).map(x => x * x).sum / 2.0
        if (s >= bestScore) { bestScore = s; best = j } // ties high
      }
      best
    }
    var assigned = assignAll()
    for (_ <- 1 to iterations) {
      val sums = Array.fill(superK)(new Array[Double](dim))
      val counts = new Array[Long](superK)
      for (i <- centroids.indices) { // fixed index order — deterministic
        val g = assigned(i); counts(g) += 1
        var d = 0
        while (d < dim) { sums(g)(d) += centroids(i)(d); d += 1 }
      }
      supers = supers.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0) old else sums(j).map(_ / counts(j))
      }
      assigned = assignAll()
    }
    val members = Array.tabulate(superK)(j =>
      assigned.indices.filter(assigned(_) == j).sorted.toArray)
    // drop empty super-cells (renumbered consistently for plan AND
    // oracle) — every emitted super id then has a non-empty member arm
    val keep = members.indices.filter(members(_).nonEmpty)
    Grouping(keep.map(supers).toArray, keep.map(members).toArray)
  }

  /** Ties break to the higher candidate id; compact loop codegen over
    * the plan-constant candidate table (CentroidArgmaxExpr) instead of
    * a literal-unrolled array_max(struct…) fold.
    */
  private def argmaxOver(vec: Column, cands: Seq[(Array[Double], Int)]): Column =
    graft.expressions.CentroidArgmax(vec,
      cands.map(_._1).toArray, cands.map(_._2).toArray)

  /** Nearest super-cell id for `vec` (O(superK) dots). */
  def superExpr(vec: Column, g: Grouping): Column =
    argmaxOver(vec, g.superCentroids.toIndexedSeq.zipWithIndex)

  /** Nearest member cell GIVEN the super-cell id in `superCol`: a
    * codegen'd CASE whose matching arm alone evaluates — O(members-
    * of-one-super) dots per row. [[group]] guarantees every super id
    * has a non-empty member arm (empty supers are dropped and the
    * rest renumbered).
    */
  def cellExpr(vec: Column, centroids: Array[Array[Double]], g: Grouping,
               superCol: Column): Column =
    g.members.toIndexedSeq.zipWithIndex.tail.foldLeft(
      argmaxOver(vec, g.members(0).toIndexedSeq.map(c => (centroids(c), c)))) {
      case (acc, (mem, j)) =>
        when(superCol === j,
          argmaxOver(vec, mem.toIndexedSeq.map(c => (centroids(c), c))))
          .otherwise(acc)
    }
}
