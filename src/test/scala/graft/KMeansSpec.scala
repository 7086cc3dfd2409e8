package graft

import graft.ops.KMeans
import org.apache.spark.sql.functions._

/** KMeans differential: the distributed Lloyd loop must match a plain
  * driver-local implementation run from the same initialization, and
  * behave like k-means (non-increasing inertia, argmin assignment). */
class KMeansSpec extends SparkTestBase {

  private val K = 4
  private val Iters = 5

  private def corpus() = Tables.embeddings(spark, sfSmoke)
    .select(col("vec_id"), col("embedding"))

  /** Driver-local Lloyd from the same deterministic init. */
  private def localFit(
      data: Array[(Long, Array[Double])], k: Int, iters: Int)
      : (Array[Array[Double]], Map[Long, Int]) = {
    var cents = data.sortBy(_._1).take(k).map(_._2.clone())
    def cellOf(v: Array[Double]): Int = {
      var best = -1; var bd = Double.PositiveInfinity
      for (i <- cents.indices) {
        var d = 0.0
        var j = 0
        while (j < v.length) {
          val t = v(j) - cents(i)(j); d += t * t; j += 1
        }
        if (d < bd) { bd = d; best = i }
      }
      best
    }
    var assign = Map.empty[Long, Int]
    for (_ <- 0 until iters) {
      assign = data.map { case (id, v) => id -> cellOf(v) }.toMap
      val next = cents.map(_.clone())
      for (c <- cents.indices) {
        val members = data.filter { case (id, _) => assign(id) == c }
        if (members.nonEmpty)
          for (j <- cents(c).indices)
            next(c)(j) = members.map(_._2(j)).sum / members.length
      }
      cents = next
    }
    (cents, data.map { case (id, v) => id -> cellOf(v) }.toMap)
  }

  private def collected(): Array[(Long, Array[Double])] =
    corpus().collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }

  test("distributed Lloyd matches the driver-local reference") {
    val (codebook, assignments) = KMeans.fit(corpus(), "vec_id", "embedding", K, Iters)
    val (localCents, localAssign) = localFit(collected(), K, Iters)

    val distCents = codebook.orderBy("cell").collect()
      .map(r => r.getSeq[Double](1).toArray)
    assert(distCents.length == K)
    // double sums over distributed vs sequential order: tolerance, not
    // bit-equality — the kernel arithmetic per distance is identical
    for (c <- 0 until K; j <- distCents(c).indices)
      assert(math.abs(distCents(c)(j) - localCents(c)(j)) < 1e-9,
        s"centroid $c dim $j diverged")

    val distAssign = assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(distAssign == localAssign)
  }

  test("broadcast-join assignment path matches the literal path") {
    // literalMaxCells = 0 forces the join spelling; same init, same
    // iterations → identical assignments and (tolerance) centroids
    val (cbLit, asLit) = KMeans.fit(corpus(), "vec_id", "embedding", K, 2)
    val (cbJoin, asJoin) = KMeans.fit(corpus(), "vec_id", "embedding", K, 2,
      literalMaxCells = 0)
    val cl = cbLit.orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val cj = cbJoin.orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    for (c <- cl.indices; j <- cl(c).indices)
      assert(math.abs(cl(c)(j) - cj(c)(j)) < 1e-9)
    assert(asLit.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ===
      asJoin.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("a NaN vector fails loudly on both assignment paths") {
    val s = spark
    import s.implicits._
    val poisoned = corpus().unionByName(
      Seq((999999L, Array.fill(64)(Float.NaN).toSeq))
        .toDF("vec_id", "embedding"))
    for (threshold <- Seq(4096, 0)) {
      val e = intercept[Exception] {
        KMeans.fit(poisoned, "vec_id", "embedding", K, 1,
          literalMaxCells = threshold)
      }
      assert(messages(e).exists(_.contains("KMeans: vector with NaN")),
        s"wrong failure for threshold=$threshold: $e")
    }
  }

  test("a dimension-mismatched vector fails loudly — shorter AND longer") {
    val s = spark
    import s.implicits._
    // shorter than the codebook dim would otherwise be silently
    // assigned by prefix distance; longer by ignored-suffix distance
    for (badLen <- Seq(32, 80); threshold <- Seq(4096, 0)) {
      val poisoned = corpus().unionByName(
        Seq((999999L, Array.fill(badLen)(0.5f).toSeq))
          .toDF("vec_id", "embedding"))
      val e = intercept[Exception] {
        KMeans.fit(poisoned, "vec_id", "embedding", K, 1,
          literalMaxCells = threshold)
      }
      assert(messages(e).exists(_.contains("codebook dimension")),
        s"wrong failure for len=$badLen threshold=$threshold: $e")
    }
  }

  test("inertia is non-increasing across iterations") {
    val data = collected()
    def inertia(cents: Array[Array[Double]]): Double =
      data.map { case (_, v) =>
        cents.map { c =>
          v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }.sum
    val seq = (0 to 3).map { it =>
      val (cb, _) = KMeans.fit(corpus(), "vec_id", "embedding", K, it)
      inertia(cb.orderBy("cell").collect().map(_.getSeq[Double](1).toArray))
    }
    seq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: $seq")
    }
  }

  test("trained codebook drops into the IVF assignment contract") {
    // the IVF query's cell column is exactly what fit() returns as
    // assignments: every corpus vector gets one cell in [0, k)
    val (_, assignments) = KMeans.fit(corpus(), "vec_id", "embedding", K, 2)
    val cells = assignments.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(cells.forall(c => c >= 0 && c < K))
    assert(assignments.count() == corpus().count())
    assert(assignments.groupBy("id").count().filter(col("count") > 1).isEmpty)
  }
}
