package graft

import org.apache.spark.sql.functions._

/** Property checks for the int8 quantization query beyond its value
  * oracle: the codes must actually be a faithful compression — every
  * reconstructed element within half a quantization step of its input,
  * codes inside [-127, 127], and the max-abs element exactly
  * saturated. */
class QuantizeSpec extends SparkTestBase {

  test("reconstruction error is bounded by half a quantization step") {
    val rows = SparkEntry.queries("x_embed_quantize")(spark, sfSmoke)
      .select(col("vec_id"), col("scale"), col("q_str"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getString(2).split(",").map(_.toInt)))
    assert(rows.nonEmpty)

    val vecs = Tables.embeddings(spark, sfSmoke)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

    rows.foreach { case (id, scale, q) =>
      val v = vecs(id)
      assert(q.length == v.length)
      assert(q.forall(c => c >= -127 && c <= 127))
      // the max-abs element maps to exactly ±127
      val maxIdx = v.indices.maxBy(i => math.abs(v(i)))
      assert(math.abs(q(maxIdx)) == 127,
        s"vec $id: max element not saturated (${q(maxIdx)})")
      // |x - q·scale/127| ≤ scale/254 + rounding slack everywhere
      val step = scale / 127.0
      v.indices.foreach { i =>
        val err = math.abs(v(i) - q(i) * step)
        assert(err <= step / 2 + 1e-9,
          s"vec $id dim $i: error $err exceeds half-step ${step / 2}")
      }
    }
  }
}
