package graft

import graft.functions.{TextHash, VectorOps}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized differential testing of the native hash/vector kernels
  * against the interpreted higher-order-builtin formulations they
  * replace (the same formulations the DuckDB oracles run — see
  * graft.queries.Text scaladoc). The native expression IS the engine's
  * hot path; the built-in form is the executable specification. Seeded
  * corpora: unicode tokens, empty/short docs, single-token docs.
  */
class TextHashPropertySpec extends SparkTestBase {

  private def randomDocs(seed: Long, n: Int): Seq[String] = {
    val rnd = new Random(seed)
    val alphabets = Seq("abcdefgh", "äöüßéñ", "日本語中文", "0123!?")
    (0 until n).map { _ =>
      val nTok = rnd.nextInt(8) // includes 0/1/2-token docs (< shingle n)
      (0 until nTok).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        (0 until 1 + rnd.nextInt(5)).map(_ => a(rnd.nextInt(a.length))).mkString
      }.mkString(" ")
    }
  }

  private lazy val docs = {
    val s = spark
    import s.implicits._
    (randomDocs(7, 300) ++ Seq("", "one", "a b", "x x x x x"))
      .zipWithIndex.map(_.swap).toDF("id", "text")
      .withColumn("t", split(col("text"), " "))
  }

  test("polyHashes == aggregate-over-codepoints builtin") {
    val d = docs
      .withColumn("native", TextHash.polyHashes(col("t"), 31))
      .withColumn("builtin", expr(
        """transform(t, w -> aggregate(sequence(1, length(w)),
          |  0L, (acc, i) -> (acc * 31 + ascii(substr(w, i, 1))) % 1000000007))""".stripMargin))
    assert(d.filter(not(col("native") <=> col("builtin"))).count() === 0)
  }

  test("shingleSet == array_distinct(transform(slice)) builtin (incl. <n tokens)") {
    val d = docs
      .withColumn("native", TextHash.shingleSet(col("t"), 3))
      .withColumn("builtin", expr(
        // guard the descending-sequence trap for size(t) < 3
        """CASE WHEN size(t) < 3 THEN array()
          |ELSE array_distinct(transform(sequence(1, size(t) - 2),
          |  i -> concat_ws(' ', slice(t, i, 3)))) END""".stripMargin))
    assert(d.filter(not(col("native") <=> col("builtin"))).count() === 0)
  }

  test("jaccardSim == intersect/union builtin on shingle pairs") {
    val sh = docs.withColumn("sh", TextHash.shingleSet(col("t"), 3))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.id") < col("b.id")).limit(2000)
      .withColumn("native", TextHash.jaccardSim(col("a.sh"), col("b.sh")))
      .withColumn("builtin", expr(
        "size(array_intersect(a.sh, b.sh)) / size(array_union(a.sh, b.sh))"))
    assert(pairs.filter(not(col("native") <=> col("builtin"))).count() === 0)
  }

  test("simhash60 == sign-vote builtin over two polyhash families") {
    def votes(mult: Int, shift: Int) =
      s"""aggregate(sequence(0, 29), 0L, (sig, j) ->
         |  sig + IF(aggregate(hs$mult, 0L, (a, h) ->
         |    a + IF(((h >> j) & 1) = 1, 1L, -1L)) > 0,
         |    shiftleft(1L, j + $shift), 0L))""".stripMargin
    val d = docs
      .withColumn("hs31", TextHash.polyHashes(col("t"), 31))
      .withColumn("hs131", TextHash.polyHashes(col("t"), 131))
      .withColumn("native", TextHash.simhash(col("t")))
      .withColumn("builtin", expr(s"${votes(31, 0)} + ${votes(131, 30)}"))
    assert(d.filter(not(col("native") <=> col("builtin"))).count() === 0)
  }

  test("minHashes == k-fold universal-hash builtin; empty shingles -> NULL") {
    val d = docs
      .withColumn("sh", TextHash.shingleSet(col("t"), 3))
      .withColumn("native", TextHash.minhash(col("sh"), 8))
      .withColumn("builtin", expr(
        """CASE WHEN size(sh) = 0 THEN NULL
          |ELSE transform(sequence(0, 7), k ->
          |  array_min(transform(sh, s ->
          |    ((2*k+3) * aggregate(sequence(1, length(s)), 0L,
          |       (acc, i) -> (acc * 31 + ascii(substr(s, i, 1))) % 1000000007)
          |     + (5*k+7)) % 1000000007))) END""".stripMargin))
    assert(d.filter(not(col("native") <=> col("builtin"))).count() === 0)
  }

  test("cosine == aggregate(zip_with) builtin, bit-identical") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.id") < col("b.id")).limit(3000)
      .withColumn("native", VectorOps.cosine(col("a.v"), col("b.v")))
      .withColumn("builtin", expr(
        """aggregate(zip_with(a.v, b.v, (x, y) -> double(x) * double(y)), 0D, (s, p) -> s + p)
          | / (sqrt(aggregate(a.v, 0D, (s, x) -> s + double(x) * double(x)))
          |  * sqrt(aggregate(b.v, 0D, (s, x) -> s + double(x) * double(x))))""".stripMargin))
    assert(pairs.filter(not(col("native") <=> col("builtin"))).count() === 0)
  }
}
