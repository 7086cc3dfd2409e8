package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING loop — the iterative form of
  * the single-step merge scoring in q:x_bpe_step: greedy rounds of
  * {score adjacent pairs → pick the best merge → apply it}, exactly
  * the procedure of Sennrich et al. (ACL'16).
  *
  * Scale shape: the corpus collapses ONCE to the word-frequency table
  * (token-sized → vocabulary-sized, the x_bpe_step discipline); every
  * round then runs on VOCAB rows only — a combine-enabled pair
  * aggregate, a driver-side top-1 (two small actions per round, the
  * KMeans loop split), and a map-side fold applying the merge.
  * Per-round re-materialization ([[PlanCache]]) keeps lineage flat.
  *
  * Merge application is leftmost-first non-overlapping, implemented as
  * a single left fold over the token list (carry = last unmerged
  * token): after merging, the merged token becomes the carry and may
  * merge again with the next token — "aaa" under merge (a,a) yields
  * ["aa","a"], the reference greedy behavior. The fold is pure string
  * equality/concat, so any engine re-running the same fold (the DuckDB
  * oracle's list_reduce unroll) reproduces the vocabulary exactly.
  */
object Bpe {

  case class MergeRound(round: Int, left_tok: String, right_tok: String,
      pair_count: Long, avg_tokens_per_word: Double)

  private def esc(x: String) = x.replace("\\", "\\\\").replace("'", "''")

  /** @param words (word, wf) frequency table
    * @return the learned merge table, one row per round (pair count at
    *         selection time + weighted avg tokens/word after applying) */
  def train(words: DataFrame, rounds: Int): Seq[MergeRound] =
    trainWithVocab(words, rounds)._1

  /** [[train]] plus the final encoded vocabulary (word, wf, toks) —
    * the ENCODE side: a word's final token list under the learned
    * merges is exactly its training-loop end state, so tokenizing a
    * corpus is one broadcast join of this vocabulary-sized map. */
  def trainWithVocab(words: DataFrame, rounds: Int): (Seq[MergeRound], DataFrame) = {
    var vocab = PlanCache.materialized(words.withColumn("toks",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
    val merges = Seq.newBuilder[MergeRound]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // pair key = (left, right) columns — a separator-concatenated key
      // would collide with tokens that contain the separator character
      val top = vocab
        .select(col("wf"), explode(expr(
          """CASE WHEN size(toks) >= 2
            |THEN transform(sequence(1, size(toks) - 1), i ->
            |  struct(element_at(toks, i) AS l, element_at(toks, i + 1) AS r))
            |ELSE cast(array() AS array<struct<l: string, r: string>>) END"""
            .stripMargin)).as("pr"))
        .groupBy(col("pr.l").as("bl"), col("pr.r").as("br"))
        .agg(sum(col("wf")).as("cnt"))
        .orderBy(col("cnt").desc, col("bl"), col("br")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // every word is one token: no pairs remain
      else {
        val best = top.head
        val (bl, br) = (best.getAs[String]("bl"), best.getAs[String]("br"))
        vocab = PlanCache.materialized(vocab.withColumn("toks", expr(
          s"""aggregate(slice(toks, 2, size(toks) - 1),
             |  named_struct('o', cast(array() AS array<string>), 'c', element_at(toks, 1)),
             |  (a, x) -> CASE WHEN a.c = '${esc(bl)}' AND x = '${esc(br)}'
             |            THEN named_struct('o', a.o, 'c', concat(a.c, x))
             |            ELSE named_struct('o', concat(a.o, array(a.c)), 'c', x) END,
             |  r -> concat(r.o, array(r.c)))""".stripMargin)))
        val avg = vocab
          .agg((sum(size(col("toks")).cast("long") * col("wf")).cast("double") /
            sum(col("wf")).cast("double")).as("a"))
          .collect().head.getDouble(0)
        merges += MergeRound(r, bl, br, best.getAs[Long]("cnt"), avg)
        r += 1
      }
    }
    (merges.result(), vocab)
  }
}
