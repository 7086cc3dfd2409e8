package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge semantics on immutable storage (SURVEY.md §2.1 S5/S8).
  *
  * The reference gets idempotent re-processing from Postgres
  * `INSERT … ON CONFLICT (id) DO UPDATE` executed one row at a time
  * (/root/reference/dags/etl/fact_gold_price.py:169-196). On a file
  * lake there is no row-level upsert, so the engine expresses merge as
  * a set operation: union the target with the incoming batch, then keep
  * exactly one row per key with a deterministic priority. On a real
  * table format this maps 1:1 to MERGE INTO; at 100 TB the write side
  * is bounded by pairing it with dynamic partition overwrite on the
  * fact's date_id partitions so only touched dates rewrite.
  */
object Merge {

  /** Latest-wins upsert: one output row per `key`; rows from `incoming`
    * beat rows from `existing`; within a side, higher `version` wins.
    * (S5, ON CONFLICT(id) DO UPDATE — fact_gold_price.py:171-179.)
    *
    * Ties beyond (_prio, version) — two incoming rows with the same key
    * and version — break on a hash of the full payload, so the survivor
    * is deterministic under any partitioning/retry, unlike a bare
    * row_number whose ordering of equal rows is whatever the shuffle
    * delivered. (The reference's sequential ON CONFLICT loop is
    * batch-order deterministic; a content hash is the strongest
    * order-free equivalent.)
    */
  def upsertLatestWins(
      existing: DataFrame, incoming: DataFrame,
      key: String, version: String): DataFrame = {
    val unioned = existing.withColumn("_prio", lit(0))
      .unionByName(incoming.withColumn("_prio", lit(1)))
    val payload = unioned.columns.filterNot(_ == "_prio").map(col).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(col("_prio").desc, col(version).desc,
        xxhash64(payload: _*).desc)
    unioned
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_prio", "_rn")
  }

  /** CDC apply — the general MERGE INTO shape with all three actions in
    * one keyed pass: a change log of (key, op ∈ I/U/D, seq, payload…)
    * is collapsed to the latest change per key (seq argmax, content-hash
    * tie-break like [[upsertLatestWins]]), then reconciled with the
    * target in ONE full-outer join: unmatched target rows pass through,
    * I/U rows take the change payload, D rows delete (drop the key
    * whether or not it existed). Both sides are key-grain at the join,
    * so the shuffle moves one row per touched key plus the target —
    * and on a date-partitioned lake the write pairs with dynamic
    * partition overwrite exactly like the simple upsert.
    *
    * @param target  current table state; columns = key +: payload
    * @param changes change log; columns = key, op, seq +: payload
    * @param opCol   column holding "I" | "U" | "D". I and U are
    *                synonyms at apply time (both upsert — an I against
    *                an existing key overwrites, a U against a missing
    *                key inserts), matching how CDC appliers tolerate
    *                replayed/reordered logs; only "D" is distinguished.
    * @param seqCol  change ordering (log sequence / commit timestamp)
    */
  def applyCdc(
      target: DataFrame, changes: DataFrame,
      key: String, opCol: String, seqCol: String): DataFrame = {
    val payloadCols = target.columns.filterNot(_ == key).toSeq
    // tie-break hashes op + payload: two equal-seq changes differing
    // ONLY in op (D vs U, same payload) must still resolve identically
    // under any partitioning
    val w = Window.partitionBy(col(key))
      .orderBy(col(seqCol).desc,
        xxhash64(col(opCol) +: payloadCols.map(col): _*).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(key) +: col(opCol).as("_op") +: payloadCols.map(c =>
        col(c).as(s"_c_$c")): _*)
    val t = target.select(col(key) +: payloadCols.map(c =>
      col(c).as(s"_t_$c")): _*)
    t.join(latest, Seq(key), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(key) +: payloadCols.map(c =>
        when(col("_op").isNotNull, col(s"_c_$c"))
          .otherwise(col(s"_t_$c")).as(c)): _*)
  }

  /** General `MERGE INTO` — the full conditional-clause form the keyed
    * specializations above are instances of: a target and a key-unique
    * source reconcile in ONE full-outer join, and per-row clause
    * conditions decide update / delete / insert / pass-through. Clause
    * expressions reference the two sides as `t.<col>` / `s.<col>`
    * (the frames are joined under those aliases), and a condition that
    * evaluates to NULL counts as not-satisfied — SQL WHERE semantics,
    * matching how the public table formats evaluate MERGE conditions.
    *
    * Clause precedence on a matched key: DELETE is tested first, then
    * UPDATE, else the target row passes through unchanged. A source
    * row with no match inserts iff `insertCond` is present and holds
    * (columns absent from the source insert as NULL — the schema-
    * evolution posture [[graft.io.TxTable.merge]] pre-aligns away).
    * Target rows with no source match always survive.
    *
    * The source must be key-unique (the same contract the public MERGE
    * implementations enforce): a duplicate source key would fan its
    * target row out — dedup upstream ([[applyCdc]]'s seq-argmax is the
    * usual spelling). Scale shape: one shuffle of each side on the
    * join key; Spark broadcasts a small source automatically, and the
    * transactional wrapper bounds the target side to the partitions
    * the source touches.
    *
    * @param updateSet  assignments applied when matched and
    *                   `updateCond` holds; unlisted columns keep the
    *                   target's value. Empty = no UPDATE clause.
    * @param insertCond None = no INSERT clause (unmatched source rows
    *                   drop); `Some(lit(true))` = unconditional insert.
    */
  def mergeInto(
      target: DataFrame, source: DataFrame, key: String,
      updateSet: Seq[(String, Column)] = Seq.empty,
      updateCond: Column = lit(true),
      deleteCond: Option[Column] = None,
      insertCond: Option[Column] = Some(lit(true))): DataFrame = {
    val tCols = target.columns.toSeq
    val sCols = source.columns.toSet
    require(!tCols.contains("_t_present") && !sCols.contains("_s_present"),
      "mergeInto reserves _t_present/_s_present marker names")
    val unknown = updateSet.map(_._1).filterNot(tCols.contains)
    require(unknown.isEmpty, s"updateSet names non-target columns: $unknown")
    require(!updateSet.exists(_._1 == key), s"updateSet must not reassign key '$key'")
    // presence markers, not key-null checks: a NULL join key lands both
    // sides' rows in the unmatched branches (equality never matches
    // NULL) and the markers classify them correctly
    val t = target.withColumn("_t_present", lit(true)).as("t")
    val s = source.withColumn("_s_present", lit(true)).as("s")
    val joined = t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
    val matched = col("t._t_present").isNotNull && col("s._s_present").isNotNull
    val sOnly = col("t._t_present").isNull
    def holds(c: Column): Column = coalesce(c, lit(false))
    val keep = when(matched, deleteCond.fold(lit(true))(d => !holds(d)))
      .when(sOnly, insertCond.fold(lit(false))(holds))
      .otherwise(lit(true)) // target-only rows always survive
    val updating =
      if (updateSet.isEmpty) lit(false) else matched && holds(updateCond)
    val assign = updateSet.toMap
    val outCols = tCols.map { c =>
      if (c == key) coalesce(col(s"t.$key"), col(s"s.$key")).as(key)
      else {
        val insVal = if (sCols.contains(c)) col(s"s.$c") else lit(null)
        when(updating, assign.getOrElse(c, col(s"t.$c")))
          .when(sOnly, insVal)
          .otherwise(col(s"t.$c"))
          .as(c)
      }
    }
    joined.filter(keep).select(outCols: _*)
  }

  /** Column-merging upsert keyed by name: keep existing non-null column
    * values, fill from incoming otherwise; insert unmatched incoming
    * rows (S8, ON CONFLICT(name) DO UPDATE SET color =
    * COALESCE(sources.color, EXCLUDED.color) —
    * populate_sources_dag.py:142-152). Expressed as a full outer join +
    * COALESCE, the set-based equivalent.
    */
  def upsertCoalesceColumns(
      existing: DataFrame, incoming: DataFrame,
      key: String, mergeCols: Seq[String]): DataFrame = {
    val e = existing.select(col(key) +: mergeCols.map(c => col(c).as(s"_e_$c")): _*)
    val i = incoming.select(col(key) +: mergeCols.map(c => col(c).as(s"_i_$c")): _*)
    e.join(i, Seq(key), "full_outer")
      .select(col(key) +: mergeCols.map(c =>
        coalesce(col(s"_e_$c"), col(s"_i_$c")).as(c)): _*)
  }
}
