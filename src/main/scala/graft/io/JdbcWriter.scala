package graft.io

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC keyed-upsert sink — the write half of [[JdbcSource]], closing
  * source/sink symmetry with the reference's warehouse: its primary
  * sink is Postgres `INSERT … ON CONFLICT (id) DO UPDATE` executed ONE
  * ROW AT A TIME inside a Python loop
  * (/root/reference/dags/etl/fact_gold_price.py:169-196). This is the
  * set-based re-expression: per input partition, one connection and
  * STATEMENT BATCHES — an UPDATE batch keyed on `key`, then an INSERT
  * batch for exactly the keys the update counts proved absent — so a
  * 10k-row batch costs ~10k/batchSize round trips, not 10k.
  *
  * Scale posture: this seam is for WAREHOUSE-SIDED exports (dimension
  * refreshes, report tables, the reference's fact feed) — bounded
  * result sets where an OLTP store is the consumer. A 100 TB fact
  * never funnels through JDBC; lake-side persistence is
  * [[MergeWriter]]/[[TxTable]]. Parallelism = input partitions (each
  * holds one connection); repartition the frame to the connection
  * count the database tolerates before calling.
  *
  * Semantics:
  *  - latest-state upsert per key: rows present in the table are
  *    UPDATEd, absent rows INSERTed; replaying the same batch is
  *    idempotent (updates rewrite equal values). Absence is proven by
  *    the batch UPDATE's exact per-statement count where the driver
  *    reports one; drivers that return `SUCCESS_NO_INFO` fall back to
  *    a per-row UPDATE for exactly those rows (never guessed — a
  *    guessed "present" would silently lose inserts).
  *  - the incoming frame must be key-unique (one state per key — the
  *    [[graft.ops.Merge.upsertLatestWins]] output shape); duplicate
  *    keys within one batch would race their own updates.
  *  - the target table must exist (the reference manages DDL
  *    separately too); this writer owns rows, not schema — and the
  *    conflict column needs a UNIQUE INDEX, exactly as Postgres
  *    `ON CONFLICT (id)` demands one: without it every batched UPDATE
  *    is a full table scan (measured 75 s vs 3 s on a 17k-row Derby
  *    table in the x_jdbc_roundtrip carrier).
  *  - single-writer per key, like the reference's hourly task. For
  *    concurrent writers on one key range, front the table with
  *    [[TxTable]] and export downstream of it.
  */
object JdbcWriter {

  /** @param df        key-unique rows to land (key column + payload)
    * @param url       JDBC url (credentials via `options` or the url)
    * @param table     existing target table
    * @param key       conflict column
    * @param batchSize statements per executeBatch round trip
    * @param options   passed to DriverManager (user, password, …) */
  def upsert(
      df: DataFrame, url: String, table: String, key: String,
      batchSize: Int = 1000, options: Map[String, String] = Map.empty): Unit = {
    val fields = df.schema.fields.map(_.name).toSeq
    require(fields.contains(key), s"key $key not in ${fields.mkString(",")}")
    val payload = fields.filterNot(_ == key)
    require(payload.nonEmpty, "upsert needs at least one non-key column")
    // columns are quoted exact-case: Spark's own JDBC writer creates
    // case-preserved quoted identifiers, so an unquoted name would
    // fold to the dialect default and miss them (Derby: 'PRICE' is
    // not a column). Same ANSI double-quote both there and here.
    def q(c: String): String = "\"" + c + "\""
    val updateSql =
      s"UPDATE $table SET ${payload.map(c => s"${q(c)} = ?").mkString(", ")} WHERE ${q(key)} = ?"
    val insertSql =
      s"INSERT INTO $table (${fields.map(q).mkString(", ")}) " +
        s"VALUES (${fields.map(_ => "?").mkString(", ")})"
    val keyIdx = fields.indexOf(key)
    val payloadIdx = payload.map(fields.indexOf).toArray
    val fieldArr = fields.toArray

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val props = new java.util.Properties()
        options.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val update = conn.prepareStatement(updateSql)
          val insert = conn.prepareStatement(insertSql)
          try {
            rows.grouped(batchSize).foreach { chunk =>
              // UPDATE pass: one batch round trip for the whole chunk
              chunk.foreach { r =>
                payloadIdx.zipWithIndex.foreach { case (src, p) =>
                  update.setObject(p + 1, r.get(src))
                }
                update.setObject(payloadIdx.length + 1, r.get(keyIdx))
                update.addBatch()
              }
              val counts = update.executeBatch()
              // INSERT pass: exactly the rows the update counts proved
              // absent (count 0) — no read-before-write round trip.
              // A NEGATIVE count (Statement.SUCCESS_NO_INFO — MySQL
              // with rewriteBatchedStatements, Oracle's default
              // batching) proves NOTHING: treating it as "present"
              // would silently drop absent rows. Those rows re-run
              // their UPDATE individually (idempotent — it rewrites
              // the same values) to get an exact count, costing one
              // round trip per row only on drivers that withhold
              // batch counts.
              var inserts = 0
              chunk.iterator.zip(counts.iterator).foreach { case (r, n) =>
                val absent =
                  if (n >= 0) n == 0
                  else {
                    payloadIdx.zipWithIndex.foreach { case (src, p) =>
                      update.setObject(p + 1, r.get(src))
                    }
                    update.setObject(payloadIdx.length + 1, r.get(keyIdx))
                    update.executeUpdate() == 0
                  }
                if (absent) {
                  fieldArr.indices.foreach(i => insert.setObject(i + 1, r.get(i)))
                  insert.addBatch()
                  inserts += 1
                }
              }
              if (inserts > 0) insert.executeBatch()
              conn.commit() // per-chunk commit bounds transaction size
            }
          } finally { update.close(); insert.close() }
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
    }
  }
}
