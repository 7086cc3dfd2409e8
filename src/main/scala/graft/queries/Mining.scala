package graft.queries

import graft.Tables
import graft.ops.{Debounce, DenseId, Graph, Prefix, SeqFold}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 mining/curation surface: graph closure (triangles),
  * sequential per-key state (EWMA, chained debounce), distribution
  * drift (PSI), marketing attribution (as-of + range join reuse),
  * positional phrase search, and scalable dense-id assignment. Each
  * query is value-oracled against DuckDB; float paths use either
  * fixed-order folds (bit-identical sequential arithmetic) or 2^40
  * fixed-point quantization before any order-free summation, the
  * established graft float-determinism disciplines.
  */
object Mining {
  private val Dec = DecimalType(18, 2)
  private val WeekUs = 604800000000L // 7 days in microseconds
  private[queries] val DebounceGapUs = 43200000000L // 12 h cool-down
  // 2^40 fixed-point scale for order-free summation of small doubles
  private val Q40 = "1099511627776.0"

  /** Unrolled DuckDB peel chain for [[x_kcore]] — same rounds as the
    * engine loop. MATERIALIZED is load-bearing: DuckDB inlines CTEs by
    * default, and each round references its predecessor 3×, so the
    * inlined chain re-executes the base ~3^rounds times (measured 150s
    * → 0.14s at sf0.01). */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val ctes = Seq(
      "b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)",
      "e0 AS MATERIALIZED (SELECT a.p AS u, bb.p AS v FROM b a " +
        "JOIN b bb ON a.o = bb.o AND a.p < bb.p GROUP BY 1, 2)") ++
      (1 to rounds).flatMap { r =>
        Seq(
          s"d$r AS MATERIALIZED (SELECT n FROM (SELECT n, COUNT(*) AS deg FROM " +
            s"(SELECT u AS n FROM e${r - 1} UNION ALL SELECT v AS n FROM e${r - 1}) " +
            s"GROUP BY 1) WHERE deg >= $k)",
          s"e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1} " +
            s"WHERE u IN (SELECT n FROM d$r) AND v IN (SELECT n FROM d$r))")
      }
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT n AS node, COUNT(*) AS core_deg
         |FROM (SELECT u AS n FROM e$rounds UNION ALL SELECT v AS n FROM e$rounds)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Unrolled DuckDB oracle for [[x_bpe_train]] — the identical greedy
    * rounds (pair scoring, (cnt DESC, pair) top-1, leftmost-first fold
    * application) as chained MATERIALIZED CTEs. The fold's struct
    * accumulator {'o' emitted, 'c' carry} is the same machine as the
    * engine's aggregate() lambda, so vocabularies match exactly. */
  private def bpeOracle(rounds: Int, encode: Boolean = false,
      fertility: Boolean = false): String = {
    def roundCtes(r: Int): String =
      s"""p$r AS MATERIALIZED (
         |  -- pair key as two columns, like the engine: a
         |  -- separator-concatenated key would collide with tokens
         |  -- containing the separator character
         |  SELECT pr.l AS bl, pr.r AS br, CAST(SUM(wf) AS BIGINT) AS cnt FROM (
         |    SELECT wf, UNNEST(CASE WHEN len(toks) >= 2
         |      THEN list_transform(range(1, len(toks)), i -> {'l': toks[i], 'r': toks[i+1]})
         |      ELSE CAST([] AS STRUCT(l VARCHAR, r VARCHAR)[]) END) AS pr
         |    FROM v${r - 1}) GROUP BY 1, 2),
         |b$r AS MATERIALIZED (
         |  SELECT bl, br, cnt FROM p$r ORDER BY cnt DESC, bl, br LIMIT 1),
         |v$r AS MATERIALIZED (
         |  -- fold with a LIST accumulator whose last element is the
         |  -- carry (DuckDB 1.0's list_reduce corrupts list fields
         |  -- inside STRUCT accumulators — {'o': a.o || [a.c], ...}
         |  -- silently loses prior accumulation)
         |  SELECT word, wf,
         |    list_reduce(list_transform(toks, t -> [t]),
         |      (a, x) -> CASE WHEN a[-1] = b$r.bl AND x[1] = b$r.br
         |                THEN list_slice(a, 1, len(a) - 1) || [a[-1] || x[1]]
         |                ELSE a || x END) AS toks
         |  FROM v${r - 1} CROSS JOIN b$r),
         |s$r AS MATERIALIZED (
         |  SELECT CAST(SUM(len(toks) * wf) AS DOUBLE) / CAST(SUM(wf) AS DOUBLE) AS avg_tok
         |  FROM v$r)""".stripMargin
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wf FROM (
       |    SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT word, wf,
       |    list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS toks
       |  FROM w),
       |""".stripMargin +
      (1 to rounds).map(roundCtes).mkString(",\n") +
      (if (fertility)
        s"""
           |, dw AS (SELECT lang, word FROM (
           |    SELECT lang, UNNEST(string_split(text, ' ')) AS word FROM documents)
           |  WHERE word <> '')
           |SELECT lang, n_words, n_chars, n_bpe_tokens,
           |  CAST(n_bpe_tokens AS DOUBLE) / n_words AS fertility,
           |  CAST(n_chars AS DOUBLE) / n_bpe_tokens AS compression
           |FROM (
           |  SELECT dw.lang, COUNT(*) AS n_words,
           |    CAST(SUM(len(dw.word)) AS BIGINT) AS n_chars,
           |    CAST(SUM(len(v$rounds.toks)) AS BIGINT) AS n_bpe_tokens
           |  FROM dw JOIN v$rounds USING (word) GROUP BY 1)
           |ORDER BY lang""".stripMargin
      else if (encode)
        s"""
           |, dw AS (SELECT doc_id, word FROM (
           |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
           |  WHERE word <> '')
           |SELECT doc_id, n_words, n_chars, n_bpe_tokens,
           |  CAST(n_chars AS DOUBLE) / n_bpe_tokens AS compression
           |FROM (
           |  SELECT dw.doc_id, COUNT(*) AS n_words,
           |    CAST(SUM(len(dw.word)) AS BIGINT) AS n_chars,
           |    CAST(SUM(len(v$rounds.toks)) AS BIGINT) AS n_bpe_tokens
           |  FROM dw JOIN v$rounds USING (word) GROUP BY 1)
           |ORDER BY doc_id""".stripMargin
      else
        "\nSELECT * FROM (\n" +
          (1 to rounds).map(r =>
            s"SELECT $r AS round, b$r.bl AS left_tok, b$r.br AS right_tok, " +
              s"b$r.cnt AS pair_count, s$r.avg_tok AS avg_tokens_per_word FROM b$r, s$r")
            .mkString("\nUNION ALL\n") +
          "\n) ORDER BY round")
  }

  /** Part co-purchase edge list — shared input of the two graph
    * queries: distinct C(b,2) part pairs generated MAP-SIDE per order
    * basket (bounded by basket size; the fact never self-joins). */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      .select(explode(expr(
        """CASE WHEN size(parts) >= 2 THEN
          |  flatten(transform(sequence(1, size(parts) - 1), i ->
          |    transform(sequence(i + 1, size(parts)), j ->
          |      struct(element_at(parts, i) AS u,
          |             element_at(parts, j) AS v))))
          |ELSE cast(array() AS array<struct<u: bigint, v: bigint>>)
          |END""".stripMargin)).as("e"))
      .select(col("e.u"), col("e.v"))

  val all: Map[String, Q] = Map(

    // BPE ENCODE — the inference side of x_bpe_train: a word's token
    // list under the learned merges is exactly its training end state,
    // so tokenizing the corpus is ONE broadcast join of the
    // vocabulary-sized (word → tokens) map onto the doc-word pairs —
    // no per-document merge loop ever runs at corpus scale. Per-doc
    // report: word/char/BPE-token counts + chars-per-token compression.
    "x_bpe_encode" -> Q(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word")).agg(count(lit(1)).as("wf"))
        val (_, vocab) = graft.ops.Bpe.trainWithVocab(words, rounds = 5)
        val wordLens = vocab.select(col("word"), size(col("toks")).as("ntok"))
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .join(broadcast(wordLens), "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(length(col("word")).cast("long")).as("n_chars"),
            sum(col("ntok").cast("long")).as("n_bpe_tokens"))
          .withColumn("compression", expr("cast(n_chars AS double) / n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      bpeOracle(5, encode = true)),

    // Tokenizer fertility by language — subwords-per-word under the
    // learned BPE merges, the standard multilingual-tokenizer equity
    // diagnostic (a language whose fertility runs high pays more
    // context window per sentence). Same machinery as x_bpe_encode:
    // training collapses the corpus once to the word-frequency table,
    // encoding is one broadcast join of the vocabulary-sized token-
    // length map, and the language rollup is a combine-enabled
    // aggregate — the corpus is scanned exactly twice (train + encode)
    // regardless of rounds or languages.
    "x_bpe_fertility" -> Q(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word")).agg(count(lit(1)).as("wf"))
        val (_, vocab) = graft.ops.Bpe.trainWithVocab(words, rounds = 5)
        val wordLens = vocab.select(col("word"), size(col("toks")).as("ntok"))
        Tables.documents(s, dir)
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .join(broadcast(wordLens), "word")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_words"),
            sum(length(col("word")).cast("long")).as("n_chars"),
            sum(col("ntok").cast("long")).as("n_bpe_tokens"))
          .withColumn("fertility", expr("cast(n_bpe_tokens AS double) / n_words"))
          .withColumn("compression", expr("cast(n_chars AS double) / n_bpe_tokens"))
          .orderBy(col("lang"))
      },
      bpeOracle(5, fertility = true)),

    // Trailing-window anomaly detection: each event scored against the
    // 20 prior events of ITS OWN key — z = (x − μ_prior)/σ_prior from
    // exact decimal window moments, one fixed IEEE expression (the
    // Exact.stddevSampExact construction in a frame). Both windows
    // share one user-keyed sort; emitted rows are |z| > 3 with their
    // evidence. The frame excludes the current row, so an anomaly
    // cannot mask itself.
    "a28_anomaly" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ep"), col("event_id")).rowsBetween(-20, -1)
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("user_id"), unix_micros(col("ts")).as("ep"),
            col("event_id"), col("value"))
          .withColumn("n", count(col("value")).over(w))
          .withColumn("sx", sum(col("value").cast(Dec)).over(w).cast("double"))
          .withColumn("sx2", sum(col("value").cast(Dec) * col("value").cast(Dec))
            .over(w).cast("double"))
          .filter(col("n") >= 8)
          .withColumn("mean_prior", expr("sx / n"))
          .withColumn("std_prior", expr("sqrt((sx2 - sx * sx / n) / (n - 1))"))
          .filter(col("std_prior") > 0)
          .withColumn("z", expr("(value - mean_prior) / std_prior"))
          .filter(abs(col("z")) > 3)
          .select(col("user_id"), col("ep"), col("event_id"), col("value"),
            col("n").as("n_prior"), col("mean_prior"), col("std_prior"), col("z"))
          .orderBy(col("user_id"), col("ep"), col("event_id"))
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ep, event_id, value
        |           FROM events WHERE value IS NOT NULL),
        |m AS (SELECT user_id, ep, event_id, value,
        |        COUNT(value) OVER w AS n,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |             OVER w AS DOUBLE) AS sx2
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id
        |                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |sc AS (SELECT *, sx / n AS mean_prior,
        |         sqrt((sx2 - sx * sx / n) / (n - 1)) AS std_prior
        |       FROM m WHERE n >= 8),
        |z AS (SELECT *, (value - mean_prior) / std_prior AS z
        |      FROM sc WHERE std_prior > 0)
        |SELECT user_id, ep, event_id, value, n AS n_prior, mean_prior, std_prior, z
        |FROM z WHERE abs(z) > 3
        |ORDER BY user_id, ep, event_id""".stripMargin),

    // Holt double-exponential smoothing (level + trend) per key —
    // t13_ewma's forecasting big sibling: state [l, t] updates
    // l' = α·x + (1−α)(l+t), t' = β(l'−l) + (1−β)t with dyadic-exact
    // α=1/2, β=1/4; fitted = one-step-ahead forecast l+t of the PRIOR
    // row. Sequential by construction (state reads its own output) —
    // the ops/SeqFold typed kernel: one shuffle on user_id, O(n)
    // constant-state pass (r7's aggregate(... concat) array fold was
    // O(n²) per key). Oracle = quadratic prefix re-folds over a
    // 2-element LIST state (same IEEE operation sequence per row ⇒
    // bit-identical; list state also dodges DuckDB's struct-accumulator
    // list_reduce corruption).
    "t15_holt" -> Q(
      (s, dir) =>
        SeqFold.holt(
          Tables.events(s, dir)
            .filter(col("value").isNotNull)
            .select(col("user_id"), unix_micros(col("ts")).as("ep"),
              col("event_id"), col("value")),
          "user_id", "ep", "event_id", "value", alpha = 0.5, beta = 0.25)
          .orderBy(col("user_id"), col("ep"), col("event_id")),
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ep, event_id, value
        |           FROM events WHERE value IS NOT NULL),
        |g AS (SELECT user_id,
        |        list_sort(list({'ep': ep, 'event_id': event_id, 'value': value})) AS xs
        |      FROM e GROUP BY 1),
        |r AS (SELECT user_id, xs, UNNEST(xs) AS x,
        |             UNNEST(range(1, len(xs) + 1)) AS i
        |      FROM g),
        |f AS (SELECT user_id, x, i,
        |        list_reduce(list_transform(xs[1:i], t -> [t.value, CAST(0 AS DOUBLE)]),
        |          (a, v) -> [0.5 * v[1] + 0.5 * (a[1] + a[2]),
        |                     0.25 * ((0.5 * v[1] + 0.5 * (a[1] + a[2])) - a[1])
        |                       + 0.75 * a[2]]) AS st,
        |        CASE WHEN i = 1 THEN NULL ELSE
        |          list_reduce(list_transform(xs[1:i-1], t -> [t.value, CAST(0 AS DOUBLE)]),
        |            (a, v) -> [0.5 * v[1] + 0.5 * (a[1] + a[2]),
        |                       0.25 * ((0.5 * v[1] + 0.5 * (a[1] + a[2])) - a[1])
        |                         + 0.75 * a[2]]) END AS stp
        |      FROM r)
        |SELECT user_id, x.ep AS ep, x.event_id AS event_id, x.value AS value,
        |  st[1] AS level, st[2] AS trend,
        |  CASE WHEN i = 1 THEN NULL ELSE stp[1] + stp[2] END AS fitted
        |FROM f ORDER BY user_id, ep, event_id""".stripMargin),

    // BPE tokenizer training (5 greedy merge rounds) over the corpus
    // word-frequency table — ops/Bpe. The corpus collapses once to
    // vocab; each round is vocab-sized (pair aggregate + driver top-1 +
    // map-side fold), the Sennrich et al. procedure with the KMeans
    // driver-loop split. The oracle re-executes the identical rounds as
    // unrolled CTEs; merge application is pure string fold, so the
    // learned merge table and token statistics match exactly.
    "x_bpe_train" -> Q(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word")).agg(count(lit(1)).as("wf"))
        val rows = graft.ops.Bpe.train(words, rounds = 5)
        import s.implicits._
        rows.toDF().orderBy(col("round"))
      },
      bpeOracle(5)),

    // Triangle census of the part co-purchase graph (edges = parts
    // sharing an order). Engine: map-side C(b,2) pair generation
    // (bounded by basket size, no self-join of the fact) + the
    // degree-ordered orientation in ops/Graph — wedge work is
    // O(E^1.5) total with no hub blowup (out-degree ≤ O(√E)). The
    // oracle rebuilds the census from the raw fact with plain
    // self-joins — a different formulation of both stages.
    "x_triangles" -> Q(
      (s, dir) => Graph.triangleStats(coPurchaseEdges(s, dir)),
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT a.p AS u, bb.p AS v FROM b a
        |      JOIN b bb ON a.o = bb.o AND a.p < bb.p GROUP BY 1, 2),
        |d AS (SELECT n, COUNT(*) AS deg
        |      FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) GROUP BY 1),
        |o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS dst,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS dd
        |      FROM e JOIN d du ON du.n = e.u JOIN d dv ON dv.n = e.v),
        |w AS (SELECT x.dst AS p, y.dst AS q FROM o x
        |      JOIN o y ON x.src = y.src AND (x.dd, x.dst) < (y.dd, y.dst)),
        |t AS (SELECT COUNT(*) AS n_triangles FROM w
        |      JOIN o ON o.src = w.p AND o.dst = w.q)
        |SELECT (SELECT COUNT(*) FROM d) AS n_nodes,
        |       (SELECT COUNT(*) FROM e) AS n_edges,
        |       (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM d) AS n_wedges,
        |       t.n_triangles,
        |       CASE WHEN (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM d) > 0
        |            THEN 3.0 * t.n_triangles /
        |              (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM d)
        |       END AS global_cc
        |FROM t""".stripMargin),

    // Per-user EWMA (α = 1/4 — an exact binary fraction) of event
    // values in (ts, id) order. EWMA's recurrence reads the previous
    // OUTPUT, so it is a sequential fold, not a window frame — the
    // ops/SeqFold typed kernel (Debounce discipline): one shuffle on
    // user_id, per-key sort in the task, constant-state O(n) pass.
    // (r7 used an aggregate(... concat) array fold — correct but O(n²)
    // per key from the per-step accumulator copy; a 50k-event hot key
    // visibly degrades, the MiningSpec law.) Arithmetic is the same
    // IEEE sequence per row as the oracle's quadratic prefix re-folds,
    // so doubles stay bit-identical.
    "t13_ewma" -> Q(
      (s, dir) =>
        SeqFold.ewma(
          Tables.events(s, dir)
            .filter(col("value").isNotNull)
            .select(col("user_id"), unix_micros(col("ts")).as("ep"),
              col("event_id"), col("value")),
          "user_id", "ep", "event_id", "value", alpha = 0.25)
          .orderBy(col("user_id"), col("ep"), col("event_id")),
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ep, event_id, value
        |           FROM events WHERE value IS NOT NULL),
        |g AS (SELECT user_id,
        |        list_sort(list({'ep': ep, 'event_id': event_id, 'value': value})) AS xs
        |      FROM e GROUP BY 1),
        |r AS (SELECT user_id, xs, UNNEST(xs) AS x,
        |             UNNEST(range(1, len(xs) + 1)) AS i
        |      FROM g)
        |SELECT user_id, x.ep AS ep, x.event_id AS event_id, x.value AS value,
        |  list_reduce(list_transform(xs[1:i], t -> t.value),
        |              (acc, v) -> 0.25 * v + 0.75 * acc) AS ewma
        |FROM r ORDER BY user_id, ep, event_id""".stripMargin),

    // Population-stability-index drift report: the fixture's first time
    // half is the reference distribution, the second half the current
    // one; 10 equal-width bins over the reference's value range.
    // Per-bin PSI terms are doubles from one fixed expression; the
    // headline total quantizes each term to 2^40 fixed point FIRST
    // (floor — exact) so the cross-bin sum is order-free integer math,
    // the x_gram_matrix discipline.
    "a25_psi_drift" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(unix_micros(col("ts")).as("ep"), col("value"))
        val mid = ev.agg(expr("min(ep) + (max(ep) - min(ep)) div 2").as("mid"))
        val halves = ev.crossJoin(broadcast(mid))
          .select(col("value"), (col("ep") < col("mid")).as("is_ref"))
        val bounds = halves.filter(col("is_ref"))
          .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        val binned = halves.crossJoin(broadcast(bounds))
          .select(expr(
            "least(9, greatest(0, cast(floor(((value - lo) * 10.0) / (hi - lo)) AS int)))")
            .as("bin"), col("is_ref"))
          .groupBy(col("bin"))
          .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
            sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
        val s10 = s.range(10).select(col("id").cast("int").as("bin"))
        val full = s10.join(binned, Seq("bin"), "left")
          .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_cur"), lit(0L)).as("n_cur"))
        val tot = full.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
        full.crossJoin(broadcast(tot))
          .withColumn("p_ref", expr("cast(n_ref AS double) / t_ref"))
          .withColumn("p_cur", expr("cast(n_cur AS double) / t_cur"))
          // round(…,9) absorbs the ln() last-ulp libm divergence (the
          // x_bm25 discipline — sf0.1 surfaced exactly one such row)
          .withColumn("psi_term", expr(
            "round((p_cur - p_ref) * ln((p_cur + 1e-6) / (p_ref + 1e-6)), 9)"))
          .withColumn("psi_q", expr(s"cast(floor(psi_term * $Q40) AS bigint)"))
          .withColumn("psi_total", expr(
            s"cast(sum(psi_q) over () AS double) / $Q40"))
          .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"),
            col("p_cur"), col("psi_term"), col("psi_total"))
          .orderBy(col("bin"))
      },
      s"""WITH e AS (SELECT epoch_us(ts) AS ep, value FROM events WHERE value IS NOT NULL),
         |m AS (SELECT MIN(ep) + (MAX(ep) - MIN(ep)) // 2 AS mid FROM e),
         |h AS (SELECT value, ep < m.mid AS is_ref FROM e CROSS JOIN m),
         |bo AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM h WHERE is_ref),
         |bi AS (SELECT LEAST(9, GREATEST(0,
         |         CAST(FLOOR(((value - lo) * 10.0) / (hi - lo)) AS INT))) AS bin,
         |         is_ref
         |       FROM h CROSS JOIN bo),
         |cnt AS (SELECT bin, SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         |               SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
         |        FROM bi GROUP BY 1),
         |fb AS (SELECT CAST(r.range AS INT) AS bin,
         |               CAST(COALESCE(cnt.n_ref, 0) AS BIGINT) AS n_ref,
         |               CAST(COALESCE(cnt.n_cur, 0) AS BIGINT) AS n_cur
         |        FROM range(10) r LEFT JOIN cnt ON cnt.bin = r.range),
         |tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM fb),
         |p AS (SELECT bin, n_ref, n_cur,
         |        CAST(n_ref AS DOUBLE) / t_ref AS p_ref,
         |        CAST(n_cur AS DOUBLE) / t_cur AS p_cur
         |      FROM fb CROSS JOIN tot),
         |ps AS (SELECT *,
         |        round((p_cur - p_ref) * ln((p_cur + 1e-6) / (p_ref + 1e-6)), 9) AS psi_term
         |       FROM p),
         |q AS (SELECT *, CAST(FLOOR(psi_term * $Q40) AS BIGINT) AS psi_q FROM ps)
         |SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term,
         |       CAST(SUM(psi_q) OVER () AS DOUBLE) / $Q40 AS psi_total
         |FROM q ORDER BY bin""".stripMargin),

    // Purchase attribution over the touch log (click/view): last-touch
    // via the custom backward AS-OF JOIN operator (plans/AsOfJoin —
    // oracle is DuckDB's native ASOF), linear credit via a user-keyed
    // 7-day range join. Output stays at purchase grain — per-row credit
    // expressions are single fixed double expressions, so no cross-row
    // float summation exists to go nondeterministic.
    "a26_attribution" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ep"),
            col("event_type"), col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ep"), col("value"))
        val touches0 = ev.filter(col("event_type").isin("click", "view"))
        val touches = touches0
          .groupBy(col("user_id").as("t_user"), col("ep").as("t_ep"))
          .agg(max(col("event_id")).as("t_id"),
            max_by(col("event_type"), col("event_id")).as("t_type"))
        val asof = graft.plans.AsOf.joinBackward(purchases, touches,
          Seq("user_id" -> "t_user"), "ep", "t_ep")
        val valid = col("t_ep").isNotNull && col("ep") - col("t_ep") <= WeekUs
        val cnt = purchases.as("p").join(
            touches0.select(col("user_id").as("c_user"), col("ep").as("c_ep"),
              col("event_type").as("c_type")),
            col("p.user_id") === col("c_user") &&
              col("c_ep") <= col("p.ep") &&
              col("c_ep") >= col("p.ep") - WeekUs)
          .groupBy(col("p.purchase_id").as("purchase_id"))
          .agg(sum(when(col("c_type") === "click", 1L).otherwise(0L)).as("nc"),
            sum(when(col("c_type") === "view", 1L).otherwise(0L)).as("nv"))
        asof.join(cnt, Seq("purchase_id"), "left")
          .select(col("purchase_id"), col("user_id"), col("ep"), col("value"),
            when(valid, col("t_id")).as("last_touch_id"),
            when(valid, col("t_type")).as("last_touch_type"),
            when(valid, expr("(ep - t_ep) div 1000000")).as("lookback_s"),
            coalesce(col("nc"), lit(0L)).as("n_click"),
            coalesce(col("nv"), lit(0L)).as("n_view"),
            (coalesce(col("nc"), lit(0L)) + coalesce(col("nv"), lit(0L))).as("n_touches"))
          .withColumn("credit_click", expr(
            "CASE WHEN n_touches = 0 THEN NULL ELSE (value * n_click) / n_touches END"))
          .withColumn("credit_view", expr(
            "CASE WHEN n_touches = 0 THEN NULL ELSE (value * n_view) / n_touches END"))
          .orderBy(col("purchase_id"))
      },
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ep, event_type, value
         |           FROM events),
         |p AS (SELECT event_id AS purchase_id, user_id, ep, value FROM e
         |      WHERE event_type = 'purchase'),
         |t0 AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
         |t AS (SELECT user_id AS t_user, ep AS t_ep, MAX(event_id) AS t_id,
         |             arg_max(event_type, event_id) AS t_type
         |      FROM t0 GROUP BY 1, 2),
         |a AS (SELECT p.purchase_id, p.user_id, p.ep, p.value,
         |             t.t_ep, t.t_id, t.t_type
         |      FROM p ASOF LEFT JOIN t
         |        ON p.user_id = t.t_user AND p.ep >= t.t_ep),
         |c AS (SELECT p.purchase_id,
         |        COUNT(*) FILTER (WHERE t0.event_type = 'click') AS nc,
         |        COUNT(*) FILTER (WHERE t0.event_type = 'view') AS nv
         |      FROM p JOIN t0 ON p.user_id = t0.user_id
         |        AND t0.ep <= p.ep AND t0.ep >= p.ep - $WeekUs
         |      GROUP BY 1)
         |SELECT a.purchase_id, a.user_id, a.ep, a.value,
         |  CASE WHEN a.t_ep IS NOT NULL AND a.ep - a.t_ep <= $WeekUs
         |       THEN a.t_id END AS last_touch_id,
         |  CASE WHEN a.t_ep IS NOT NULL AND a.ep - a.t_ep <= $WeekUs
         |       THEN a.t_type END AS last_touch_type,
         |  CASE WHEN a.t_ep IS NOT NULL AND a.ep - a.t_ep <= $WeekUs
         |       THEN (a.ep - a.t_ep) // 1000000 END AS lookback_s,
         |  COALESCE(c.nc, 0) AS n_click,
         |  COALESCE(c.nv, 0) AS n_view,
         |  COALESCE(c.nc, 0) + COALESCE(c.nv, 0) AS n_touches,
         |  CASE WHEN COALESCE(c.nc, 0) + COALESCE(c.nv, 0) = 0 THEN NULL
         |       ELSE (a.value * COALESCE(c.nc, 0)) / (COALESCE(c.nc, 0) + COALESCE(c.nv, 0))
         |  END AS credit_click,
         |  CASE WHEN COALESCE(c.nc, 0) + COALESCE(c.nv, 0) = 0 THEN NULL
         |       ELSE (a.value * COALESCE(c.nv, 0)) / (COALESCE(c.nc, 0) + COALESCE(c.nv, 0))
         |  END AS credit_view
         |FROM a LEFT JOIN c USING (purchase_id)
         |ORDER BY purchase_id""".stripMargin),

    // Chained 12 h debounce of the event log (ops/Debounce): keep a row
    // iff its gap since the last KEPT row exceeds the cool-down — a
    // per-key sequential fold no window spelling can express (the kept
    // chain is its own state). Oracle: recursive CTE + LATERAL top-1
    // step, a completely independent iterative formulation.
    "t14_debounce" -> Q(
      (s, dir) =>
        Debounce.debounce(
          Tables.events(s, dir)
            .select(col("user_id"), unix_micros(col("ts")).as("ep"), col("event_id")),
          "user_id", "ep", "event_id", DebounceGapUs)
          .orderBy(col("user_id"), col("ep")),
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, epoch_us(ts) AS ep, event_id FROM events),
         |r AS (
         |  SELECT user_id, ep, event_id
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |                                     ORDER BY ep, event_id) AS rn FROM e)
         |  WHERE rn = 1
         |  UNION ALL
         |  SELECT n.user_id, n.ep, n.event_id
         |  FROM r JOIN LATERAL (
         |    SELECT user_id, ep, event_id FROM e
         |    WHERE e.user_id = r.user_id AND e.ep > r.ep + $DebounceGapUs
         |    ORDER BY ep, event_id LIMIT 1) n ON true)
         |SELECT user_id, ep, event_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ep, event_id) AS INT)
         |    AS keep_seq
         |FROM r ORDER BY user_id, ep""".stripMargin),

    // Corpus-derived phrase occurrence search: the corpus's most
    // frequent word trigram (deterministic tie-break) becomes the
    // probe phrase; every document reports its match count and first
    // position. Engine: map-side trigram generation from the token
    // array (zero joins — position arithmetic inside one projection),
    // token-trigram aggregate for the top-1, 1-row broadcast probe.
    // Oracle spells BOTH stages positionally (zipped UNNEST +
    // ordinality self-discipline) — a structurally different plan.
    "x_phrase_search" -> Q(
      (s, dir) => {
        val tri = Tables.documents(s, dir)
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(toks) >= 3 THEN
              |  transform(sequence(1, size(toks) - 2), i ->
              |    struct(i AS pos,
              |           concat_ws(' ', toks[i-1], toks[i], toks[i+1]) AS tri))
              |ELSE cast(array() AS array<struct<pos: int, tri: string>>)
              |END""".stripMargin)).as("t"))
          .select(col("doc_id"), col("t.pos").as("pos"), col("t.tri").as("tri"))
        val top = tri.groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tri")).limit(1)
          .select(col("tri"))
        tri.join(broadcast(top), "tri")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
          .select(col("doc_id"), col("n_matches"), col("first_pos"))
          .orderBy(col("doc_id"))
      },
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(toks) AS tok, UNNEST(range(1, len(toks) + 1)) AS pos
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)),
        |tri AS (
        |  SELECT a.doc_id, a.pos,
        |         a.tok || ' ' || b.tok || ' ' || c.tok AS tri
        |  FROM tok a
        |  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
        |best AS (SELECT tri FROM (SELECT tri, COUNT(*) AS cnt FROM tri GROUP BY 1)
        |         ORDER BY cnt DESC, tri LIMIT 1)
        |SELECT t.doc_id, COUNT(*) AS n_matches, CAST(MIN(t.pos) AS INT) AS first_pos
        |FROM tri t JOIN best USING (tri)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Bounded-round k-core peel of the part co-purchase graph
    // (ops/Graph.kCore): the dense-community extraction that follows
    // triangle counting in any graph-mining pipeline. k=70 converges
    // to the true core within the 4 fixed rounds on this corpus; the
    // oracle unrolls the identical rounds (the x_pagerank discipline),
    // so the frame is exact either way.
    "x_kcore" -> Q(
      (s, dir) => {
        Graph.kCore(coPurchaseEdges(s, dir), k = 70, rounds = 4).orderBy(col("node"))
      },
      kcoreOracle(k = 70, rounds = 4)),

    // Top principal component of the embedding corpus: the exact
    // distributed Gram reduction (x_gram_matrix's 2^20 fixed-point
    // DECIMAL(38,0) discipline) feeds a driver-local 8-step power
    // iteration (ops/Eigen) — dim² values on the driver, corpus-sized
    // work distributed, the KMeans broadcast-centroid split. The Gram
    // matrix is symmetric, so only the UPPER TRIANGLE (i ≤ j: 2080
    // structs/row, not 64² = 4096) is exploded and aggregated — the
    // mirror happens on the driver where the dense 64×64 array is
    // assembled anyway. Halves the explode fan-out and the map-side
    // combine input; values are identical because g(i,j) and g(j,i)
    // sum the exact same integer products. Every float op is a
    // fixed-order fold and sqrt is IEEE correctly rounded, so the
    // oracle's recursive-CTE re-execution of the same sequence is
    // bit-identical with NO rounding fudge.
    "x_pca_power" -> Q(
      (s, dir) => {
        val gramRows = Tables.embeddings(s, dir)
          .select(explode(expr(
            """flatten(transform(sequence(1, 64), i ->
              |  transform(sequence(i, 64), j -> struct(
              |    i AS i, j AS j,
              |    cast(round(cast(element_at(embedding, i) AS double) * 1048576.0d) AS bigint)
              |      * cast(round(cast(element_at(embedding, j) AS double) * 1048576.0d) AS bigint)
              |      AS p))))""".stripMargin)).as("e"))
          .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
          .groupBy(col("i"), col("j"))
          .agg(sum(col("p").cast("decimal(38,0)")).as("sq"))
          .select(col("i"), col("j"),
            (col("sq").cast("double") / lit(1099511627776.0d)).as("g"))
          .collect()
        val g = Array.ofDim[Double](64, 64)
        gramRows.foreach { r =>
          val (i, j, v) = (r.getAs[Int]("i") - 1, r.getAs[Int]("j") - 1, r.getAs[Double]("g"))
          g(i)(j) = v
          g(j)(i) = v
        }
        val (v, eig) = graft.ops.Eigen.power(g, iters = 8)
        import s.implicits._
        (1 to 64).map(i => (i, v(i - 1), eig)).toDF("i", "loading", "eigval")
          .orderBy(col("i"))
      },
      """WITH RECURSIVE qv AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS BIGINT)) AS q
        |  FROM embeddings),
        |d AS (SELECT UNNEST(range(1, 65)) AS i),
        |prod AS (SELECT di.i AS i, dj.i AS j,
        |           CAST(qv.q[di.i] * qv.q[dj.i] AS DECIMAL(38,0)) AS p
        |         FROM qv CROSS JOIN d di CROSS JOIN d dj),
        |gr AS (SELECT i, j, CAST(SUM(p) AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS g
        |       FROM prod GROUP BY i, j),
        |grow AS (SELECT i, list(g ORDER BY j) AS row FROM gr GROUP BY i),
        |gm AS (SELECT list(row ORDER BY i) AS m FROM grow),
        |it AS (
        |  SELECT 0 AS t, list_transform(range(1, 65), x -> CAST(1 AS DOUBLE) / 64) AS v,
        |         CAST(0 AS DOUBLE) AS eig
        |  UNION ALL
        |  SELECT t + 1, list_transform(w, x -> x / nrm), nrm FROM (
        |    SELECT t, w,
        |      sqrt(list_reduce([CAST(0 AS DOUBLE)] || list_transform(w, x -> x * x),
        |        (a, b) -> a + b)) AS nrm
        |    FROM (
        |      SELECT it.t, list_transform(range(1, 65), i ->
        |        list_reduce([CAST(0 AS DOUBLE)] || list_transform(range(1, 65), j ->
        |          gm.m[i][j] * it.v[j]), (a, b) -> a + b)) AS w
        |      FROM it, gm WHERE it.t < 8)))
        |SELECT CAST(UNNEST(range(1, 65)) AS INT) AS i, UNNEST(v) AS loading, eig AS eigval
        |FROM it WHERE t = 8 ORDER BY i""".stripMargin),

    // Per-language robust feature scaling of document lengths:
    // (x − median) / IQR, the outlier-insensitive normalizer a feature
    // pipeline applies before training. Group quantiles are exact
    // interpolations over INTEGER token counts — dyadic fractions of
    // integers are exact in double under either interpolation spelling,
    // so native percentile (Spark) and quantile_cont (DuckDB) agree
    // bit-for-bit (the a12 precedent); language stats broadcast back
    // onto the map-side scan.
    "x_robust_scale" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).as("n_tokens"))
        val st = d.groupBy(col("lang")).agg(
          expr("percentile(n_tokens, 0.25)").as("q25"),
          expr("percentile(n_tokens, 0.5)").as("med"),
          expr("percentile(n_tokens, 0.75)").as("q75"))
        d.join(broadcast(st), "lang")
          .withColumn("scaled", expr(
            "CASE WHEN q75 - q25 = 0 THEN NULL ELSE (n_tokens - med) / (q75 - q25) END"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("med"), col("q25"), col("q75"), col("scaled"))
          .orderBy(col("doc_id"))
      },
      """WITH d AS (SELECT doc_id, lang,
        |             len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |st AS (SELECT lang,
        |         quantile_cont(n_tokens, 0.25) AS q25,
        |         quantile_cont(n_tokens, 0.5) AS med,
        |         quantile_cont(n_tokens, 0.75) AS q75
        |       FROM d GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_tokens, st.med, st.q25, st.q75,
        |  CASE WHEN st.q75 - st.q25 = 0 THEN NULL
        |       ELSE (d.n_tokens - st.med) / (st.q75 - st.q25) END AS scaled
        |FROM d JOIN st USING (lang) ORDER BY d.doc_id""".stripMargin),

    // ABC / Pareto classification — a29_gini's actionable sibling:
    // parts ranked by revenue with exact-decimal cumulative share,
    // bucketed A (first 80% of revenue), B (to 95%), C (tail). The
    // running sum is ops/Prefix (range-partitioned sort + per-partition
    // BigDecimal fold + broadcast exclusive offsets) — NOT the
    // un-partitioned window the oracle deliberately uses: that spelling
    // funnels the whole frame through one task. Decimal accumulation is
    // associative, so the regrouped fold is bit-identical to the
    // window's sequential one at any parallelism.
    "w9_abc_pareto" -> Q(
      (s, dir) => {
        // the part-grain revenue frame feeds BOTH the prefix sum and
        // the grand total — materialize it once (PlanCache) so the
        // fact-sized aggregation doesn't run per consumer
        val rev = graft.ops.PlanCache.materialized(
          Tables.lineitem(s, dir)
            .groupBy(col("l_partkey"))
            .agg(sum(col("l_extendedprice").cast(Dec) *
              (lit(1) - col("l_discount").cast(Dec))).as("rev")))
        Prefix.rankAndRunningSum(rev,
            Seq(col("rev").desc, col("l_partkey")), "rev", "rk", "cum")
          .drop("rk")
          .crossJoin(broadcast(rev.agg(sum(col("rev")).as("total"))))
          .withColumn("cum_share", expr("cast(cum AS double) / cast(total AS double)"))
          .withColumn("abc_class", expr(
            "CASE WHEN cum_share <= 0.80 THEN 'A' WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END"))
          .select(col("l_partkey"), col("rev").cast("double").as("revenue"),
            col("cum_share"), col("abc_class"))
          .orderBy(col("cum_share"), col("l_partkey"))
      },
      """WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(rev) AS total FROM rev),
        |c AS (SELECT l_partkey, rev,
        |        SUM(rev) OVER (ORDER BY rev DESC, l_partkey
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM rev)
        |SELECT c.l_partkey, CAST(c.rev AS DOUBLE) AS revenue,
        |  CAST(c.cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
        |  CASE WHEN CAST(c.cum AS DOUBLE) / CAST(t.total AS DOUBLE) <= 0.80 THEN 'A'
        |       WHEN CAST(c.cum AS DOUBLE) / CAST(t.total AS DOUBLE) <= 0.95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c CROSS JOIN t
        |ORDER BY cum_share, l_partkey""".stripMargin),

    // Lorenz curve of revenue concentration — a29_gini's graphical
    // sibling and Prefix's second consumer: cumulative revenue share at
    // each part-population decile (ascending revenue, poorest first).
    // The running sum is ops/Prefix (no single-task window); the ten
    // curve points come from a broadcast 10-row decile-mark frame
    // joined on rank, so the part-grain frame is never re-sorted or
    // re-scanned per point.
    "w10_lorenz" -> Q(
      (s, dir) => {
        val rev = graft.ops.PlanCache.materialized(
          Tables.lineitem(s, dir)
            .groupBy(col("l_partkey"))
            .agg(sum(col("l_extendedprice").cast(Dec) *
              (lit(1) - col("l_discount").cast(Dec))).as("rev")))
        val stats = rev.agg(count(lit(1)).as("n"), sum(col("rev")).as("total"))
        val marks = s.range(1, 11).select(col("id").as("i"))
          .crossJoin(broadcast(stats))
          .select(col("i"), expr("(n * i) div 10").as("rk1"), col("total"))
        Prefix.rankAndRunningSum(rev,
            Seq(col("rev"), col("l_partkey")), "rev", "rk", "cum")
          .withColumn("rk1", col("rk") + 1)
          .join(broadcast(marks), "rk1")
          .select((col("i") * 10).cast("int").as("pct_parts"),
            expr("round(cast(cum AS double) / cast(total AS double), 6)")
              .as("cum_rev_share"))
          .orderBy(col("pct_parts"))
      },
      """WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n, SUM(rev) AS total FROM rev),
        |c AS (SELECT rev,
        |        SUM(rev) OVER (ORDER BY rev, l_partkey
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |        ROW_NUMBER() OVER (ORDER BY rev, l_partkey) AS rk1
        |      FROM rev),
        |m AS (SELECT i, (t.n * i) // 10 AS rk1, t.total
        |      FROM range(1, 11) r(i) CROSS JOIN t)
        |SELECT CAST(m.i * 10 AS INT) AS pct_parts,
        |       round(CAST(c.cum AS DOUBLE) / CAST(m.total AS DOUBLE), 6) AS cum_rev_share
        |FROM m JOIN c USING (rk1)
        |ORDER BY pct_parts""".stripMargin),

    // Zipf-law fit of the token frequency distribution — the corpus
    // "law diagnostic" (natural text has slope ≈ −1; heavy synthetic
    // duplication or truncated vocabularies bend it). OLS of ln(freq)
    // on ln(rank) over the vocabulary: per-row ln terms round to 9 dp
    // (the libm-ulp discipline), every cross-row sum quantizes to 2^40
    // fixed point FIRST so the regression moments are order-free
    // integer math (the PSI/x_gram_matrix discipline); the slope and
    // intercept are single fixed expressions over the exact sums. The
    // rank is ops/DenseId (range-partitioned sort + zipWithIndex
    // offsets) — the oracle deliberately keeps the plain ROW_NUMBER
    // spelling the operator exists to avoid.
    "x_zipf_fit" -> Q(
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word")).agg(count(lit(1)).as("wf"))
        DenseId.assign(vocab, Seq(col("wf").desc, col("word")), "i0")
          .withColumn("i", (col("i0") + 1).cast("long"))
          .select(
            expr("round(ln(cast(i AS double)), 9)").as("x"),
            expr("round(ln(cast(wf AS double)), 9)").as("y"))
          .select(
            expr(s"cast(floor(x * $Q40) AS bigint)").as("xq"),
            expr(s"cast(floor(y * $Q40) AS bigint)").as("yq"),
            expr(s"cast(floor(x * y * $Q40) AS bigint)").as("xyq"),
            expr(s"cast(floor(x * x * $Q40) AS bigint)").as("xxq"))
          .agg(count(lit(1)).as("n"), sum(col("xq")).as("sx"),
            sum(col("yq")).as("sy"), sum(col("xyq")).as("sxy"),
            sum(col("xxq")).as("sxx"))
          .withColumn("slope", expr(
            s"""(n * (cast(sxy AS double) / $Q40) -
               |  (cast(sx AS double) / $Q40) * (cast(sy AS double) / $Q40))
               |/ (n * (cast(sxx AS double) / $Q40) -
               |  (cast(sx AS double) / $Q40) * (cast(sx AS double) / $Q40))"""
              .stripMargin))
          .withColumn("intercept", expr(
            s"""(cast(sy AS double) / $Q40) / n -
               |  slope * (cast(sx AS double) / $Q40) / n""".stripMargin))
          .select(col("n").as("n_vocab"), col("slope"), col("intercept"))
      },
      s"""WITH w AS (SELECT word, COUNT(*) AS wf FROM (
         |    SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
         |  WHERE word <> '' GROUP BY 1),
         |r AS (SELECT round(ln(CAST(ROW_NUMBER() OVER (ORDER BY wf DESC, word) AS DOUBLE)), 9) AS x,
         |             round(ln(CAST(wf AS DOUBLE)), 9) AS y
         |      FROM w),
         |q AS (SELECT CAST(FLOOR(x * $Q40) AS BIGINT) AS xq,
         |             CAST(FLOOR(y * $Q40) AS BIGINT) AS yq,
         |             CAST(FLOOR(x * y * $Q40) AS BIGINT) AS xyq,
         |             CAST(FLOOR(x * x * $Q40) AS BIGINT) AS xxq
         |      FROM r),
         |a AS (SELECT COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sx,
         |             CAST(SUM(yq) AS BIGINT) AS sy, CAST(SUM(xyq) AS BIGINT) AS sxy,
         |             CAST(SUM(xxq) AS BIGINT) AS sxx
         |      FROM q),
         |sl AS (SELECT n AS n_vocab,
         |         (n * (CAST(sxy AS DOUBLE) / $Q40) -
         |           (CAST(sx AS DOUBLE) / $Q40) * (CAST(sy AS DOUBLE) / $Q40))
         |         / (n * (CAST(sxx AS DOUBLE) / $Q40) -
         |           (CAST(sx AS DOUBLE) / $Q40) * (CAST(sx AS DOUBLE) / $Q40)) AS slope,
         |         sy, sx, n AS n2
         |       FROM a)
         |SELECT n_vocab, slope,
         |  (CAST(sy AS DOUBLE) / $Q40) / n2 -
         |    slope * (CAST(sx AS DOUBLE) / $Q40) / n2 AS intercept
         |FROM sl""".stripMargin),

    // Gini coefficient of revenue concentration across parts — the
    // inequality/concentration readout (is the corpus dominated by a
    // few heads?). Revenue collapses to part grain FIRST (fact-sized
    // work is one combine-enabled aggregate); the rank is then
    // ops/DenseId over the part-grain frame (range-partitioned sort +
    // zipWithIndex offsets — no single-task window anywhere).
    // Σ(i·revᵢ) and Σrev stay exact decimal; the Gini is one fixed
    // double expression over the two exact sums.
    "a29_gini" -> Q(
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast(Dec) *
            (lit(1) - col("l_discount").cast(Dec))).as("rev"))
        DenseId.assign(rev, Seq(col("rev"), col("l_partkey")), "i0")
          .withColumn("i", (col("i0") + 1).cast("long"))
          .agg(count(lit(1)).as("n"),
            sum(col("rev")).as("total_d"),
            sum(col("rev") * col("i")).as("weighted_d"))
          .select(col("n").as("n_parts"),
            col("total_d").cast("double").as("total_rev"),
            expr("""(2.0 * cast(weighted_d AS double))
                   |  / (n * cast(total_d AS double))
                   |  - (n + 1.0) / n""".stripMargin).as("gini"))
      },
      """WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT rev,
        |        CAST(ROW_NUMBER() OVER (ORDER BY rev, l_partkey) AS BIGINT) AS i
        |      FROM rev)
        |SELECT COUNT(*) AS n_parts,
        |  CAST(SUM(rev) AS DOUBLE) AS total_rev,
        |  (2.0 * CAST(SUM(rev * i) AS DOUBLE))
        |    / (COUNT(*) * CAST(SUM(rev) AS DOUBLE))
        |    - (COUNT(*) + 1.0) / COUNT(*) AS gini
        |FROM r""".stripMargin),

    // Dense contiguous ids for the part "vocabulary", ranked by exact
    // revenue — ops/DenseId: range-partitioned sort + zipWithIndex
    // offsets instead of the single-task global ROW_NUMBER window the
    // oracle (deliberately) uses.
    "x_dense_ids" -> Q(
      (s, dir) =>
        DenseId.assign(
          Tables.lineitem(s, dir)
            .groupBy(col("l_partkey"))
            .agg(sum(col("l_extendedprice").cast(Dec) *
              (lit(1) - col("l_discount").cast(Dec))).cast("double").as("revenue")),
          Seq(col("revenue").desc, col("l_partkey")), "dense_id")
          .orderBy(col("dense_id")),
      """WITH r AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, revenue,
        |  ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey) - 1 AS dense_id
        |FROM r ORDER BY dense_id""".stripMargin)
  )
}
