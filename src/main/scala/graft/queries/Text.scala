package graft.queries

import graft.Tables
import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text operators over the `documents` table (SURVEY.md
  * §7.5): analysis (stats/quality, language-ID, fingerprints) and
  * deduplication (exact, MinHash+LSH, SimHash). Everything is built from
  * codegen'd built-ins + higher-order array functions — no UDFs — and
  * every hash is an engine-portable construction (md5, polynomial
  * rolling hash in exact int64 arithmetic) so each query has a full
  * DuckDB value oracle.
  *
  * Scale design: per-document work is a pure map stage (no shuffle);
  * dedup pair generation never goes quadratic — candidates come from
  * hash-bucket self-joins (LSH bands / simhash bands), so the shuffle
  * key is the band key and skew is bounded by bucket size, not corpus
  * size. At 100 TB the same plans hold with the band join as the only
  * exchange.
  */
object Text {

  /** The corpus under dedup test: documents + deterministically injected
    * exact duplicates (every 50th) and near duplicates (every 25th, a
    * short tail appended). Injected ids live at doc_id + k·(max+1) — an
    * offset derived from the data, so the injected keyspace stays
    * disjoint from real ids (and ordered above them, preserving the
    * a.doc_id < b.doc_id pair convention) at every scale factor. The
    * offset is one scalar max() fetched at plan build — a single-column
    * aggregate answered from parquet footer statistics. */
  /** Per-directory cache of the injected-id offset: the corpus dirs are
    * read-only (TESTDATA.md contract), so max(doc_id) is a constant per
    * path — a statistics cache, like any engine's catalog stats.
    * Without it every dedup query build re-runs the (footer-stats)
    * max() job. The cache deliberately has NO invalidation: it is only
    * sound for immutable corpus directories — a process that rewrites a
    * corpus in place and re-queries the same path would read a stale
    * offset and must not use this entry point. */
  private val offCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val off: Long = offCache.computeIfAbsent(dir,
      _ => d.agg(max("doc_id")).head().getLong(0) + 1L)
    d.unionByName(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + off).as("doc_id"), col("text")))
      .unionByName(
        d.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 2L * off).as("doc_id"),
            concat(col("text"), lit(" zz near dup marker zz")).as("text")))
  }

  private[queries] val CorpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), text
      |  FROM documents WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT doc_id + 2 * (SELECT MAX(doc_id) + 1 FROM documents),
      |         text || ' zz near dup marker zz'
      |  FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  /** 3-token shingles of a single-space-tokenized text, distinct.
    * Spark-side SQL fragment; `t` must be the token array column. */
  private val ShingleExpr =
    "array_distinct(transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3))))"

  private val ShingleDuck =
    "list_distinct(list_transform(range(1, len(t) - 1), i -> array_to_string(list_slice(t, i, i + 2), ' ')))"

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic (alphabetical tie-break, all-zero → 'und') — shared with
    * Corpus.x_retrieval_eval as its fixed query set. */
  private[queries] val Markers = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "los", "y", "las", "una", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"))

  private def inList(ws: Seq[String]) = ws.map("'" + _ + "'").mkString(", ")

  /** x_nb_classify's fixed-order per-document fold of the per-token
    * class log-probs — the lmScores double-sum discipline: doubles only
    * ever add left-to-right along the token sequence. */
  private def sumInOrder(l: String): String =
    s"""aggregate(transform(sort_array(collect_list(struct(pos, lp_$l))),
       |  x -> x.lp_$l), 0D, (a, x) -> a + x)""".stripMargin

  /** Quality-feature fragments shared by x_text_stats and x_curation —
    * one definition per engine so the two queries and their oracles
    * cannot drift. `t` is the token-array column; the score references
    * the stop_ratio / type_token_ratio / n_tokens aliases established
    * by the surrounding SELECT (lateral alias reuse, valid in both
    * engines). */
  private lazy val EnStops = inList(Markers.toMap.apply("en"))
  private lazy val StopRatioSpark = s"size(filter(t, w -> w IN ($EnStops))) / size(t)"
  private val TypeTokenSpark = "size(array_distinct(t)) / size(t)"
  private lazy val StopRatioDuck = s"len(list_filter(t, w -> w IN ($EnStops))) / len(t)"
  private val TypeTokenDuck = "len(list_distinct(t)) / len(t)"
  private val QualityScore =
    "round(stop_ratio * 0.3 + type_token_ratio * 0.4 + least(n_tokens / 100.0, 1.0) * 0.3, 6)"

  /** Verified MinHash+LSH near-dup pairs (a_id < b_id, Jaccard ≥ 0.5) —
    * shared by the pair query and the cluster query. */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOver(corpus(s, dir))

  /** Per-band-bucket candidate cap (session-configurable). A real web
    * corpus has degenerate buckets — millions of boilerplate-identical
    * pages landing in one band bucket — and within-bucket pair
    * generation is quadratic in bucket size. Exact duplicates are
    * collapsed BEFORE banding (see below), which removes the identical
    * case entirely; the cap bounds the residual near-identical case.
    * Buckets at the cap drop candidates (approximate recall, like any
    * production LSH dedup) — [[minhashBandDrops]] reports exactly how
    * many, so the loss is measured, never silent.
    *
    * NOTE: oracle-gated queries interpolate [[BandCapDefault]] into
    * their DuckDB SQL at object init, so they assume the DEFAULT cap —
    * setting spark.graft.dedup.bandCap desyncs engine and oracle (by
    * design: the conf is a production knob, the oracles pin the
    * default). */
  private[graft] val BandCapDefault = 4096
  private[graft] def bandCap(s: SparkSession): Int =
    s.conf.getOption("spark.graft.dedup.bandCap").map(_.toInt).getOrElse(BandCapDefault)

  /** The same pipeline over an explicit (doc_id, text) corpus — shared
    * with the ScaleCheck probe so scale measurements can never drift
    * from the production query's band construction.
    *
    * Scale hardening (the three degenerate-bucket defenses, in order):
    *  1. EXACT-COLLAPSE: identical texts form one class keyed by
    *     md5(text); only the class representative (min doc_id) enters
    *     band construction, so a million identical documents cost one
    *     band row instead of a quadratic bucket. Doc-level pairs are
    *     re-expanded from the class map afterwards (intra-class pairs
    *     have Jaccard exactly 1.0 — identical shingle sets — and
    *     cross-class pairs inherit their representatives' Jaccard,
    *     making the expansion value-identical to the naive all-docs
    *     self-join).
    *  2. COMPACT SHUFFLE: the band self-join carries (rep_id, bkey)
    *     only — the raw shingle arrays stay OUT of the band exchange
    *     and are joined back by rep_id once per side for verification.
    *  3. PER-BAND CAP: buckets larger than [[bandCap]] keep their
    *     first `cap` members (deterministic rep_id order, so reruns
    *     and the oracle agree below the cap); the dropped-candidate
    *     count is queryable via [[minhashBandDrops]]. */
  private[graft] def minhashPairsOver(c: DataFrame): DataFrame =
    expandPairs(c, sigFrame(c).select("rep_id"), minhashRepPairsOver(c), lit(1.0))

  /** Representative-level signature frame: one row per exact-text
    * class, with shingle set and minhash — the input to band
    * construction and verification. Materialized via [[graft.ops.PlanCache]]:
    * this subtree appears up to 5× per query DAG (band self-join sides,
    * two verification join-backs, the reps filter) with different
    * column pruning per use, so Catalyst cannot merge the copies — the
    * collapse + shingling + minhash would otherwise run once per
    * reference. */
  private def sigFrame(c: DataFrame): DataFrame =
    graft.ops.PlanCache.materialized(
      exactClasses(c)
        .withColumn("t", split(col("text"), " "))
        .withColumn("sh", TextHash.shingleSet(col("t"), 3))
        .withColumn("mh", TextHash.minhash(col("sh"), 8))
        .filter(col("mh").isNotNull)
        // a persisted frame stores ALL its columns — prune text/tokens
        // (the wide ones, no downstream consumer) BEFORE materializing,
        // not at the InMemoryTableScans after
        .select("rep_id", "sh", "mh"))

  /** Verified near-dup pairs BETWEEN exact-text classes (ra < rb,
    * Jaccard ≥ 0.5) — the bounded-size graph that cluster assembly
    * consumes directly (see [[minhashClustersOver]]): its node count is
    * the number of DISTINCT texts, immune to the
    * million-identical-documents corpus. */
  private[graft] def minhashRepPairsOver(c: DataFrame): DataFrame = {
    val cap = bandCap(c.sparkSession)
    val sigs = sigFrame(c)
    val bands = bandRows(sigs, cap)
    bands.as("a")
      .join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.rep_id") < col("b.rep_id"))
      .select(col("a.rep_id").as("ra"), col("b.rep_id").as("rb"))
      .distinct()
      .join(sigs.select(col("rep_id").as("ra"), col("sh").as("sa")), "ra")
      .join(sigs.select(col("rep_id").as("rb"), col("sh").as("sb")), "rb")
      .withColumn("jaccard", TextHash.jaccardSim(col("sa"), col("sb")))
      .filter(col("jaccard") >= 0.5)
      .select("ra", "rb", "jaccard")
  }

  /** Duplicate clusters assembled WITHOUT ever materializing the
    * doc-level pair set: connected components run on the
    * class-representative graph (distinct-text-sized), then the class
    * map carries each member to its component. The cluster id — min doc_id
    * reachable in the doc-level graph — equals the rep-level component
    * id exactly, because each representative IS its class's minimum
    * doc_id and Components labels by minimum. On a corpus of a million
    * identical documents the doc-level edge set is ~5·10¹¹ pairs; this
    * path touches one class row and a million membership rows. */
  private[graft] def minhashClustersOver(c: DataFrame): DataFrame = {
    val repComp = graft.ops.Components.connectedComponents(
      minhashRepPairsOver(c)
        .select(col("ra").as("src"), col("rb").as("dst")))
    val members = classMembers(c)
    // multi-member classes that banded but have no cross-class pair
    // still form a cluster of their own (their docs pair intra-class)
    val isolatedMulti = members.groupBy("rep_id").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .join(sigFrame(c).select("rep_id"), "rep_id")
      .join(repComp.select(col("node").as("rep_id")), Seq("rep_id"), "left_anti")
      .select(col("rep_id").as("node"), col("rep_id").as("component"))
    members
      .join(repComp.unionByName(isolatedMulti)
        .withColumnRenamed("node", "rep_id"), "rep_id")
      .select(col("doc_id"), col("component").as("cluster_id"))
  }

  /** Exact-duplicate classes of a (doc_id, text) corpus: one row per
    * distinct text, keyed by its minimum doc_id. `first(text)` is
    * deterministic here — every row in a class carries the identical
    * text. */
  private def exactClasses(c: DataFrame): DataFrame =
    c.withColumn("ek", md5(col("text")))
      .groupBy("ek")
      .agg(min("doc_id").as("rep_id"), first("text").as("text"))
      .drop("ek")

  /** (doc_id → rep_id) class membership map. Materialized
    * ([[graft.ops.PlanCache]]): referenced 4× by [[expandPairs]] and
    * again by cluster assembly — without it the md5 + window pass over
    * the full corpus repeats per reference. */
  private def classMembers(c: DataFrame): DataFrame =
    graft.ops.PlanCache.materialized(
      c.withColumn("ek", md5(col("text")))
        .withColumn("rep_id", min("doc_id").over(Window.partitionBy("ek")))
        .select("doc_id", "rep_id"))

  /** Band rows (rep_id, bkey) of the signature frame, capped per
    * bucket. The row_number runs on the band-key exchange the self-join
    * needs anyway — no extra shuffle. */
  private def bandRows(sigs: DataFrame, cap: Int): DataFrame =
    sigs
      .withColumn("bkey", explode(expr(
        "transform(sequence(0, 3), b -> concat(cast(b AS string), ':', cast(element_at(mh, 2*b+1) AS string), ':', cast(element_at(mh, 2*b+2) AS string)))")))
      .select("rep_id", "bkey")
      .withColumn("_rnk", row_number().over(
        Window.partitionBy("bkey").orderBy("rep_id")))
      .filter(col("_rnk") <= cap)
      .drop("_rnk")

  /** Expand representative-level pairs back to document-level pairs:
    * cross-class pairs inherit the representatives' similarity;
    * intra-class pairs (only classes that actually banded — `reps`)
    * get `selfSim` (exactly 1.0 for identical shingle sets). */
  private def expandPairs(
      c: DataFrame, reps: DataFrame, repPairs: DataFrame,
      selfSim: org.apache.spark.sql.Column): DataFrame = {
    val members = classMembers(c)
    val cross = repPairs
      .join(members.select(col("rep_id").as("ra"), col("doc_id").as("da")), "ra")
      .join(members.select(col("rep_id").as("rb"), col("doc_id").as("db")), "rb")
      .select(least(col("da"), col("db")).as("a_id"),
        greatest(col("da"), col("db")).as("b_id"), col("jaccard"))
    val intra = members.join(reps, "rep_id").as("a")
      .join(members.as("b"),
        col("a.rep_id") === col("b.rep_id") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        selfSim.as("jaccard"))
    cross.unionByName(intra)
  }

  /** Dropped-candidate report for [[minhashPairsOver]]'s per-band cap:
    * one row per overflowing bucket is aggregated to (overflow_buckets,
    * dropped_members). Empty on any corpus whose buckets fit the cap —
    * i.e. capping provably changed nothing. */
  private[graft] def minhashBandDrops(c: DataFrame): DataFrame = {
    val cap = bandCap(c.sparkSession)
    sigFrame(c)
      .withColumn("bkey", explode(expr(
        "transform(sequence(0, 3), b -> concat(cast(b AS string), ':', cast(element_at(mh, 2*b+1) AS string), ':', cast(element_at(mh, 2*b+2) AS string)))")))
      .groupBy("bkey").count()
      .filter(col("count") > cap)
      .agg(count(lit(1)).as("overflow_buckets"),
        sum(col("count") - cap).as("dropped_members"))
      .filter(col("overflow_buckets") > 0)
  }

  /** DuckDB CTE chain producing the same verified pairs as
    * [[minhashPairs]] (names: pairsj(a_id, b_id)). Kept in lockstep
    * with the Spark helper. */
  private[queries] def minhashPairsCte: String =
    s"""$CorpusCte,
       |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       |sh AS (SELECT doc_id, $ShingleDuck AS sh FROM d),
       |mh AS (SELECT doc_id, sh,
       |         list_transform(range(0, 8), k ->
       |           list_min(list_transform(sh, s ->
       |             ((2*k+3) * (list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)) + (5*k+7)) % 1000000007))) AS mh
       |       FROM sh),
       |bands AS (SELECT doc_id,
       |            unnest(list_transform(range(0, 4), b ->
       |              CAST(b AS VARCHAR) || ':' || CAST(mh[2*b+1] AS VARCHAR) || ':' || CAST(mh[2*b+2] AS VARCHAR))) AS bkey
       |          FROM mh),
       |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |          FROM bands a JOIN bands b
       |            ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |pairsj AS (SELECT p.a_id, p.b_id,
       |             len(list_intersect(sa.sh, sb.sh)) / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
       |           FROM pairs p
       |           JOIN sh sa ON sa.doc_id = p.a_id
       |           JOIN sh sb ON sb.doc_id = p.b_id
       |           WHERE len(list_intersect(sa.sh, sb.sh)) / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5)""".stripMargin

  /** SimHash over token polynomial hashes, exact int64 arithmetic.
    * polyhash_m(w) = fold (acc*m + codepoint) mod 1e9+7 over characters;
    * bit j of a 30-bit simhash half is the sign of Σ_tokens (±1 by bit j
    * of the token hash). Two independent multipliers (31, 131) give two
    * 30-bit halves → a 60-bit signature, so the Hamming threshold can be
    * tight (≤3, like production 64-bit simhash dedup) instead of the
    * loose ≤8 a single 30-bit hash would force. The Spark side evaluates
    * this via the native graft.functions.TextHash expressions; the DuckDB
    * oracle keeps the equivalent higher-order-function formulation below.
    */
  /** The x_text_clean normalization chain (lower → URL-strip →
    * punct-strip → space-collapse → trim) — shared with the idempotence
    * law in AnalyticsInvariantSpec so the test exercises the PRODUCTION
    * chain, not a frozen copy. */
  private[graft] def cleanedText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      lower(c),
      "https?://[^ ]+", " "),
      "[^a-z0-9 ]", " "),
      " +", " "))

  private def polyHashDuck(m: Int) =
    s"list_transform(t, w -> list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(w) + 1), i -> CAST(ascii(substr(w, i, 1)) AS BIGINT)), (acc, c) -> (acc * $m + c) % 1000000007))"

  private val PolyHashDuck = polyHashDuck(31)

  private def simhashDuck(hsCol: String) =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, 30), j -> CASE WHEN list_reduce([CAST(0 AS BIGINT)] || list_transform($hsCol, h -> CASE WHEN ((h >> j) & 1) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END), (a, x) -> a + x) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END), (a, x) -> a + x)"

  val all: Map[String, Q] = Map(

    // ---- analysis ---------------------------------------------------

    // Quality scoring + token counting: length/stopword/type-token
    // ratios and a BPE-ish regex subtoken count, one codegen'd map pass.
    "x_text_stats" -> Q(
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("t", split(col("text"), " "))
          .selectExpr(
            "doc_id", "lang", "source",
            "length(text) AS n_chars_calc",
            "size(t) AS n_tokens",
            "size(array_distinct(t)) AS n_distinct_tokens",
            "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS n_subtokens",
            s"$StopRatioSpark AS stop_ratio",
            s"$TypeTokenSpark AS type_token_ratio",
            "(length(text) - (size(t) - 1)) / size(t) AS avg_token_len")
          .withColumn("quality_score", expr(QualityScore)),
      s"""WITH d AS (SELECT *, string_split(text, ' ') AS t FROM documents)
         |SELECT doc_id, lang, source,
         |  CAST(length(text) AS INT) AS n_chars_calc,
         |  CAST(len(t) AS INT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS INT) AS n_distinct_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS n_subtokens,
         |  $StopRatioDuck AS stop_ratio,
         |  $TypeTokenDuck AS type_token_ratio,
         |  (length(text) - (len(t) - 1)) / len(t) AS avg_token_len,
         |  $QualityScore AS quality_score
         |FROM d""".stripMargin),

    // Language-ID heuristic: per-language marker-stopword scores,
    // argmax with alphabetical tie-break, rolled into a (declared ×
    // predicted) confusion matrix.
    "x_lang_id" -> Q(
      (s, dir) => {
        val scored = Markers.foldLeft(
          Tables.documents(s, dir).withColumn("t", split(col("text"), " "))) {
          case (df, (l, ws)) =>
            df.withColumn(s"s_$l",
              expr(s"size(filter(t, w -> w IN (${inList(ws)})))"))
        }
        scored
          .withColumn("g", greatest(Markers.map(m => col(s"s_${m._1}")): _*))
          .withColumn("predicted_lang",
            expr("""CASE WHEN g = 0 THEN 'und'
                   |     WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en'
                   |     WHEN s_es = g THEN 'es' ELSE 'fr' END""".stripMargin))
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted_lang"))
      }, {
        val scores = Markers.map { case (l, ws) =>
          s"len(list_filter(t, w -> w IN (${inList(ws)}))) AS s_$l"
        }.mkString(",\n  ")
        s"""WITH d AS (SELECT *, string_split(text, ' ') AS t FROM documents),
           |sc AS (SELECT lang, $scores FROM d),
           |p AS (SELECT lang,
           |        CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
           |             WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
           |             WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
           |             WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
           |             ELSE 'fr' END AS predicted_lang
           |      FROM sc)
           |SELECT lang, predicted_lang, COUNT(*) AS n
           |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // Model-BASED classification: a multinomial Naive Bayes language
    // classifier trained and scored in one plan — the distributed form
    // of the fastText-style model filters (CCNet, Wenzek et al.
    // LREC'20) a curation pipeline runs after the x_lang_id-style
    // heuristics. Training IS aggregation (per-(term, class) counts +
    // one corpus-statistics row), which is why NB is the
    // lake-scale-native classifier: no gradient iterations, one
    // vocabulary-keyed exchange. Scoring joins the held-out fifth's
    // tokens (doc_id % 5 = 0) against the vocabulary-sized,
    // broadcast-able model, then per-document log-likelihoods fold in
    // fixed token order (the lmScores discipline: doubles only ever
    // sum left-to-right in a deterministic sequence, one final round),
    // argmax with the CASE tie-break both engines share. Laplace
    // add-one smoothing over the train vocabulary V:
    // p(w|c) = (count(w,c) + 1) / (tokens(c) + V).
    "x_nb_classify" -> Q(
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
        val train = d.filter(col("doc_id") % 5 =!= 0)
        val tok = train.select(col("lang"), explode(col("t")).as("w"))
        val perLang = (p: String) =>
          langs.map(l => sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"${p}_$l"))
        val model = tok.groupBy(col("w")).agg(perLang("c").head, perLang("c").tail: _*)
        val stats = tok.agg(perLang("t").head,
          (perLang("t").tail :+ countDistinct(col("w")).as("v")): _*)
        val priors = train.agg(perLang("p").head,
          (perLang("p").tail :+ count(lit(1)).as("n_train")): _*)
        val tokTest = d.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), col("lang"), posexplode(col("t")))
          .withColumnRenamed("col", "w")
        val lp = langs.foldLeft(
          tokTest.join(broadcast(model), Seq("w"), "left")
            .crossJoin(broadcast(stats))) { (df, l) =>
          df.withColumn(s"lp_$l",
            expr(s"ln((coalesce(c_$l, 0L) + 1.0) / (t_$l + v))"))
        }
        val scored = lp.groupBy(col("doc_id"), col("lang"))
          .agg(
            expr(sumInOrder("de")).as("sum_de"),
            langs.tail.map(l => expr(sumInOrder(l)).as(s"sum_$l")): _*)
          .crossJoin(broadcast(priors))
        val s5 = langs.foldLeft(scored) { (df, l) =>
          df.withColumn(s"s_$l",
            expr(s"round(ln(p_$l * 1.0 / n_train) + sum_$l, 6)"))
        }
        s5.withColumn("g", greatest(langs.map(l => col(s"s_$l")): _*))
          .withColumn("predicted_lang",
            expr("""CASE WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en'
                   |     WHEN s_es = g THEN 'es' WHEN s_fr = g THEN 'fr'
                   |     ELSE 'zh' END""".stripMargin))
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted_lang"))
      },
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |train AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |tok AS (SELECT lang, unnest(t) AS w FROM train),
        |cw AS (SELECT w,
        |         COUNT(*) FILTER (lang = 'de') AS c_de,
        |         COUNT(*) FILTER (lang = 'en') AS c_en,
        |         COUNT(*) FILTER (lang = 'es') AS c_es,
        |         COUNT(*) FILTER (lang = 'fr') AS c_fr,
        |         COUNT(*) FILTER (lang = 'zh') AS c_zh
        |       FROM tok GROUP BY w),
        |st AS (SELECT COUNT(*) FILTER (lang = 'de') AS t_de,
        |              COUNT(*) FILTER (lang = 'en') AS t_en,
        |              COUNT(*) FILTER (lang = 'es') AS t_es,
        |              COUNT(*) FILTER (lang = 'fr') AS t_fr,
        |              COUNT(*) FILTER (lang = 'zh') AS t_zh,
        |              COUNT(DISTINCT w) AS v FROM tok),
        |pr AS (SELECT COUNT(*) FILTER (lang = 'de') AS p_de,
        |              COUNT(*) FILTER (lang = 'en') AS p_en,
        |              COUNT(*) FILTER (lang = 'es') AS p_es,
        |              COUNT(*) FILTER (lang = 'fr') AS p_fr,
        |              COUNT(*) FILTER (lang = 'zh') AS p_zh,
        |              COUNT(*) AS n_train FROM train),
        |tt AS (SELECT doc_id, lang, CAST(i AS INT) AS pos, t[i] AS w
        |       FROM (SELECT doc_id, lang, t, unnest(range(1, len(t) + 1)) AS i
        |             FROM d WHERE doc_id % 5 = 0)),
        |lps AS (SELECT tt.doc_id, tt.lang, tt.pos,
        |          ln((coalesce(c_de, 0) + 1.0) / (t_de + v)) AS lp_de,
        |          ln((coalesce(c_en, 0) + 1.0) / (t_en + v)) AS lp_en,
        |          ln((coalesce(c_es, 0) + 1.0) / (t_es + v)) AS lp_es,
        |          ln((coalesce(c_fr, 0) + 1.0) / (t_fr + v)) AS lp_fr,
        |          ln((coalesce(c_zh, 0) + 1.0) / (t_zh + v)) AS lp_zh
        |        FROM tt LEFT JOIN cw USING (w), st),
        |sc AS (SELECT doc_id, lang,
        |         round(ln(p_de * 1.0 / n_train) + list_reduce([CAST(0 AS DOUBLE)] || list(lp_de ORDER BY pos), (a, x) -> a + x), 6) AS s_de,
        |         round(ln(p_en * 1.0 / n_train) + list_reduce([CAST(0 AS DOUBLE)] || list(lp_en ORDER BY pos), (a, x) -> a + x), 6) AS s_en,
        |         round(ln(p_es * 1.0 / n_train) + list_reduce([CAST(0 AS DOUBLE)] || list(lp_es ORDER BY pos), (a, x) -> a + x), 6) AS s_es,
        |         round(ln(p_fr * 1.0 / n_train) + list_reduce([CAST(0 AS DOUBLE)] || list(lp_fr ORDER BY pos), (a, x) -> a + x), 6) AS s_fr,
        |         round(ln(p_zh * 1.0 / n_train) + list_reduce([CAST(0 AS DOUBLE)] || list(lp_zh ORDER BY pos), (a, x) -> a + x), 6) AS s_zh
        |       FROM lps, pr
        |       GROUP BY doc_id, lang, p_de, p_en, p_es, p_fr, p_zh, n_train),
        |p AS (SELECT lang,
        |        CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |             WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |             WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |             WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |             ELSE 'zh' END AS predicted_lang
        |      FROM sc)
        |SELECT lang, predicted_lang, COUNT(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Document fingerprinting: whole-text md5, minimum shingle hash
    // (1-permutation MinHash), and a token-level polynomial rolling hash
    // — three independent, order-sensitive content signatures.
    "x_fingerprint" -> Q(
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("t", split(col("text"), " "))
          .withColumn("sh", TextHash.shingleSet(col("t"), 3))
          .withColumn("hs", TextHash.polyHashes(col("t"), 31))
          .selectExpr(
            "doc_id",
            "md5(lower(text)) AS fp_md5",
            "array_min(transform(sh, x -> md5(x))) AS fp_shingle_min",
            "aggregate(hs, 0L, (acc, h) -> (acc * 131 + h) % 1000000007) AS fp_rolling"),
      s"""WITH d AS (SELECT *, string_split(text, ' ') AS t FROM documents),
         |e AS (SELECT doc_id, text, $ShingleDuck AS sh, $PolyHashDuck AS hs FROM d)
         |SELECT doc_id,
         |  md5(lower(text)) AS fp_md5,
         |  list_min(list_transform(sh, x -> md5(x))) AS fp_shingle_min,
         |  list_reduce([CAST(0 AS BIGINT)] || hs, (acc, h) -> (acc * 131 + h) % 1000000007) AS fp_rolling
         |FROM e""".stripMargin),

    // Inverted-index construction — the posting-list build every
    // retrieval/BM25 pipeline starts from: tokenize → explode → group
    // by term. Explode happens map-side and partial aggregation runs
    // before every exchange; the exact COUNT(DISTINCT doc) adds the
    // standard second round (dedup on (term, doc), then term-keyed
    // final), both key-hashed — corpus-sized input, vocabulary-sized
    // output, no row ever shuffled twice at the same grain. Postings
    // are summarized per term as document frequency, total term
    // frequency, and the id span.
    "x_inverted_index" -> Q(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy(col("term"))
          .agg(
            countDistinct(col("doc_id")).as("df"),
            count(lit(1)).as("tf_total"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .filter(col("df") >= 5)
          .orderBy(col("df").desc, col("term")),
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf_total,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM t GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 5
        |ORDER BY df DESC, term""".stripMargin),

    // Per-document top-k TF-IDF terms — the keyword/feature-extraction
    // pass that turns the inverted index's corpus statistics into
    // per-document representations (BM25's sibling: x_bm25 scores docs
    // against ONE query; this extracts each doc's most distinctive
    // terms). Plan: one explode → (doc, term) tf aggregate, materialized
    // via [[graft.ops.PlanCache]] — its subtree feeds three consumers
    // (the scored rows, the term-keyed df aggregate, the one-row n_docs
    // probe) whose differing column pruning defeats ReuseExchange, so
    // without the cache the corpus would be scanned+exploded three
    // times (verified in the formatted plan). df is vocabulary-sized →
    // broadcast back onto the doc-term rows; n_docs is a one-row
    // broadcast. Top-3 per doc is a row_number ≤ k filter — Spark plans
    // WindowGroupLimit, so each doc keeps a 3-row heap instead of
    // sorting its full term list. ln() drifts a ulp between libms, so
    // the score is round(…, 6) (the x_bm25 discipline) and ranking uses
    // the ROUNDED score with a term tie-break — rank and value both
    // engine-portable.
    "x_tfidf" -> Q(
      (s, dir) => {
        val tf = graft.ops.PlanCache.materialized(
          Tables.documents(s, dir)
            .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
            .groupBy(col("doc_id"), col("term"))
            .agg(count(lit(1)).as("tf")))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        // every doc yields ≥1 token (split('') = ['']), so the distinct
        // doc count of the pair frame IS the corpus document count
        val nDocs = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(broadcast(df), Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
            col("df"), col("score"))
          .orderBy(col("doc_id"), col("rnk"))
      },
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, rnk, term, tf, df, score
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin),

    // Tokenizer vocabulary coverage / OOV-rate profiling — given a
    // corpus-derived vocabulary (top-64 tokens by total frequency,
    // frequency-then-token ordered so the cut is deterministic), the
    // fraction of each document's token INSTANCES outside it. The
    // out-of-vocabulary rate is the first statistic a tokenizer/vocab
    // decision consults, and the shape generalizes to any fixed vocab
    // (BPE merges, SentencePiece exports). Plan: vocabulary = term-keyed
    // count agg → top-64 via TakeOrderedAndProject (driver-bounded heap,
    // never a full sort) → collapsed to ONE 64-element array row that
    // broadcasts onto the documents scan, where a higher-order filter
    // counts each row's misses in place — the probe pass is a
    // zero-shuffle map stage (no explode, no doc-keyed exchange; the
    // exploded-join spelling would shuffle every token instance). The
    // oracle deliberately keeps that heavier unnest+join formulation.
    // At 100 TB the vocab stays 64 rows whatever the corpus.
    "x_oov_rate" -> Q(
      (s, dir) => {
        val vocabArr = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term")).limit(64)
          .agg(collect_list(col("term")).as("v"))
        Tables.documents(s, dir)
          .crossJoin(broadcast(vocabArr))
          .withColumn("t", split(col("text"), " "))
          .select(col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            expr("size(filter(t, x -> NOT array_contains(v, x)))")
              .cast("long").as("n_oov"))
          .withColumn("oov_rate",
            col("n_oov").cast("double") / col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |vocab AS (
        |  SELECT term FROM (
        |    SELECT term, COUNT(*) AS n FROM tok GROUP BY term
        |    ORDER BY n DESC, term LIMIT 64)),
        |j AS (SELECT t.doc_id, v.term IS NOT NULL AS in_vocab
        |      FROM tok t LEFT JOIN vocab v ON t.term = v.term)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS n_oov,
        |  CAST(COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS DOUBLE) / COUNT(*) AS oov_rate
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // One BPE training iteration's candidate scoring — the
    // tokenizer-training primitive: count every adjacent symbol pair
    // (initial character vocabulary, so a pair is a 2-char substring)
    // across the corpus and emit the top merge candidates. The classic
    // BPE trick IS the scale design: the corpus first collapses to its
    // word-FREQUENCY table (the only corpus-sized aggregate, map-side
    // partials on the word key), and pair extraction + weighted
    // counting run over the VOCABULARY — at 100 TB the pair stage's
    // input is |distinct words|, not |tokens|. Pair occurrences within
    // a word count once per position (standard BPE), weighted by the
    // word's corpus frequency; top-20 by (weight, pair) is a driver
    // heap. All counts integer-exact.
    "x_bpe_step" -> Q(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        words
          .filter(length(col("w")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .as("pair"))
          .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(20)
      },
      """WITH words AS (
        |  SELECT w, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |                               i -> substr(w, i, 2))) AS pair,
        |         freq
        |  FROM words WHERE length(w) >= 2)
        |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin),

    // Fuzzy record linkage — the edit-distance flavor of near-matching
    // (titles, names, URLs), complementary to the set-similarity dedup
    // family below: candidates block on the first token (the shuffle
    // key), then exact Levenshtein over a fixed-length prefix
    // verifies. Unlike the hash-diverse LSH band keys, a natural-key
    // block is quadratic IN THE BLOCK (B²/2 candidates for a B-doc
    // block) and a stopword-led corpus skews one block hot — this
    // corpus's first tokens are near-unique, and a production linkage
    // run picks a higher-cardinality compound key (token + length
    // band, or a phonetic code) for exactly that reason. Both engines
    // compute standard single-character-edit distance, so the integer
    // scores hash-match.
    "x_fuzzy_match" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"),
            substring(col("text"), 1, 20).as("pfx"),
            expr("split_part(text, ' ', 1)").as("blk"))
        d.as("a")
          .join(d.as("b"),
            col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            levenshtein(col("a.pfx"), col("b.pfx")).as("edit_dist"))
          .filter(col("edit_dist") <= 5)
          .orderBy("a_id", "b_id")
      },
      """WITH d AS (SELECT doc_id, substr(text, 1, 20) AS pfx,
        |                  split_part(text, ' ', 1) AS blk
        |           FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(levenshtein(a.pfx, b.pfx) AS INT) AS edit_dist
        |FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pfx, b.pfx) <= 5
        |ORDER BY a_id, b_id""".stripMargin),

    // ---- deduplication ---------------------------------------------

    // Exact dedup: hash-groupBy on normalized text, canonical = min id.
    "x_dedup_exact" -> Q(
      (s, dir) =>
        corpus(s, dir)
          .groupBy(md5(lower(col("text"))).as("content_hash"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .filter(col("n_copies") > 1)
          .orderBy(col("canonical_id")),
      s"""WITH $CorpusCte
         |SELECT md5(lower(text)) AS content_hash,
         |       MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
         |ORDER BY canonical_id""".stripMargin),

    // MinHash + LSH near-dedup: 8 universal-hash minhashes over 3-gram
    // shingles (one polyhash pass per shingle + integer mixes — see
    // TextHash.minHashes), 4 bands × 2 rows, band-bucket self-join for
    // candidates, exact Jaccard verification ≥ 0.5. The only shuffle is
    // on the band key — no quadratic pair generation.
    "x_dedup_minhash_lsh" -> Q(
      (s, dir) => minhashPairs(s, dir).orderBy("a_id", "b_id"),
      s"""WITH $minhashPairsCte
         |SELECT a_id, b_id, jaccard FROM pairsj
         |ORDER BY a_id, b_id""".stripMargin),

    // Duplicate-GROUP assembly: the verified near-dup pairs are edges of
    // an undirected graph; connected components (ops/Components,
    // iterative min-label propagation) turn them into duplicate
    // clusters — (doc_id, cluster_id = min reachable doc_id), the form a
    // curation pipeline consumes (keep min id, drop the rest). Runs on
    // the CLASS-REPRESENTATIVE graph (minhashClustersOver): the
    // doc-level pair set is never materialized, so a corpus dominated
    // by identical documents costs membership rows, not pair rows.
    // Oracle: recursive-CTE transitive closure over the doc-level pairs
    // — value-identical by the rep-is-minimum argument in the Scaladoc.
    "x_dedup_clusters" -> Q(
      (s, dir) =>
        minhashClustersOver(corpus(s, dir))
          .orderBy("doc_id"),
      s"""WITH RECURSIVE $minhashPairsCte,
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairsj
         |          UNION SELECT b_id, a_id FROM pairsj),
         |reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
         |)
         |SELECT node AS doc_id, MIN(r) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),

    // Duplicate-cluster size histogram — the dedup-yield readout a
    // corpus report leads with: how many near-dup clusters exist at
    // each size, how many documents they absorb, and what canonical-
    // keep dedup would save (size − 1 per cluster). Rides the exact
    // cluster assembly (minhashClustersOver — banded pairs on class
    // representatives + min-label components); the rollup is two
    // cluster-grain aggregates, nothing document-sized shuffles twice.
    "x_dedup_cluster_stats" -> Q(
      (s, dir) =>
        minhashClustersOver(corpus(s, dir))
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("sz").as("cluster_size"), col("n_clusters"),
            (col("n_clusters") * col("sz")).cast("long").as("n_docs"),
            (col("n_clusters") * (col("sz") - 1)).cast("long").as("n_removable"))
          .orderBy(col("cluster_size")),
      s"""WITH RECURSIVE $minhashPairsCte,
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairsj
         |          UNION SELECT b_id, a_id FROM pairsj),
         |reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
         |),
         |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_id
         |       FROM reach GROUP BY node),
         |sz AS (SELECT cluster_id, COUNT(*) AS sz FROM cl GROUP BY 1)
         |SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
         |       CAST(COUNT(*) * sz AS BIGINT) AS n_docs,
         |       CAST(COUNT(*) * (sz - 1) AS BIGINT) AS n_removable
         |FROM sz GROUP BY sz ORDER BY cluster_size""".stripMargin),

    // Incremental dedup admission — the nightly-ingest shape: a NEW
    // batch of documents (doc_id % 4 = 0, a deterministic stand-in
    // for the arrival partition) is admitted against the EXISTING
    // corpus without ever self-joining the history. Per new document:
    // the minimum existing doc it near-duplicates (same
    // shingle/minhash/band/Jaccard construction as the batch operator;
    // an exact copy scores 1.0 and needs no separate path) or NULL +
    // admit=true. Scale shape: new-side bands probe existing-side
    // bands on the band key — the join is collision-sized, the
    // existing side caps per bucket like the batch plan
    // ([[bandCap]]), and at 100 TB the existing bands live as a
    // pre-built index table instead of being recomputed. Per-doc
    // grain (no exact-collapse): admission is a per-document verdict.
    "x_dedup_incremental" -> Q(
      (s, dir) => {
        val c = corpus(s, dir)
        val isNew = col("doc_id") % 4 === 0
        val sigs = graft.ops.PlanCache.materialized(
          c.withColumn("t", split(col("text"), " "))
            .withColumn("sh", TextHash.shingleSet(col("t"), 3))
            .withColumn("mh", TextHash.minhash(col("sh"), 8))
            .filter(col("mh").isNotNull)
            .select("doc_id", "sh", "mh"))
        val bands = sigs
          .withColumn("bkey", explode(expr(
            "transform(sequence(0, 3), b -> concat(cast(b AS string), ':', cast(element_at(mh, 2*b+1) AS string), ':', cast(element_at(mh, 2*b+2) AS string)))")))
          .select("doc_id", "bkey")
        val cap = bandCap(s)
        val exBands = bands.filter(!isNew)
          .withColumn("_rnk", row_number().over(
            Window.partitionBy("bkey").orderBy("doc_id")))
          .filter(col("_rnk") <= cap).drop("_rnk")
        val cand = bands.filter(isNew).select(col("doc_id").as("new_id"), col("bkey"))
          .join(exBands.select(col("doc_id").as("ex_id"), col("bkey")), "bkey")
          .select("new_id", "ex_id").distinct()
        val dups = cand
          .join(sigs.select(col("doc_id").as("new_id"), col("sh").as("sn")), "new_id")
          .join(sigs.select(col("doc_id").as("ex_id"), col("sh").as("se")), "ex_id")
          .filter(TextHash.jaccardSim(col("sn"), col("se")) >= 0.5)
          .groupBy("new_id").agg(min("ex_id").as("dup_of"))
        c.filter(isNew).select(col("doc_id"))
          .join(dups.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("admit"))
          .orderBy("doc_id")
      },
      s"""WITH $CorpusCte,
         |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |sh AS (SELECT doc_id, $ShingleDuck AS sh FROM d),
         |mh AS (SELECT doc_id, sh,
         |         list_transform(range(0, 8), k ->
         |           list_min(list_transform(sh, s ->
         |             ((2*k+3) * (list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)) + (5*k+7)) % 1000000007))) AS mh
         |       FROM sh),
         |bands AS (SELECT doc_id,
         |            unnest(list_transform(range(0, 4), b ->
         |              CAST(b AS VARCHAR) || ':' || CAST(mh[2*b+1] AS VARCHAR) || ':' || CAST(mh[2*b+2] AS VARCHAR))) AS bkey
         |          FROM mh),
         |cand AS (SELECT DISTINCT n.doc_id AS new_id, e.doc_id AS ex_id
         |         FROM bands n JOIN bands e ON n.bkey = e.bkey
         |         WHERE n.doc_id % 4 = 0 AND e.doc_id % 4 != 0),
         |dups AS (SELECT c.new_id, MIN(c.ex_id) AS dup_of
         |         FROM cand c
         |         JOIN sh sn ON sn.doc_id = c.new_id
         |         JOIN sh se ON se.doc_id = c.ex_id
         |         WHERE len(list_intersect(sn.sh, se.sh)) / len(list_distinct(list_concat(sn.sh, se.sh))) >= 0.5
         |         GROUP BY c.new_id)
         |SELECT c.doc_id, d2.dup_of, d2.dup_of IS NULL AS admit
         |FROM corpus c LEFT JOIN dups d2 ON d2.new_id = c.doc_id
         |WHERE c.doc_id % 4 = 0
         |ORDER BY c.doc_id""".stripMargin),

    // Deterministic stratified sampling — the reproducible form of
    // corpus downsampling: a doc's sampling bucket is a pure hash of
    // its id (the portable polyhash construction, not rand() and not an
    // engine-specific hash), so the SAME docs are kept on every run, in
    // every engine, at any parallelism; per-language rates implement
    // stratification (rebalancing a multilingual corpus). Map+filter
    // only — no shuffle, no driver state.
    "x_sample_stratified" -> Q(
      (s, dir) => {
        val idStr = "CAST(doc_id AS STRING)"
        Tables.documents(s, dir)
          .withColumn("bucket", expr(
            s"""aggregate(
               |  transform(sequence(1, length($idStr)),
               |            i -> CAST(ascii(substr($idStr, i, 1)) AS BIGINT)),
               |  0L, (acc, c) -> (acc * 31 + c) % 1000000007) % 100""".stripMargin)
            .cast("int"))
          .withColumn("rate",
            when(col("lang") === "en", 50)
              .when(col("lang") === "de", 25).otherwise(10))
          .filter(col("bucket") < col("rate"))
          .select("doc_id", "lang", "bucket")
          .orderBy("doc_id")
      },
      """SELECT doc_id, lang,
        |  CAST(list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 100 AS INT) AS bucket
        |FROM documents
        |WHERE CAST(list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      range(1, length(CAST(doc_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 100 AS INT)
        |  < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 25 ELSE 10 END
        |ORDER BY doc_id""".stripMargin),

    // End-to-end corpus curation — the composed training-data pipeline:
    // per-doc quality features (map-only pass), near-dup clusters
    // (minhash LSH pairs → connected components), then the keep
    // decision: canonical member of its cluster (or unique) AND above
    // the quality bar. This is the query a 100 TB curation run executes;
    // every stage reuses an already-oracled operator, and the whole
    // composition is value-checked here end-to-end.
    "x_curation" -> Q(
      (s, dir) => {
        val feats = corpus(s, dir)
          .withColumn("t", split(col("text"), " "))
          .select(col("doc_id"),
            expr("size(t)").as("n_tokens"),
            expr(StopRatioSpark).as("stop_ratio"),
            expr(TypeTokenSpark).as("type_token_ratio"))
          .withColumn("quality_score", expr(QualityScore))
        val clusters = minhashClustersOver(corpus(s, dir))
        feats.join(clusters, Seq("doc_id"), "left")
          .withColumn("is_canonical",
            col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
          .withColumn("keep",
            col("is_canonical") && col("quality_score") >= 0.3 && col("n_tokens") >= 5)
          .select("doc_id", "n_tokens", "quality_score", "cluster_id",
            "is_canonical", "keep")
          .orderBy("doc_id")
      },
      s"""WITH RECURSIVE $minhashPairsCte,
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairsj
         |          UNION SELECT b_id, a_id FROM pairsj),
         |reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
         |),
         |clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id
         |             FROM reach GROUP BY node),
         |feats AS (
         |  SELECT doc_id,
         |    CAST(len(t) AS INT) AS n_tokens,
         |    $StopRatioDuck AS stop_ratio,
         |    $TypeTokenDuck AS type_token_ratio
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)),
         |q AS (SELECT *, $QualityScore AS quality_score FROM feats)
         |SELECT q.doc_id, q.n_tokens, q.quality_score, c.cluster_id,
         |  (c.cluster_id IS NULL OR c.cluster_id = q.doc_id) AS is_canonical,
         |  ((c.cluster_id IS NULL OR c.cluster_id = q.doc_id)
         |   AND q.quality_score >= 0.3 AND q.n_tokens >= 5) AS keep
         |FROM q LEFT JOIN clusters c USING (doc_id)
         |ORDER BY doc_id""".stripMargin),

    // n-gram Jaccard near-dedup with 1-permutation minhash blocking:
    // candidate pairs share their minimum shingle hash (P[same block] =
    // exact Jaccard, so ≥0.5-similar pairs are found with ≥0.5
    // probability per block — a deliberately different candidate
    // structure from the banded LSH below), then exact 3-gram Jaccard
    // ≥ 0.5 verification. Blocking keeps pair generation linear in
    // bucket size, never quadratic in the corpus.
    "x_dedup_ngram" -> Q(
      (s, dir) => {
        val blocked = corpus(s, dir)
          .withColumn("t", split(col("text"), " "))
          .withColumn("sh", TextHash.shingleSet(col("t"), 3))
          .withColumn("block", TextHash.minhash(col("sh"), 1).getItem(0))
          .filter(col("block").isNotNull)
          .select("doc_id", "sh", "block")
        blocked.as("a")
          .join(blocked.as("b"),
            col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            TextHash.jaccardSim(col("a.sh"), col("b.sh")).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("a_id", "b_id")
      },
      s"""WITH $CorpusCte,
         |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |sh AS (SELECT doc_id, $ShingleDuck AS sh FROM d),
         |b AS (SELECT doc_id, sh,
         |        list_min(list_transform(sh, s ->
         |          (3 * (list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)) + 7) % 1000000007)) AS block
         |      FROM sh WHERE len(sh) > 0)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM b a JOIN b b ON a.block = b.block AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin),

    // Asymmetric CONTAINMENT dedup — |A∩B| / |A| ≥ 0.9 with A the
    // smaller shingle set: catches a short document quoted inside a
    // long one, which symmetric Jaccard misses by construction (the
    // union denominator dilutes). Blocking: B-side inverted index over
    // ALL shingles (the x_span_dedup gram-keyed shape), probed with
    // A's TWO lexicographically-smallest shingles, candidate iff BOTH
    // match (a 2-way AND-probe) — if A ⊆ B both are in B's index by
    // definition, so full containment keeps exact recall, while the
    // conjunction cuts the candidate set 34× at bench scale vs a
    // single-shingle probe (measured 54186 → 1592 candidates, the SAME
    // 693 verified pairs — synthetic short-vocabulary text makes any
    // one shingle unselective). Partial (≥0.9) containment can miss
    // only when a probe shingle falls in A's uncovered tail
    // (approximate recall, like any LSH blocking). Grams with document
    // frequency above the cap are excluded from candidacy (the bandCap
    // discipline — bounded fan-out on boilerplate grams, never a
    // quadratic bucket). Shingle arrays join back on the collision-
    // sized candidate set only; index rows carry (gram, id), never
    // arrays.
    "x_dedup_containment" -> Q(
      (s, dir) => {
        val cap = bandCap(s)
        val sh = graft.ops.PlanCache.materialized(
          corpus(s, dir)
            .withColumn("t", split(col("text"), " "))
            .withColumn("sh", TextHash.shingleSet(col("t"), 3))
            .filter(size(col("sh")) > 0)
            .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh")))
        val index = sh.select(col("doc_id").as("b_id"), explode(col("sh")).as("g"))
        val df = index.groupBy(col("g")).agg(count(lit(1)).as("df"))
        val probe = sh.select(col("doc_id").as("a_id"), col("n_sh").as("pn"),
          explode(expr("slice(array_sort(sh), 1, 2)")).as("g"))
        val cand = probe
          .join(index, "g").join(df, "g")
          .filter(col("df") <= cap && col("a_id") =!= col("b_id"))
          .groupBy(col("a_id"), col("b_id"), col("pn"))
          .agg(count(lit(1)).as("hits"))
          .filter(col("hits") === least(lit(2), col("pn")))
          .select("a_id", "b_id")
        cand
          .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha"),
            col("n_sh").as("na")), "a_id")
          .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb"),
            col("n_sh").as("nb")), "b_id")
          .filter(col("na") < col("nb") ||
            (col("na") === col("nb") && col("a_id") < col("b_id")))
          .withColumn("containment", expr("size(array_intersect(sha, shb)) / size(sha)"))
          .filter(col("containment") >= 0.9)
          .select("a_id", "b_id", "na", "nb", "containment")
          .orderBy("a_id", "b_id")
      },
      s"""WITH $CorpusCte,
         |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |sh0 AS (SELECT doc_id, $ShingleDuck AS sh FROM d),
         |sh1 AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh0 WHERE len(sh) > 0),
         |ix AS (SELECT doc_id AS b_id, unnest(sh) AS g FROM sh1),
         |dfr AS (SELECT g, COUNT(*) AS df FROM ix GROUP BY 1),
         |pr AS (SELECT doc_id AS a_id, n_sh AS pn,
         |              unnest(list_slice(list_sort(sh), 1, 2)) AS g
         |       FROM sh1),
         |cand AS (SELECT a_id, b_id
         |         FROM pr JOIN ix USING (g) JOIN dfr USING (g)
         |         WHERE df <= $BandCapDefault AND a_id != b_id
         |         GROUP BY a_id, b_id, pn
         |         HAVING COUNT(*) = LEAST(2, pn)),
         |j AS (SELECT c.a_id, c.b_id, a.sh AS sha, a.n_sh AS na,
         |             b.sh AS shb, b.n_sh AS nb
         |      FROM cand c
         |      JOIN sh1 a ON a.doc_id = c.a_id
         |      JOIN sh1 b ON b.doc_id = c.b_id
         |      WHERE a.n_sh < b.n_sh OR (a.n_sh = b.n_sh AND c.a_id < c.b_id))
         |SELECT a_id, b_id, na, nb,
         |       len(list_intersect(sha, shb)) / len(sha) AS containment
         |FROM j
         |WHERE len(list_intersect(sha, shb)) / len(sha) >= 0.9
         |ORDER BY a_id, b_id""".stripMargin),

    // SimHash near-dedup: 60-bit simhash (two independent 30-bit halves)
    // from token polynomial hashes, 4 bands × 15 bits for candidates,
    // Hamming-distance ≤ 3 verification.
    "x_dedup_simhash" -> Q(
      (s, dir) => {
        // The signature rides along through the band join, so the pair
        // row already holds both sides' simhashes — no verification
        // joins, and the two identical band subplans shuffle on bkey so
        // Spark's ReuseExchange computes the corpus scan only once.
        val bands = corpus(s, dir)
          .withColumn("t", split(col("text"), " "))
          .withColumn("simhash", TextHash.simhash(col("t")))
          .withColumn("bkey", explode(expr(
            "transform(sequence(0, 3), b -> concat(cast(b AS string), ':', cast(shiftright(simhash, 15*b) & 32767 AS string)))")))
          .select("doc_id", "simhash", "bkey")
        bands.as("a")
          .join(bands.as("b"),
            col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            col("a.simhash").as("ha"), col("b.simhash").as("hb"))
          .distinct()
          .withColumn("hamming", expr("cast(bit_count(ha ^ hb) AS int)"))
          .filter(col("hamming") <= 3)
          .select("a_id", "b_id", "hamming")
          .orderBy("a_id", "b_id")
      },
      s"""WITH $CorpusCte,
         |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |h AS (SELECT doc_id, ${polyHashDuck(31)} AS hs1, ${polyHashDuck(131)} AS hs2 FROM d),
         |s AS (SELECT doc_id, ${simhashDuck("hs1")} + (${simhashDuck("hs2")} << 30) AS simhash FROM h),
         |bands AS (SELECT doc_id,
         |            unnest(list_transform(range(0, 4), b ->
         |              CAST(b AS VARCHAR) || ':' || CAST((simhash >> (15*b)) & 32767 AS VARCHAR))) AS bkey
         |          FROM s),
         |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |          FROM bands a JOIN bands b
         |            ON a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT p.a_id, p.b_id, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
         |FROM pairs p
         |JOIN s sa ON sa.doc_id = p.a_id
         |JOIN s sb ON sb.doc_id = p.b_id
         |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin),

    // Text normalization — the cleaning pass that precedes every
    // dedup/tokenize stage in a training-data pipeline: lowercase,
    // strip URLs, strip non-alphanumerics, collapse runs of spaces,
    // trim. Pure per-row regexp_replace chain (one codegen'd map stage,
    // no shuffle); patterns stay in the RE2 ∩ Java-regex common subset
    // so the oracle is the same chain verbatim.
    "x_text_clean" -> Q(
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("cleaned", cleanedText(col("text")))
          .select(
            col("doc_id"),
            substring(col("cleaned"), 1, 80).as("clean_prefix"),
            length(col("cleaned")).as("clean_len"),
            (length(col("text")) - length(col("cleaned"))).as("removed_chars"),
            (size(split(col("cleaned"), " "))).as("n_clean_tokens"))
          .orderBy(col("doc_id")),
      """WITH c AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      lower(text),
        |      'https?://[^ ]+', ' ', 'g'),
        |      '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')) AS cleaned
        |  FROM documents)
        |SELECT doc_id,
        |  substr(cleaned, 1, 80) AS clean_prefix,
        |  CAST(length(cleaned) AS INT) AS clean_len,
        |  CAST(length(text) - length(cleaned) AS INT) AS removed_chars,
        |  CAST(len(string_split(cleaned, ' ')) AS INT) AS n_clean_tokens
        |FROM c ORDER BY doc_id""".stripMargin),

    // Benchmark decontamination — the overlap check every training-data
    // pipeline runs before a model sees the corpus: flag documents
    // sharing 8-token shingles with a held-out benchmark set (here the
    // %50 originals, so the dedup corpus's injected copies are the known
    // contaminated population). The benchmark shingle set BROADCASTS
    // (eval benchmarks are small by nature — the corpus is the big
    // side), so the corpus-sized explode is probed map-side and partial
    // aggregation collapses hits back to doc grain before the one
    // doc-keyed exchange. 8-token shingles make random collisions
    // negligible; overlap ratio is the contamination score.
    "x_contamination" -> Q(
      (s, dir) => {
        val benchDocs = Tables.documents(s, dir)
          .filter(col("doc_id") % 50 === 0)
        val benchSh = benchDocs
          .select(explode(TextHash.shingleSet(split(col("text"), " "), 8)).as("sh"))
          .distinct()
          .withColumn("hit", lit(1))
        corpus(s, dir)
          .join(benchDocs.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            explode(TextHash.shingleSet(split(col("text"), " "), 8)).as("sh"))
          .join(broadcast(benchSh), Seq("sh"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
          .filter(col("n_hits") > 0)
          .withColumn("contamination", col("n_hits") / col("n_shingles"))
          .orderBy(col("doc_id"))
      },
      s"""WITH $CorpusCte,
         |bench_sh AS (
         |  SELECT DISTINCT unnest(list_distinct(list_transform(
         |           range(1, len(string_split(text, ' ')) - 6),
         |           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 7), ' ')))) AS sh
         |  FROM documents WHERE doc_id % 50 = 0),
         |scan AS (
         |  SELECT doc_id,
         |         unnest(list_distinct(list_transform(
         |           range(1, len(string_split(text, ' ')) - 6),
         |           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 7), ' ')))) AS sh
         |  FROM corpus
         |  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 50 = 0))
         |SELECT s.doc_id, COUNT(*) AS n_shingles, COUNT(b.sh) AS n_hits,
         |       COUNT(b.sh) / COUNT(*) AS contamination
         |FROM scan s LEFT JOIN bench_sh b USING (sh)
         |GROUP BY s.doc_id
         |HAVING COUNT(b.sh) > 0
         |ORDER BY s.doc_id""".stripMargin),

    // Per-domain cap — the corpus-balancing stage that stops one crawl
    // domain from dominating training data: keep at most K documents
    // per source, chosen by deterministic hash order (md5 of the id —
    // no rand(), so the SAME documents survive at any parallelism, like
    // x_sample_stratified's buckets). Top-K per partition plans as
    // WindowGroupLimit: the per-partition rank filter pushes below the
    // full sort, so only K rows per domain survive each map task.
    "x_domain_cap" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 15)
          .orderBy(col("source"), col("rk"))
      },
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |  FROM documents)
        |WHERE rk <= 15
        |ORDER BY source, rk""".stripMargin),

    // Link-mass ranking over the syndication graph (ops/PageRank):
    // near-dup pairs become directed edges newer→older ("the copy
    // points at the original"), and three integer-arithmetic PageRank
    // rounds concentrate rank on the most-syndicated originals — the
    // link-based quality signal corpus curation adds on top of
    // content-based scores. Every product/quotient of the damping
    // update is a floor of exact integers, so the rank vector is
    // bit-identical in any engine — the oracle unrolls the identical
    // three rounds over the same verified pairs. Per round: one
    // edge-keyed join + one dst-keyed combine-enabled aggregate;
    // lineage cut per round (the Components pattern).
    "x_pagerank" -> Q(
      (s, dir) =>
        graft.ops.PageRank.pageRank(
            minhashPairs(s, dir)
              .select(col("b_id").as("src"), col("a_id").as("dst")),
            iters = 3)
          .select(col("node").as("doc_id"), col("r").as("pr"))
          .orderBy("doc_id"),
      {
        def round(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT nodes.node,
             |         (SELECT base FROM b) + (17 * COALESCE(m.s, 0)) // 20 AS r
             |  FROM nodes LEFT JOIN (
             |    SELECT ed.dst AS node, SUM($prev.r // deg.d) AS s
             |    FROM ed JOIN $prev ON $prev.node = ed.src
             |            JOIN deg ON deg.src = ed.src
             |    GROUP BY ed.dst) m USING (node))""".stripMargin
        s"""WITH $minhashPairsCte,
           |ed AS (SELECT b_id AS src, a_id AS dst FROM pairsj),
           |nodes AS (SELECT DISTINCT node FROM (
           |  SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
           |params AS (SELECT COUNT(*) AS n FROM nodes),
           |deg AS (SELECT src, COUNT(*) AS d FROM ed GROUP BY 1),
           |b AS (SELECT 3000000000000 // (20 * n) AS base FROM params),
           |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, params),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT node AS doc_id, CAST(r AS BIGINT) AS pr
           |FROM r3 ORDER BY doc_id""".stripMargin
      })
  )
}
