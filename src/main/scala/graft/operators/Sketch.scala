package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Frequent-items (heavy-hitters) and vocabulary-statistics operators —
  * the sketch tier of the training-data pipeline. Finding the most
  * frequent tokens/n-grams of a crawl drives stopword lists, boilerplate
  * vocabularies, and tokenizer merges, and the naive plan (groupBy over
  * every token) shuffles the ENTIRE vocabulary — trillions of distinct
  * n-grams at 100 TB.
  *
  * `heavy_hitters` instead runs the two-pass candidate + exact-recount
  * shape:
  *
  *  1. one narrow mapPartitions pass runs a Misra–Gries summary (a
  *     deterministic frequent-items sketch; public algorithm, see
  *     Misra & Gries 1982) with capacity `cap` per partition. The union
  *     of the per-partition survivor sets is guaranteed to contain every
  *     token with global count > n/(cap+1); at most
  *     `partitions x cap` candidate rows leave the scan — KBs, not a
  *     vocabulary-sized shuffle;
  *  2. a second scan recounts ONLY the candidates (broadcast semi-join
  *     on the bounded candidate set, then a keyed agg whose shuffle
  *     carries candidate tokens only) and takes the global top-k.
  *
  * The result is then CERTIFIED exact on the driver: if no partition
  * ever evicted a counter the candidate set is the whole vocabulary, and
  * otherwise the k-th returned count must strictly exceed n/(cap+1) —
  * in both cases no non-candidate token can reach (or tie into) the
  * top-k, so the output equals the exact top-k regardless of partition
  * layout. A corpus that fails the certificate raises (the fix is a
  * larger `cap`), it never silently returns an approximate list.
  *
  * The corpus is deliberately scanned twice (tokenize is re-run in the
  * recount pass): at 100 TB two linear scans are far cheaper than
  * materializing a corpus-sized token table between passes.
  */
object Sketch {

  /** One Misra–Gries summary row: a surviving candidate (`token` set,
    * counters zero) or the per-partition bookkeeping row (`token` null,
    * `part_total` = tokens seen, `evictions` = decrement-all rounds).
    */
  case class MgRow(token: String, part_total: Long, evictions: Long)

  /** Misra–Gries frequent-items summary of one partition's token
    * stream. Classic decrement-all form: an unseen token with the map
    * at capacity decrements every counter (amortized O(1)/token — each
    * decrement round removes cap+1 units of total count, so there are
    * at most n/(cap+1) rounds). Survivors are a superset of every token
    * with partition count > n_p/(cap+1).
    */
  private[operators] def misraGries(it: Iterator[String], cap: Int): Iterator[MgRow] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var total = 0L
    var evictions = 0L
    while (it.hasNext) {
      val t = it.next()
      total += 1
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < cap => m.update(t, 1L)
        case None =>
          evictions += 1
          // snapshot before mutating: HashMap iteration order is not
          // stable under concurrent update/remove
          val snap = m.toArray
          var i = 0
          while (i < snap.length) {
            val (k, v) = snap(i)
            if (v == 1L) m.remove(k) else m.update(k, v - 1L)
            i += 1
          }
      }
    }
    m.keysIterator.map(MgRow(_, 0L, 0L)) ++
      Iterator.single(MgRow(null, total, evictions))
  }

  /** Exact global top-k most frequent tokens (count desc, token asc
    * tiebreak), computed with the certified sketch-then-recount plan
    * described on the object. Output: (token, cnt, rank), k rows.
    *
    * Contract: the plan presumes a heavy-tailed (Zipfian) frequency
    * distribution — each top-k token must carry > 1/(cap+1) of total
    * token mass for the certificate to prove exactness. Real-crawl
    * heads satisfy that with small caps; a near-FLAT distribution
    * (e.g. the ScaleUp bench corpus, whose replicas deliberately share
    * no vocabulary, so 10x data means 10x types at constant per-type
    * mass) needs cap >= vocabulary size to certify — the round-5 sf1
    * sweep caught exactly that with cap=128 (kth=9117 < n/129: refused,
    * loudly). Default cap 1024 keeps the summary bounded (32 partitions
    * x 1024 = 32k candidate rows) while covering the 10x corpus's ~310
    * types eviction-free; for distributions flatter than 1/(cap+1) the
    * honest answer is the full vocabulary agg (token_freq_spectrum's
    * plan), not a sketch.
    *
    * `materialize = false` returns the same composition fully LAZY (no
    * checkpoints, no certificate) — PlanGuardSpec lints that twin, so
    * the pass-2 join shape stays visible to the cartesian check that
    * the eager form's checkpoint would otherwise hide.
    */
  def heavyHitters(s: SparkSession, d: String, k: Int = 20, cap: Int = 1024,
      materialize: Boolean = true): DataFrame = {
    import s.implicits._
    def toks = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))

    // pass 1: bounded summary table (≤ partitions x (cap+1) rows) —
    // eager localCheckpoint because it feeds both the candidate join
    // and the two certificate scalars
    val summaryLazy = toks.as[String]
      .mapPartitions(it => misraGries(it, cap))
      .toDF("token", "part_total", "evictions")
    val summary = if (materialize) summaryLazy.localCheckpoint(true) else summaryLazy
    val cands = summary.filter(col("token").isNotNull).select("token").distinct()

    // pass 2: exact recount of candidates only; the agg shuffle carries
    // candidate tokens, never the full vocabulary
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    val topLazy = toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    if (!materialize) return topLazy
    val top = topLazy.localCheckpoint(true) // materialize once: certificate + result

    // driver-side exactness certificate (bounded scalar aggregates on
    // the checkpointed tables — no extra corpus scan)
    val (n, ev) = summary.filter(col("token").isNull)
      .agg(coalesce(sum("part_total"), lit(0L)), coalesce(sum("evictions"), lit(0L)))
      .as[(Long, Long)].head()
    if (ev > 0L) {
      val kth = top.agg(coalesce(min("cnt"), lit(0L))).as[Long].head()
      require(top.count() == k && kth * (cap + 1L) > n,
        s"heavy_hitters: top-$k not certifiably exact at cap=$cap " +
          s"(kth=$kth, n=$n) — raise cap")
    }
    top
  }

  /** Token frequency spectrum (Zipf diagnostics): one row per observed
    * frequency value with the number of vocabulary types occurring
    * exactly that often. The cnt=1 row is the hapax-legomenon count and
    * the largest cnt is the hottest token's frequency — the standard
    * corpus-health curve a curation pipeline watches for boilerplate
    * (fat head) and OCR noise (fat singleton tail). Two keyed aggs,
    * both partial+final; output is tiny (distinct frequency VALUES,
    * O(sqrt n) by sum bound). The 100 TB shortcut for the vocabulary
    * size alone is approx_count_distinct (HLL++), whose error bound
    * SketchSpec pins against this exact path.
    */
  def tokenFreqSpectrum(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("n_types"))

  val queries: Map[String, Relational.Q] = Map(
    "heavy_hitters" -> ((s, d) => heavyHitters(s, d)),
    "token_freq_spectrum" -> (tokenFreqSpectrum _)
  )

  private val normSql = TextAnalysis.normSql

  val oracleSql: Map[String, String] = Map(
    // exact top-20 with the same (cnt desc, token asc) tiebreak
    "heavy_hitters" ->
      s"""WITH toks AS (
         | SELECT unnest(string_split($normSql, ' ')) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
         |r AS (SELECT token, cnt,
         |  row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c)
         |SELECT token, cnt, rank FROM r WHERE rank <= 20""".stripMargin,

    "token_freq_spectrum" ->
      s"""WITH toks AS (
         | SELECT unnest(string_split($normSql, ' ')) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
         |SELECT cnt, count(*) AS n_types FROM c GROUP BY cnt""".stripMargin
  )
}
