package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** Hybrid retrieval — the RAG-serving query shape a training-data
  * engine ends up powering: a lexical lane (BM25 over the fixed query
  * terms) and a semantic lane (embedding cosine against a fixed query
  * vector) fused by reciprocal-rank fusion, `sum_i 1/(60 + rank_i)`
  * (Cormack et al.'s k = 60; rank-based fusion needs no cross-lane
  * score calibration, which is exactly why production hybrid search
  * uses it).
  *
  * Scale shape: each lane is one corpus scan reduced map-side to a
  * BOUNDED top-20 heap (TopKAgg — never a corpus-wide rank window);
  * fusion is a full-outer join of two <= 20-row tables and the final
  * rank window runs over <= 40 rows. At 100 TB the only corpus-sized
  * work is the two scans, both scan-speed and codegen'd.
  *
  * Determinism: lanes rank by the 6-dp ROUNDED score (bit-equal
  * cross-engine — pinned by the green bm25_score / ann_* oracles)
  * with doc_id tiebreak; RRF contributions 1/(60+r) are exact-integer
  * reciprocals evaluated in double on both engines.
  */
object Retrieval {

  private val Dim = 64
  private val LaneK = 20
  private val FusedK = 10
  private val RrfK = 60

  /** Deterministic pseudo-random query vector in [-1, 1]:
    * q(d) = (md5_60("q_d") mod 2001 - 1000) / 1000 — the Ann.planes
    * construction under a disjoint seed prefix.
    */
  lazy val qvec: Seq[Double] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until Dim).map { dd =>
      val hex = mdig.digest(s"q_$dd".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      ((h % 2001L) - 1000L).toDouble / 1000.0
    }
  }

  /** Bounded top-k of (score desc, doc_id asc) -> (doc_id, rank). */
  private def laneRanks(scored: DataFrame, score: Column,
                        rankName: String): DataFrame =
    scored
      .groupBy()
      .agg(graft.functions.TopKAgg.collectTopK(
        struct((lit(0.0) - score).as("neg"), col("doc_id")), LaneK,
        reverse = true).as("top"))
      .select(posexplode(array_sort(col("top"))).as(Seq("idx", "t")))
      .select(col("t.doc_id").as("doc_id"),
        (col("idx") + 1).cast("long").as(rankName))

  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val lex = laneRanks(Corpus.bm25Score(s, d), col("bm25"), "lex_rank")
    val qv = typedlit(qvec)
    val sem = laneRanks(
      Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("embedding").as("v"))
        .select(col("doc_id"),
          // safeDiv, not `/`: a zero-norm embedding would yield NaN,
          // which Spark sorts last but DuckDB sorts first under
          // ORDER BY cos DESC — the same guard VectorOps.knnGraph uses
          round(graft.functions.Cleaning.safeDiv(
            dot(col("v"), qv), norm2(col("v")) * norm2(qv)), 6).as("cos")),
      col("cos"), "sem_rank")
    val rrf =
      coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0))
    // full-outer: a doc ranked in one lane still fuses; the rank
    // window is over the <= 40-row fused table, never the corpus
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_raw", rrf)
      .withColumn("fused_rank", row_number()
        .over(Window.orderBy(col("rrf_raw").desc, col("doc_id"))).cast("long"))
      .filter(col("fused_rank") <= FusedK)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        round(col("rrf_raw"), 6).as("rrf"), col("fused_rank"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "hybrid_rrf" -> (hybridRrf _)
  )

  private val qvecSql: String =
    qvec.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"

  val oracleSql: Map[String, String] = Map(
    // nested-WITH reuse of the green bm25_score oracle as the lexical
    // lane; both lanes rank on the 6-dp rounded score with doc_id
    // tiebreak, fusion sums exact-reciprocal doubles
    "hybrid_rrf" ->
      s"""WITH lexr AS (
         | SELECT doc_id, lex_rank FROM (
         |  SELECT doc_id,
         |   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
         |  FROM (${Corpus.oracleSql("bm25_score")})) WHERE lex_rank <= $LaneK),
         |sem AS (
         | SELECT vec_id AS doc_id,
         |  round(list_dot_product(embedding::DOUBLE[], $qvecSql)
         |   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         |      * sqrt(list_dot_product($qvecSql, $qvecSql))), 6) AS cos
         | FROM embeddings),
         |semr AS (
         | SELECT doc_id, sem_rank FROM (
         |  SELECT doc_id,
         |   row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
         |  FROM sem) WHERE sem_rank <= $LaneK),
         |f AS (
         | SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
         |  l.lex_rank, r.sem_rank,
         |  coalesce(CAST(1 AS DOUBLE) / ($RrfK + l.lex_rank), 0)
         |   + coalesce(CAST(1 AS DOUBLE) / ($RrfK + r.sem_rank), 0) AS rrf_raw
         | FROM lexr l FULL JOIN semr r ON r.doc_id = l.doc_id)
         |SELECT doc_id, lex_rank, sem_rank, round(rrf_raw, 6) AS rrf, fused_rank
         |FROM (
         | SELECT doc_id, lex_rank, sem_rank, rrf_raw,
         |  row_number() OVER (ORDER BY rrf_raw DESC, doc_id) AS fused_rank
         | FROM f) WHERE fused_rank <= $FusedK""".stripMargin
  )
}
