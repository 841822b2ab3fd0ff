package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two tiers, as a 100 TB pipeline would stage them:
  *  - brute-force cosine top-k for a small query set: broadcast the
  *    queries, stream the corpus once — the exact baseline and the
  *    "re-rank" stage of any ANN system;
  *  - random-hyperplane LSH bucketing: each vector gets a small bucket
  *    id from sign(v . plane_j); candidate generation becomes an
  *    equi-join on the bucket (keyed shuffle, no cross product), which
  *    is the shape that survives 1000 executors. Plane coefficients
  *    are md5-derived constants baked into both the Spark plan and the
  *    oracle SQL, so both engines see identical literals.
  */
object Ann {

  private val Dim = 64
  private val NPlanes = 4

  /** Deterministic pseudo-random hyperplanes in [-1, 1]:
    * plane(j)(d) = (md5_60("j_d") mod 2001 - 1000) / 1000.
    */
  lazy val planes: Seq[Seq[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until NPlanes).map { j =>
      (0 until Dim).map { dd =>
        val hex = mdig.digest(s"${j}_$dd".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        val h = java.lang.Long.parseLong(hex, 16)
        ((h % 2001L) - 1000L).toDouble / 1000.0
      }
    }
  }

  private def planeLit(j: Int): Column = typedlit(planes(j))

  /** Bucket id = sum_j (v . plane_j > 0) << j. */
  private def bucketCol(v: Column): Column =
    (0 until NPlanes).map { j =>
      when(dot(v, planeLit(j)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact brute-force cosine top-5 for queries vec_id < 8. */
  def annBruteforceTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("vq"))
    val cos = round(cosine(col("vq"), col("v")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(broadcast(e), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
  }

  /** LSH-bucketed ANN: candidates share a 4-bit hyperplane bucket. */
  def annLshTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", bucketCol(col("v")))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("vq"), col("bucket"))
    val cos = round(cosine(col("vq"), col("v")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(e, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("bucket"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  val queries: Map[String, Relational.Q] = Map(
    "ann_bruteforce_topk" -> (annBruteforceTopk _),
    "ann_lsh_topk" -> (annLshTopk _)
  )

  // plane literal as DuckDB list text; Double.toString round-trips.
  private def planeSql(j: Int): String =
    planes(j).map(_.toString).mkString("[", ", ", "]")

  private val bucketSql = (0 until NPlanes).map { j =>
    s"(CASE WHEN list_dot_product(v, ${planeSql(j)}::DOUBLE[]) > 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        | SELECT a.vec_id AS qid, b.vec_id AS nid,
        |  round(list_dot_product(a.v, b.v)
        |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
        | FROM e a JOIN e b ON b.vec_id <> a.vec_id
        | WHERE a.vec_id < 8),
        |r AS (SELECT qid, nid, cos,
        | row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM p)
        |SELECT qid, nid, cos, rn FROM r WHERE rn <= 5""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH e AS (
         | SELECT vec_id, embedding::DOUBLE[] AS v,
         |  $bucketSql AS bucket
         | FROM embeddings),
         |p AS (
         | SELECT a.vec_id AS qid, b.vec_id AS nid, a.bucket,
         |  round(list_dot_product(a.v, b.v)
         |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
         | FROM e a JOIN e b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
         | WHERE a.vec_id < 8),
         |r AS (SELECT qid, nid, bucket, cos,
         | row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM p)
         |SELECT qid, nid, bucket, cos, rn FROM r WHERE rn <= 3""".stripMargin
  )
}
