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
  private[operators] def bucketCol(v: Column): Column =
    (0 until NPlanes).map { j =>
      when(dot(v, planeLit(j)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact brute-force cosine top-5 for queries vec_id < 8. */
  def annBruteforceTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v")) // raw float vecs: dot widens in-kernel, half the pair-join bytes
      .withColumn("nv", norm2(col("v")))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("vq"), col("nv").as("nq"))
    val cos = round(cosinePre(col("vq"), col("nq"), col("v"), col("nv")), 6)
    // Broadcast the tiny query side and STREAM the corpus once — the
    // build relation of this nested-loop join must be the 8-row query
    // set, never the corpus (which is the 100 TB side at scale). The
    // top-5 is a bounded-heap aggregate, not a window: the nq x corpus
    // scored stream reduces map-side to 5 rows per qid per partition
    // instead of re-shuffling and sorting in full. (cos desc, nid asc)
    // encoded ascending as (-cos, nid); `0.0 - neg` recovers cos
    // without a -0.0 artifact.
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), cos.as("cos"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.collectTopK(
        struct((lit(0.0) - col("cos")).as("neg"), col("nid")), 5,
        reverse = true).as("top"))
      .select(col("qid"), posexplode(array_sort(col("top"))).as(Seq("idx", "t")))
      .select(col("qid"), col("t.nid").as("nid"),
        (lit(0.0) - col("t.neg")).as("cos"),
        (col("idx") + 1).cast("long").as("rn"))
  }

  /** LSH-bucketed ANN: candidates share a 4-bit hyperplane bucket. */
  def annLshTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v")) // raw float vecs: dot widens in-kernel, half the pair-join bytes
      .withColumn("bucket", bucketCol(col("v")))
      .withColumn("nv", norm2(col("v")))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("vq"), col("bucket"),
        col("nv").as("nq"))
    val cos = round(cosinePre(col("vq"), col("nq"), col("v"), col("nv")), 6)
    // bounded-heap top-3 (see annBruteforceTopk); each qid lives in
    // exactly one bucket, so (qid, bucket) grouping preserves the key
    q.join(e, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("bucket"), cos.as("cos"))
      .groupBy(col("qid"), col("bucket"))
      .agg(graft.functions.TopKAgg.collectTopK(
        struct((lit(0.0) - col("cos")).as("neg"), col("nid")), 3,
        reverse = true).as("top"))
      .select(col("qid"), col("bucket"),
        posexplode(array_sort(col("top"))).as(Seq("idx", "t")))
      .select(col("qid"), col("t.nid").as("nid"), col("bucket"),
        (lit(0.0) - col("t.neg")).as("cos"),
        (col("idx") + 1).cast("long").as("rn"))
  }

  /** IVF-style ANN: coarse centroids = per-label mean vectors (the
    * "train" stage of an inverted-file index, here one k-means step
    * seeded by the label partition); queries probe ONLY their nearest
    * centroid's list. At 100 TB: centroids are a broadcast table,
    * assignment is a narrow map, and the probe is an equi-join on the
    * list id — same keyed-shuffle shape as the LSH variant.
    */
  def annIvfTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").as("v")) // raw float vecs: dot widens in-kernel, half the pair-join bytes
      .withColumn("nv", norm2(col("v")))
    // centroids: element-wise mean per label via posexplode + pivot-free agg
    val centroids = e
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        p => p.getField("m")).as("c"))
      .select(col("label").as("list_id"), col("c"))
    // assign every query vector to its nearest centroid (max cosine)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("vq"), col("nv").as("nq"))
    val qAssign = q.join(broadcast(centroids))
      .select(col("qid"), col("vq"), col("nq"), col("list_id"),
        round(cosine(col("vq"), col("c")), 6).as("ccos"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("list_id"))))
      .filter(col("crn") === 1)
      .select(col("qid"), col("vq"), col("nq"), col("list_id"))
    // probe only the assigned list (norms precomputed on both sides)
    val cos = round(cosinePre(col("vq"), col("nq"), col("v"), col("nv")), 6)
    // bounded-heap top-3 (see annBruteforceTopk); each qid probes
    // exactly one list, so (qid, list_id) grouping preserves the key
    qAssign.join(e, col("label") === col("list_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("list_id"), cos.as("cos"))
      .groupBy(col("qid"), col("list_id"))
      .agg(graft.functions.TopKAgg.collectTopK(
        struct((lit(0.0) - col("cos")).as("neg"), col("nid")), 3,
        reverse = true).as("top"))
      .select(col("qid"), col("list_id"),
        posexplode(array_sort(col("top"))).as(Seq("idx", "t")))
      .select(col("qid"), col("t.nid").as("nid"), col("list_id"),
        (lit(0.0) - col("t.neg")).as("cos"),
        (col("idx") + 1).cast("long").as("rn"))
  }

  /** One k-means training iteration for the IVF coarse quantizer:
    * centroids seeded from the label partition folded into at most 16
    * seed groups (`label % 16` — identity on the driver corpora, whose
    * labels are 0..9), every vector re-assigned to its nearest centroid
    * (squared L2, deterministic round+id tie-break), centroids
    * recomputed from the assignment. Output is LONG format
    * (cluster, dim, value) so the oracle compare stays scalar.
    *
    * k is CAPPED, not proportional to the corpus: assignment cost is
    * corpus x k, and a k that grows with the data makes the step
    * quadratic (measured: 34x at a 10x scale-up when k rode the label
    * count). Real distributed k-means fixes k as a hyperparameter; at
    * scale centroids stay a broadcast table, assignment is a narrow
    * map over the corpus, recompute is one keyed shuffle.
    */
  def embeddingKmeansStep(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").as("v")) // raw float vecs: dot widens in-kernel, half the pair-join bytes
    val cent = e
      .select(pmod(col("label"), lit(16)).as("seed"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("seed"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("seed"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        p => p.getField("m")).as("c"))
      .select(col("seed").as("list_id"), col("c"))
    // squared L2 = |v|^2 - 2 v.c + |c|^2; |v|^2 is per-row constant and
    // cancels in the argmin, so rank on (|c|^2 - 2 v.c).
    // Argmin via min_by over a (score, list_id) struct — lexicographic
    // struct ordering gives the same deterministic tie-break as the
    // former row_number window, but as a hash aggregate with MAP-SIDE
    // partial aggregation: the corpus-x-k joined rows reduce to one row
    // per vector before the shuffle, instead of sort-shuffling them all.
    val score = round(dot(col("c"), col("c")) - lit(2) * dot(col("v"), col("c")), 6)
    val assigned = e.join(broadcast(cent))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("list_id"), col("v")),
        struct(score.as("score"), col("list_id"))).as("best"))
      .select(col("vec_id"), col("best.list_id").as("list_id"), col("best.v").as("v"))
    assigned
      .select(col("list_id").as("cluster_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cluster_id"), col("dim"))
      .agg(round(avg(col("x")), 6).as("centroid_val"), count(lit(1)).as("n_assigned"))
      .select(col("cluster_id"), col("dim").cast("long").as("dim"),
        col("centroid_val"), col("n_assigned"))
  }

  /** Product-quantization ANN with ADC (asymmetric distance):
    *  - train: the 64-dim space splits into 8 subspaces of 8 dims;
    *    per-subspace codebooks (16 centroids) seeded from the label
    *    partition means — one scan + keyed agg;
    *  - encode: every vector maps to 8 one-byte codes (argmin per
    *    subspace) — a narrow broadcast map over the corpus; at scale
    *    the 64-byte vector compresses to 8 bytes;
    *  - search: per query, a 16x8 lookup table of query-to-centroid
    *    distances; approximate distance = sum of 8 LUT hits per
    *    corpus code row (keyed join, no vector math per pair);
    *  - re-rank: exact cosine on the top-10 ADC candidates only.
    * This is the standard IVF-PQ search shape minus the coarse stage
    * (composable with annIvfTopk's list pruning).
    */
  def annPqAdcTopk(s: SparkSession, d: String): DataFrame = {
    val nSub = 8
    val subDim = 8
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").as("v")) // raw float vecs: dot widens in-kernel, half the pair-join bytes

    // codebooks: per (code word k, subspace) mean subvector. The code
    // space is CAPPED at 16 words per subspace (label % 16 — identity
    // on the driver corpora, labels 0..9): PQ's whole point is a
    // fixed-size codebook (here 4-bit codes), and encode cost is
    // corpus x codebook — a codebook that grew with the corpus made
    // encoding quadratic (measured: 103x at a 10x scale-up).
    val cent = e
      .select(pmod(col("label"), lit(16)).as("kw"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("kw"), (col("dim") / subDim).cast("int").as("sub"),
        pmod(col("dim"), lit(subDim)).as("subdim"), col("x"))
      .groupBy(col("kw"), col("sub"), col("subdim")).agg(avg(col("x")).as("m"))
      .groupBy(col("kw").as("k"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("subdim"), col("m")))),
        p => p.getField("m")).as("c"))

    def subv(v: Column, sub: Column): Column = slice(v, sub * subDim + 1, lit(subDim))

    // encode: argmin_k |c|^2 - 2 x_sub . c per (vector, subspace), via
    // min_by for map-side partial aggregation (see embeddingKmeansStep).
    // The corpus first explodes to 8-dim SUBvectors so the x16-centroid
    // intermediate carries 8 doubles per row, not the full 64-dim
    // vector (8x narrower), and the centroid attach becomes an
    // equi-join on `sub` instead of a pure cross.
    // subvectors are sliced INSIDE one per-row transform and the narrow
    // 8-dim pieces posexploded (pos == the subspace index, since
    // transform preserves order) — the previous shape exploded the sub
    // indices first and sliced per generated row, carrying the full
    // 64-dim vector on all 8 subspace rows (8x the bytes through the
    // Generate; r13 guide §2.3)
    val vsub = e
      .select(col("vec_id"),
        posexplode(transform(sequence(lit(0), lit(nSub - 1)),
          sub => subv(col("v"), sub))).as(Seq("sub", "vs")))
    val encScore = round(dot(col("c"), col("c"))
      - lit(2) * dot(col("vs"), col("c")), 6)
    val codes = vsub.join(broadcast(cent), Seq("sub"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("k"), struct(encScore.as("score"), col("k"))).as("code"))

    // per-query LUT over the same score (query constant dropped)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("vq"))
    val lutScore = round(dot(col("c"), col("c"))
      - lit(2) * dot(subv(col("vq"), col("sub")), col("c")), 6)
    val lut = q.join(broadcast(cent))
      .select(col("qid"), col("sub"), col("k"), lutScore.as("d"))

    // ADC: sum the 8 LUT hits per (query, corpus vector). The corpus-
    // sized aggregate carries ONLY (qid, nid, dist), and the top-10
    // shortlist is a bounded-heap aggregate over it ((approx_dist, nid)
    // ascending is already the wanted order — no negation needed) —
    // the 64-dim query vector rejoins AFTER the shortlist (8x10 rows),
    // never riding a corpus-sized shuffle or sort.
    val candidates = codes
      .join(lut, codes("sub") === lut("sub") && codes("code") === lut("k"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("nid"))
      .agg(round(sum(col("d")), 6).as("approx_dist"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.collectTopK(
        struct(col("approx_dist"), col("nid")), 10, reverse = true).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.nid").as("nid"),
        col("t.approx_dist").as("approx_dist"))

    // exact re-rank of the shortlist
    val cos = round(cosine(col("vq"), col("v")), 6)
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    candidates
      .join(broadcast(q), Seq("qid"))
      .join(e.select(col("vec_id").as("nid"), col("v")), Seq("nid"))
      .select(col("qid"), col("nid"), col("approx_dist"), cos.as("cos"))
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nid"), col("approx_dist"), col("cos"), col("rn"))
  }

  /** Index-quality evaluation — recall@3 of each approximate index
    * (LSH buckets, IVF single-probe) against the brute-force ground
    * truth, the eval every ANN deployment runs before trusting a
    * sketch (sketch-eval symmetry with dedup_eval/simhash_eval). All
    * metrics are exact integers (hit counts, floor-ppm recall); the
    * ground truth and both candidate sets are the REGISTERED operators
    * re-invoked, so this evaluates exactly what ships. Cost: the eval
    * joins are on the tiny (nq x k) result sets — the corpus-sized
    * work is the three operator runs themselves.
    */
  def annEval(s: SparkSession, d: String, materialize: Boolean = true): DataFrame = {
    // each operator result is nq x k rows — pin them so the two
    // consumers (size agg + hit join) don't re-run the corpus-sized
    // operator (the skewDetect localCheckpoint pattern). materialize =
    // false is the lazy twin for plan linting (PlanGuardSpec).
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(true) else df
    val truth = pin(annBruteforceTopk(s, d).filter(col("rn") <= 3)
      .select(col("qid"), col("nid")))
    val truthAgg = truth.agg(count(lit(1)).as("n_truth"))
    def scoreOf(name: String, retrieved: DataFrame): DataFrame = {
      val r = pin(retrieved.select(col("qid"), col("nid")))
      r.agg(count(lit(1)).as("n_retrieved"))
        .crossJoin(broadcast(
          r.join(truth, Seq("qid", "nid")).agg(count(lit(1)).as("n_hits"))))
        .crossJoin(broadcast(truthAgg))
        .select(lit(name).as("method"), lit(3L).as("k"),
          col("n_truth"), col("n_retrieved"), col("n_hits"),
          // n_truth = 0 only on an empty corpus: recall is undefined
          // there, not a crash (EmptyInputSpec)
          when(col("n_truth") > 0,
            floor(col("n_hits") * lit(1000000L) / col("n_truth")))
            .otherwise(lit(null).cast("long")).as("recall_ppm"))
    }
    scoreOf("lsh", annLshTopk(s, d))
      .unionAll(scoreOf("ivf", annIvfTopk(s, d)))
      .unionAll(scoreOf("pq_adc", annPqAdcTopk(s, d)))
  }

  val queries: Map[String, Relational.Q] = Map(
    "ann_pq_adc_topk" -> (annPqAdcTopk _),
    "ann_bruteforce_topk" -> (annBruteforceTopk _),
    "ann_lsh_topk" -> (annLshTopk _),
    "ann_ivf_topk" -> (annIvfTopk _),
    "ann_eval" -> ((s, d) => annEval(s, d)),
    "embedding_kmeans_step" -> (embeddingKmeansStep _)
  )

  // plane literal as DuckDB list text; Double.toString round-trips.
  private def planeSql(j: Int): String =
    planes(j).map(_.toString).mkString("[", ", ", "]")

  private[operators] val bucketSql = (0 until NPlanes).map { j =>
    s"(CASE WHEN list_dot_product(v, ${planeSql(j)}::DOUBLE[]) > 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" + ")

  private val ivfSql =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (
      | SELECT label AS list_id, list(m ORDER BY dim) AS c FROM (
      |  SELECT label, dim, avg(x) AS m
      |  FROM (SELECT label, unnest(v) AS x,
      |        unnest(range(1, len(v) + 1)) AS dim FROM e)
      |  GROUP BY label, dim)
      | GROUP BY label),
      |qa AS (
      | SELECT qid, vq, list_id FROM (
      |  SELECT q.vec_id AS qid, q.v AS vq, cent.list_id,
      |   row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |    round(list_dot_product(q.v, cent.c)
      |     / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(cent.c, cent.c))), 6) DESC,
      |    cent.list_id) AS crn
      |  FROM e q, cent WHERE q.vec_id < 8)
      | WHERE crn = 1),
      |p AS (
      | SELECT qa.qid, b.vec_id AS nid, qa.list_id,
      |  round(list_dot_product(qa.vq, b.v)
      |   / (sqrt(list_dot_product(qa.vq, qa.vq)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      | FROM qa JOIN e b ON b.label = qa.list_id AND b.vec_id <> qa.qid),
      |r AS (SELECT qid, nid, list_id, cos,
      | row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM p)
      |SELECT qid, nid, list_id, cos, rn FROM r WHERE rn <= 3""".stripMargin

  private val kmeansSql =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (
      | SELECT seed AS list_id, list(m ORDER BY dim) AS c FROM (
      |  SELECT seed, dim, avg(x) AS m
      |  FROM (SELECT label % 16 AS seed, unnest(v) AS x,
      |        unnest(range(1, len(v) + 1)) AS dim FROM e)
      |  GROUP BY seed, dim)
      | GROUP BY seed),
      |scored AS (
      | SELECT e.vec_id, e.v, cent.list_id,
      |  round(list_dot_product(cent.c, cent.c)
      |   - 2 * list_dot_product(e.v, cent.c), 6) AS score
      | FROM e, cent),
      |assigned AS (
      | SELECT vec_id, v, list_id FROM (
      |  SELECT vec_id, v, list_id,
      |   row_number() OVER (PARTITION BY vec_id ORDER BY score, list_id) AS rn
      |  FROM scored) WHERE rn = 1)
      |SELECT list_id AS cluster_id, CAST(dim AS BIGINT) AS dim,
      | round(avg(x), 6) AS centroid_val, count(*) AS n_assigned
      |FROM (SELECT list_id, unnest(v) AS x,
      |      unnest(range(0, len(v))) AS dim FROM assigned)
      |GROUP BY list_id, dim""".stripMargin

  private val pqSql =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |dims AS (
      | SELECT label % 16 AS kw, unnest(v) AS x, unnest(range(0, len(v))) AS dim FROM e),
      |centd AS (
      | SELECT kw, CAST(dim // 8 AS INT) AS sub, dim % 8 AS subdim, avg(x) AS m
      | FROM dims GROUP BY 1, 2, 3),
      |cent AS (
      | SELECT kw AS k, sub, list(m ORDER BY subdim) AS c
      | FROM centd GROUP BY kw, sub),
      |codes AS (
      | SELECT vec_id, sub, k AS code FROM (
      |  SELECT e.vec_id, cent.sub, cent.k,
      |   round(list_dot_product(cent.c, cent.c)
      |    - 2 * list_dot_product(e.v[cent.sub*8+1 : cent.sub*8+8], cent.c), 6) AS score,
      |   row_number() OVER (PARTITION BY e.vec_id, cent.sub
      |    ORDER BY round(list_dot_product(cent.c, cent.c)
      |     - 2 * list_dot_product(e.v[cent.sub*8+1 : cent.sub*8+8], cent.c), 6), cent.k) AS rn
      |  FROM e, cent) WHERE rn = 1),
      |lut AS (
      | SELECT q.vec_id AS qid, q.v AS vq, cent.sub, cent.k,
      |  round(list_dot_product(cent.c, cent.c)
      |   - 2 * list_dot_product(q.v[cent.sub*8+1 : cent.sub*8+8], cent.c), 6) AS d
      | FROM e q, cent WHERE q.vec_id < 8),
      |adc AS (
      | SELECT qid, nid, approx_dist, vq,
      |  row_number() OVER (PARTITION BY qid ORDER BY approx_dist, nid) AS arn
      | FROM (
      |  SELECT l.qid, cd.vec_id AS nid, round(sum(l.d), 6) AS approx_dist,
      |   any_value(l.vq) AS vq
      |  FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.k = cd.code
      |  WHERE cd.vec_id <> l.qid
      |  GROUP BY l.qid, cd.vec_id)),
      |rr AS (
      | SELECT a.qid, a.nid, a.approx_dist,
      |  round(list_dot_product(a.vq, b.v)
      |   / (sqrt(list_dot_product(a.vq, a.vq)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      | FROM adc a JOIN e b ON b.vec_id = a.nid
      | WHERE a.arn <= 10)
      |SELECT qid, nid, approx_dist, cos, rn FROM (
      | SELECT qid, nid, approx_dist, cos,
      |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM rr)
      |WHERE rn <= 3""".stripMargin

  private val bfSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |p AS (
      | SELECT a.vec_id AS qid, b.vec_id AS nid,
      |  round(list_dot_product(a.v, b.v)
      |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      | FROM e a JOIN e b ON b.vec_id <> a.vec_id
      | WHERE a.vec_id < 8),
      |r AS (SELECT qid, nid, cos,
      | row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM p)
      |SELECT qid, nid, cos, rn FROM r WHERE rn <= 5""".stripMargin

  private val lshSql =
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

  // eval oracle: re-embed each method's full oracle SQL as a CTE
  // (DuckDB allows nested WITH in CTE bodies) evaluated once, join
  // against the brute-force truth, emit integer metrics
  private val annEvalSql: String = {
    def arm(name: String): String =
      s"""SELECT '$name' AS method, CAST(3 AS BIGINT) AS k,
         | (SELECT count(*) FROM truth) AS n_truth,
         | (SELECT count(*) FROM r_$name) AS n_retrieved,
         | (SELECT h FROM h_$name) AS n_hits,
         | CAST((1000000 * (SELECT h FROM h_$name))
         |  // (SELECT count(*) FROM truth) AS BIGINT) AS recall_ppm""".stripMargin
    def hits(name: String): String =
      s"""h_$name AS (
         | SELECT count(*) AS h FROM r_$name r
         | JOIN truth t ON t.qid = r.qid AND t.nid = r.nid)""".stripMargin
    s"""WITH truth AS (SELECT qid, nid FROM ($bfSql) WHERE rn <= 3),
       |r_lsh AS ($lshSql),
       |r_ivf AS ($ivfSql),
       |r_pq_adc AS ($pqSql),
       |${hits("lsh")},
       |${hits("ivf")},
       |${hits("pq_adc")}
       |${arm("lsh")}
       |UNION ALL
       |${arm("ivf")}
       |UNION ALL
       |${arm("pq_adc")}""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "ann_pq_adc_topk" -> pqSql,
    "embedding_kmeans_step" -> kmeansSql,
    "ann_ivf_topk" -> ivfSql,
    "ann_eval" -> annEvalSql,
    "ann_bruteforce_topk" -> bfSql,
    "ann_lsh_topk" -> lshSql
  )
}
