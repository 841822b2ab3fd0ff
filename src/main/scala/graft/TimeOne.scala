package graft

import org.apache.spark.sql.SparkSession

/** Targeted timing harness: `runMain graft.TimeOne <dir> <query>...`
  * times each named query (2 runs, prints both — paired A/B runs are
  * the only meaningful comparison on a shared box, see docs/PLANS.md).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for paired A/B config experiments, e.g.
    // SPARK_GRAFT_CONF='spark.sql.join.preferSortMergeJoin=false;k=v'
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('=')
        builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // match Bench's lane policy on request: consumer-query A/Bs should
    // measure the algorithm over a WARM lane (the build is the
    // lane-defining queries' cost), so SPARK_GRAFT_PREWARM=1 builds
    // all lanes before any timer starts
    if (sys.env.get("SPARK_GRAFT_PREWARM").contains("1"))
      try graft.operators.Lanes.prewarm(spark, dir)
      catch { case _: Throwable => }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // toRdd.count() forces every output column; Dataset.count()
        // lets Catalyst prune pure projections down to a row-count
        // scan (see Bench.timeOnce)
        val c = fn(spark, dir).queryExecution.toRdd.count()
        println(f"[time] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
        // see Bench.drainCaches: leftover localCheckpoint blocks make
        // later runs measure heap pressure, not the plan. BLOCKING,
        // after the timer is read: an async drain runs during the NEXT
        // timed window and charges this query's cleanup to it (the r8
        // importance_resample incident)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        // optional settle window for ContextCleaner's async thread
        sys.env.get("SPARK_GRAFT_SETTLE_MS").foreach(ms => Thread.sleep(ms.toLong))
      }
    }
    spark.stop()
  }
}
