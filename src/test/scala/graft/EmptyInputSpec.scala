package graft

/** Empty-input totality: every registered query must execute (not
  * necessarily return rows) against a corpus with the right SCHEMAS
  * but ZERO rows. On a real cluster empty inputs are routine — a new
  * landing partition, a filter that matched nothing, a fresh tenant —
  * and an operator that throws on them turns a no-op into a paged
  * incident. Divide-by-zero, head-on-empty, min/max-of-nothing and
  * require()-style certificates are the usual suspects this catches.
  */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query executes on a zero-row corpus") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        }
    }
    assert(offenders.isEmpty,
      s"queries failing on empty input (${offenders.size}):\n" +
        offenders.mkString("\n"))
  }
}
