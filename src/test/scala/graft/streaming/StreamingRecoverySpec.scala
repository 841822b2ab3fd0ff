package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint-recovery / exactly-once contract of the file-to-file
  * streaming path: a stream restarted against the SAME checkpoint must
  * process ONLY files that arrived since the last run — no reprocessed
  * rows, no gaps — so a crashed ingest job resumes without a dedup
  * pass. This is the property that makes the landing-dir pattern
  * (events dropped as parquet files, stream picks them up) safe to
  * operate at scale.
  */
class StreamingRecoverySpec extends SparkTestBase {

  test("restarted stream with the same checkpoint processes only new files") {
    val root = java.nio.file.Files.createTempDirectory("graft_recovery").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val cp = s"$root/cp"
    new java.io.File(src).mkdirs()

    // four single-file slices of the events table
    val slices = s"$root/slices"
    graft.Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(slices)
    val files = new java.io.File(slices).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4)
    def land(n: Int): Unit = files.take(n).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(src, f.getName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val schema = graft.Tables.events(spark, sf).schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .filter(col("value") >= 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // stage 1: two files land, stream runs and stops
    land(2)
    runOnce()
    val after2 = spark.read.parquet(out).count()
    val expect2 = spark.read.parquet(files.take(2).map(_.getPath): _*).count()
    assert(after2 == expect2, s"stage 1: $after2 != $expect2")

    // stage 2: two more files land; SAME checkpoint, new run
    land(4)
    runOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "user_id", "event_type", "value")
    val expected = spark.read.parquet(slices)
      .filter(col("value") >= 0)
      .select("event_id", "user_id", "event_type", "value")
    // exactly once: no duplicates (stage-1 files not reprocessed), no gaps
    assert(got.count() == expected.count(),
      s"row count after restart: ${got.count()} != ${expected.count()}")
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }
}
