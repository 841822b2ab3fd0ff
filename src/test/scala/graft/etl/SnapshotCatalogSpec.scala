package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** The transactional contract of SnapshotCatalog: multi-table
  * atomicity (both new versions or neither), crash-before-pointer
  * recovery, carry-forward of unchanged tables, pinned-snapshot
  * isolation under concurrent commits (a reader loop asserting a
  * cross-table invariant while a writer churns), and vacuum never
  * deleting files a retained snapshot references.
  */
class SnapshotCatalogSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = new java.io.File(s"target/snapcat_spec/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getPath
  }

  private def facts(n: Int) =
    (1 to n).map(i => (i.toLong, s"k$i", i * 10L)).toDF("id", "k", "amount")

  // a summary that MUST agree with its fact table — the cross-table
  // invariant a torn commit would violate
  private def summary(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n_rows"), sum(col("amount")).as("total"))

  test("multi-table commit: upsert exposes both new versions or neither") {
    val cat = new SnapshotCatalog(freshDir("atomic"))
    val f1 = facts(4)
    cat.commit(Map("fact" -> f1, "summary" -> summary(f1)))
    val s1 = cat.snapshot()
    assert(s1.read(spark, "fact").count() == 4)
    assert(s1.read(spark, "summary").select("n_rows").as[Long].head() == 4)

    // cdc-merge-shaped second commit: fact grows AND summary changes
    val f2 = facts(7)
    cat.commit(Map("fact" -> f2, "summary" -> summary(f2)))
    // the PINNED old snapshot still reads the OLD pair, consistently
    assert(s1.read(spark, "fact").count() == 4)
    assert(s1.read(spark, "summary").select("n_rows").as[Long].head() == 4)
    // a new resolve sees the NEW pair, consistently
    val s2 = cat.snapshot()
    assert(s2.read(spark, "fact").count() == 7)
    assert(s2.read(spark, "summary").select("n_rows").as[Long].head() == 7)
  }

  test("crash before the pointer swap leaves the old snapshot served") {
    val root = freshDir("crash")
    val cat = new SnapshotCatalog(root)
    cat.commit(Map("fact" -> facts(3), "summary" -> summary(facts(3))))
    // simulate a commit killed AFTER data + manifest, BEFORE the swap:
    // write v=2 dirs and m=2.json by hand, leave _latest at 1
    facts(9).write.mode("overwrite").parquet(s"$root/fact/v=2")
    summary(facts(9)).write.mode("overwrite").parquet(s"$root/summary/v=2")
    Files.write(Paths.get(root, "_manifests/m=2.json"),
      "{\n  \"fact\": 2,\n  \"summary\": 2\n}".getBytes("UTF-8"))
    val s = cat.snapshot()
    assert(s.id == 1, "torn commit must stay invisible")
    assert(s.read(spark, "fact").count() == 3)
    // the writer re-runs: versions advance PAST the orphans (the
    // manifest counter resumes from _latest-visible state only after
    // the orphan manifest is ignored — id 2 gets rewritten)
    val k = cat.commit(Map("fact" -> facts(5), "summary" -> summary(facts(5))))
    assert(k == 2)
    assert(cat.snapshot().read(spark, "fact").count() == 5)
  }

  test("unchanged tables carry forward across commits") {
    val cat = new SnapshotCatalog(freshDir("carry"))
    cat.commit(Map("fact" -> facts(3), "dim" -> Seq((1L, "x")).toDF("id", "name")))
    cat.commit(Map("fact" -> facts(6))) // dim untouched
    val s = cat.snapshot()
    assert(s.tables == Map("fact" -> 2, "dim" -> 1))
    assert(s.read(spark, "dim").count() == 1)
  }

  test("concurrent reader never observes a torn fact/summary pair") {
    val root = freshDir("concurrent")
    val cat = new SnapshotCatalog(root)
    val f0 = facts(2)
    cat.commit(Map("fact" -> f0, "summary" -> summary(f0)))
    @volatile var torn: Option[String] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && torn.isEmpty) {
        val s = cat.snapshot() // resolve ONCE, then read both tables
        val n = s.read(spark, "fact").count()
        val m = s.read(spark, "summary").select("n_rows").as[Long].head()
        if (n != m) torn = Some(s"snapshot ${s.id}: fact=$n summary=$m")
      }
    })
    reader.start()
    try {
      (3 to 12).foreach { n =>
        val f = facts(n)
        cat.commit(Map("fact" -> f, "summary" -> summary(f)))
      }
    } finally { stop = true; reader.join(30000) }
    assert(torn.isEmpty, torn.getOrElse(""))
  }

  test("vacuum keeps every file a retained snapshot references") {
    val root = freshDir("vacuum")
    val cat = new SnapshotCatalog(root)
    (1 to 5).foreach { n =>
      val f = facts(n)
      cat.commit(Map("fact" -> f, "summary" -> summary(f)))
    }
    val pinned = cat.snapshotAt(4) // will be retained by keep=2
    cat.vacuum(keep = 2)
    // retained snapshots read fine
    assert(pinned.read(spark, "fact").count() == 4)
    assert(cat.snapshot().read(spark, "fact").count() == 5)
    // dropped manifests and their unreferenced v-dirs are gone
    intercept[java.nio.file.NoSuchFileException] { cat.manifest(2) }
    assert(!new java.io.File(s"$root/fact/v=2").exists(),
      "unreferenced v-dir must be deleted")
  }
}
