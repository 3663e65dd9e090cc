package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog._
import graft.write._

/** Concurrent writers on the new overwrite paths: the snapshot CAS must
  * serialize them so both land (or one fails loudly), never silently
  * losing either side's rows. */
class ConcurrentOverwriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two dynamic overwrites of disjoint partitions both commit") {
    val wh = Files.createTempDirectory("graft-cdyn-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "p",
      Seq(Seq((1L, "a", "old"), (2L, "b", "old"), (3L, "c", "old"))
        .toDF("id", "grp", "v")),
      Append, WriteConfig(retryUnitMs = 1,
        partitions = Seq(graft.partition.PartitionHint.identity("grp"))), "l1")

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def submit(grp: String, id: Long) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        new GraftWriter(cat).overwriteDynamic("main", "p",
          Seq((id, grp, s"new-$grp")).toDF("id", "grp", "v"),
          WriteConfig(retryUnitMs = 1), s"dyn-$grp")
      }
    })
    val fa = submit("a", 10L)
    val fb = submit("b", 11L)
    start.countDown()
    fa.get(120, TimeUnit.SECONDS); fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()

    val got = cat.loadTable("main", "p").read()
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((3L, "c", "old"),
      (10L, "a", "new-a"), (11L, "b", "new-b")), got.toSeq)
    // two overwrite snapshots landed (plus the initial append)
    assert(cat.loadTable("main", "p").metadata.snapshots
      .count(_.operation == "overwrite") == 2)
  }

  test("REPLACE WHERE racing a rewrite of its target either retries or refuses") {
    val wh = Files.createTempDirectory("graft-cow2-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq((1 to 100).map(i => (i.toLong, "old")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    // a compaction (content-neutral rewrite) lands between planning and
    // commit often enough under the tiny retry unit; run both
    // concurrently and accept either a clean success or the documented
    // loud refusal — NEVER a silent row loss
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val ow = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try new GraftWriter(cat).overwriteWhere("main", "t",
          col("id") > 50, Seq((200L, "new")).toDF("id", "v"),
          WriteConfig(retryUnitMs = 1), "ow1")
        catch { case _: ValidationError => () } // documented refusal
      }
    })
    val cp = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try Maintenance.compact(cat.loadTable("main", "t"),
          smallFileBytes = 1L << 30, targetFileBytes = 1L << 30,
          retryUnitMs = 1)
        catch { case _: ValidationError => () }
      }
    })
    start.countDown()
    ow.get(120, TimeUnit.SECONDS); cp.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val ids = cat.loadTable("main", "t").read()
      .select("id").collect().map(_.getLong(0)).sorted
    // either outcome preserves 1..50; rows 51..100 are gone iff the
    // overwrite won, in which case 200 is present
    assert(ids.take(50).toSeq == (1L to 50L))
    val owApplied = ids.contains(200L)
    if (owApplied) assert(ids.toSeq == (1L to 50L) :+ 200L, ids.toSeq)
    else assert(ids.toSeq == (1L to 100L), ids.toSeq)
  }

  test("REPLACE WHERE replaces rows appended concurrently during planning (serializable overwrite-by-filter)") {
    val wh = Files.createTempDirectory("graft-cow3-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq((1 to 100).map(i => (i.toLong, "old")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")

    // the afterPlanning seam lands a conflicting append EXACTLY inside
    // the planning/commit window — the case where an unvalidated
    // overwrite would leave the appended matching rows behind (they are
    // in neither its planned target set nor its new batch). Serializable
    // history is append -> overwrite, so they MUST be replaced.
    new GraftWriter(cat).overwriteWhereImpl("main", "t",
      col("id") > 50, Seq((200L, "new")).toDF("id", "v"),
      WriteConfig(retryUnitMs = 1), "ow-race",
      afterPlanning = () =>
        w.writeTable("main", "t",
          Seq((150 to 160).map(i => (i.toLong, "late")).toDF("id", "v")),
          Append, WriteConfig(retryUnitMs = 1), "late-append"))

    val m = cat.loadTable("main", "t").metadata
    val appendId = m.snapshots.find(_.loadId.contains("late-append")).get.snapshotId
    val owId = m.snapshots.find(_.loadId.contains("ow-race")).get.snapshotId
    assert(appendId < owId, "test premise: append committed first")
    val got = cat.loadTable("main", "t").read().collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == (1L to 50L).map((_, "old")) :+ ((200L, "new")),
      s"appended matching rows must be replaced by the later overwrite: " +
        got.filter(_._2 == "late").mkString(","))
    // and a NON-matching concurrent append survives untouched
    new GraftWriter(cat).overwriteWhereImpl("main", "t",
      col("id") > 300, Seq((400L, "new2")).toDF("id", "v"),
      WriteConfig(retryUnitMs = 1), "ow-race2",
      afterPlanning = () =>
        w.writeTable("main", "t",
          Seq(Seq((20L, "low")).toDF("id", "v")),
          Append, WriteConfig(retryUnitMs = 1), "late-low"))
    val ids2 = cat.loadTable("main", "t").read().collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(ids2.count(_ == (20L, "low")) == 1 && ids2.contains((400L, "new2")))
  }
}
