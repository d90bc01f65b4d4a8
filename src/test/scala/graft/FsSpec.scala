package graft

import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem masquerading under a scheme graft does NOT trust
  * for atomic create/rename — the spec handle for the capability probe
  * (VERDICT r13 #2: the object-store caveat must surface at runtime,
  * not live in comments). */
class MockNonAtomicFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

class FsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.core.Fs

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("withLock release is ownership-checked: a lock replaced mid-run " +
       "(lease takeover) is LEFT for its new holder, never deleted " +
       "(ADVICE r13)") {
    val lock = s"${tmp("fs_own")}/_delta_lock"
    Fs.withLock(spark, lock, "noop") {
      // simulate a lease claimer taking the lock over mid-run: our file
      // is replaced by another writer's
      Fs.removeLock(spark, lock)
      assert(Fs.tryCreateLock(spark, lock,
        s"owner=takeover-writer ts=${System.currentTimeMillis}"))
      1
    }
    // the old finally-path unconditionally deleted whatever lock file was
    // present — the new holder's lock must survive our release
    val payload = Fs.readSmall(spark, lock)
    assert(payload.exists(_.contains("takeover-writer")),
      s"release deleted another writer's lock: $payload")
    Fs.removeLock(spark, lock)
  }

  test("tryClaimRename consumes the src: of N racing stale-lock " +
       "claimers exactly ONE wins (ADVICE r13 TOCTOU)") {
    val d = tmp("fs_claim")
    val lock = s"$d/_delta_lock"
    assert(Fs.tryCreateLock(spark, lock, "owner=crashed ts=1"))
    assert(Fs.tryClaimRename(spark, lock, s"$lock.stale-a"),
      "first claimer must win")
    assert(!Fs.tryClaimRename(spark, lock, s"$lock.stale-b"),
      "second claimer must lose: the src was consumed by the first")
    assert(Fs.readSmall(spark, s"$lock.stale-a").contains("owner=crashed ts=1"))
    assert(!Fs.exists(spark, lock))
  }

  test("stale-lock takeover under a lease goes through claim-by-rename " +
       "and releases cleanly; a malformed ts= payload degrades to 'age " +
       "unknown' instead of throwing (ADVICE r13)") {
    val d = tmp("fs_lease")
    val lock = s"$d/_delta_lock"
    assert(Fs.tryCreateLock(spark, lock,
      s"owner=crashed ts=${System.currentTimeMillis - 60_000L}"))
    val r = Fs.withLock(spark, lock, "re-run", leaseMs = 30_000L) { 42 }
    assert(r == 42)
    assert(!Fs.exists(spark, lock), "takeover leaked the lock")
    // no tombstone leaked either
    val leftovers = new java.io.File(d).listFiles().map(_.getName).toSeq
    assert(!leftovers.exists(_.contains("stale")),
      s"takeover leaked a tombstone: $leftovers")
    // malformed timestamp: the loud holder-naming diagnostic survives
    assert(Fs.tryCreateLock(spark, lock, "owner=hand-edited ts=abc"))
    val e = intercept[IllegalStateException] {
      Fs.withLock(spark, lock, "re-run", leaseMs = 1L) { 1 }
    }
    assert(e.getMessage.contains("hand-edited"),
      s"holder not named: ${e.getMessage}")
    assert(e.getMessage.contains("age unknown"),
      s"malformed ts must read as 'age unknown': ${e.getMessage}")
    Fs.removeLock(spark, lock)
  }

  test("capability probe: a scheme without atomic create/rename is " +
       "REFUSED naming the weakened guarantees, waivable by conf, " +
       "extendable via spark.graft.atomicSchemes (VERDICT r13 #2)") {
    spark.sparkContext.hadoopConfiguration.set("fs.mock.impl",
      classOf[MockNonAtomicFileSystem].getName)
    val dir = s"mock://${tmp("fs_probe")}"
    assert(Fs.atomicStore(spark, "/any/local/path"),
      "file:// must count as atomic")
    assert(!Fs.atomicStore(spark, dir))
    val e = intercept[IllegalStateException] {
      Fs.requireAtomicStore(spark, dir, "specProbe")
    }
    for (must <- Seq("'mock'", "lock", "pointer", "allowNonAtomicStore",
                     "specProbe"))
      assert(e.getMessage.contains(must),
        s"probe message must name $must: ${e.getMessage}")
    // the lock protocol itself refuses on such a store
    val e2 = intercept[IllegalStateException] {
      Fs.withLock(spark, s"$dir/_delta_lock", "noop") { 1 }
    }
    assert(e2.getMessage.contains("'mock'"))
    // explicit waiver: proceeds (loud warning on stderr)
    spark.conf.set("spark.graft.allowNonAtomicStore", "true")
    try Fs.requireAtomicStore(spark, dir, "specProbe")
    finally spark.conf.unset("spark.graft.allowNonAtomicStore")
    // a deployment that KNOWS its store guarantees both primitives can
    // extend the trusted set instead of waiving the check
    spark.conf.set("spark.graft.atomicSchemes", "weird, mock")
    try assert(Fs.atomicStore(spark, dir))
    finally spark.conf.unset("spark.graft.atomicSchemes")
    assert(!Fs.atomicStore(spark, dir))
  }
}
