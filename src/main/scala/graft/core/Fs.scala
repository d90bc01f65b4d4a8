package graft.core

import org.apache.spark.sql.SparkSession

/** Filesystem operations for artifact directories, resolved through the
  * Hadoop `FileSystem` API so they hold on ANY storage a deployment points
  * them at (hdfs://, s3a://, file:/...), not just the local disk —
  * `java.io.File` silently answers "false"/"fails" for every remote URI,
  * which turned existence checks on saved artifacts into wrong-branch
  * decisions (ADVICE r11: addToSavedIvfPq appended PLAIN parquet under a
  * bucketed table's LOCATION on remote storage; saveSeenDelta rejected a
  * valid artifact). */
object Fs {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Does `path` exist on its own filesystem? */
  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** Atomically create an empty lock file; false if it already exists.
    * HDFS/local `create(overwrite = false)` is atomic; object stores
    * without atomic create (plain S3) make this best-effort — the lock
    * then narrows, not closes, the concurrent-writer window (documented
    * at the call sites; the loud-failure contract is unchanged). */
  def tryCreateLock(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    try { f.create(p, false).close(); true }
    catch {
      case _: java.io.IOException => false // exists (or raced the create)
    }
  }

  /** Remove a lock file created by [[tryCreateLock]]. */
  def removeLock(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    f.delete(p, false)
  }

  /** Run `f` holding an exclusive artifact lock, failing LOUDLY if another
    * writer holds it (VERDICT r11 #4: concurrent artifact deltas are
    * last-writer-wins on derived state — the losing delta's Bloom bits
    * vanish while both hash appends land, i.e. false negatives at the
    * prune with nothing downstream to catch them; the only safe contract
    * is single-writer, enforced rather than assumed). `recovery` names the
    * repair path for a stale lock left by a crashed writer. */
  def withLock[T](spark: SparkSession, lockPath: String,
                  recovery: String)(f: => T): T = {
    if (!tryCreateLock(spark, lockPath))
      throw new IllegalStateException(
        s"artifact delta lock held: $lockPath exists. Deltas are " +
          "single-writer (concurrent writers would silently lose filter " +
          s"bits). If a previous writer crashed, delete the lock and " +
          s"$recovery, then retry.")
    try f finally removeLock(spark, lockPath)
  }
}
