package graft.client

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Inter-PROCESS mutual exclusion for gate-store builds.
  *
  * ensureStore's verify+drop+rebuild was only `synchronized` — JVM-local.
  * Two concurrent graft JVMs sharing `target/` (a correctness run
  * overlapping a bench run) could interleave one JVM's DROP → CREATE →
  * INSERT with the other's verification scan: the scanner sees a
  * half-built table, declares a mismatch, and starts its own rebuild
  * into the first JVM's half-finished one. An OS file lock around every
  * verify+rebuild serializes builders across processes: the second
  * process acquires the lock only after the first published a complete
  * store, re-verifies, finds it clean, and touches nothing — so reused
  * stores see no mtime churn and no process ever builds over another.
  *
  * (Readers that verified earlier in their own JVM are safe by the same
  * argument: a verified store only gets rebuilt when its content stops
  * matching the corpus derivation, which a competing CLEAN build never
  * causes.)
  *
  * JVM-LOCAL callers must already hold their own monitor (ensureStore is
  * `synchronized`): `FileChannel.lock` throws OverlappingFileLockException
  * on same-JVM contention rather than blocking.
  */
object StoreLock {

  private val lockDir = Paths.get(
    sys.props.getOrElse("graft.store.lockdir", "/root/repo/target/.locks"))

  /** Lock file for a named store (caller picks a stable name per store
    * table-set, e.g. the ensureStore memo key).
    */
  def lockFileFor(name: String): Path = {
    val safe = java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes("UTF-8")).map("%02x".format(_)).mkString
    lockDir.resolve(s"$safe.lock")
  }

  /** Run `f` holding an exclusive OS lock on `lockFile` (blocks until
    * any other PROCESS releases it).
    */
  def withLock[T](lockFile: Path)(f: => T): T = {
    Files.createDirectories(lockFile.getParent)
    val ch = FileChannel.open(lockFile,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try f finally lock.release()
    } finally ch.close()
  }

  def withLockNamed[T](name: String)(f: => T): T = withLock(lockFileFor(name))(f)
}
