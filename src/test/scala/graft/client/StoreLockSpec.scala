package graft.client

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Two-PROCESS exclusion for gate-store builds: a spawned JVM holds the
  * store lock while this JVM's [[StoreLock.withLock]] must block until
  * release — the race ensureStore closes (a bench run's build
  * interleaving with a verify run's verification scan).
  */
object LockProbe {
  /** args: lockFile readyFile holdMillis — acquire, signal, hold, exit. */
  def main(args: Array[String]): Unit = {
    val Array(lock, ready, holdMs) = args
    StoreLock.withLock(Paths.get(lock)) {
      Files.writeString(Paths.get(ready), "held")
      Thread.sleep(holdMs.toLong)
    }
  }
}

class StoreLockSpec extends AnyFunSuite {

  test("a second PROCESS blocks on the store lock until the holder releases") {
    val dir = Files.createTempDirectory("graft_lock_")
    val lock = dir.resolve("store.lock")
    val ready = dir.resolve("ready")
    val holdMs = 1500L
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val p = new ProcessBuilder(
      java, "-cp", sys.props("java.class.path"),
      "graft.client.LockProbe", lock.toString, ready.toString, holdMs.toString)
      .inheritIO().start()
    try {
      // wait for the child to signal it HOLDS the lock
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!Files.exists(ready) && System.nanoTime() < deadline) Thread.sleep(20)
      assert(Files.exists(ready), "child process never acquired the lock")
      val t0 = System.nanoTime()
      StoreLock.withLock(lock) { () }
      val waitedMs = (System.nanoTime() - t0) / 1e6
      // we must have blocked for (most of) the child's hold window — a
      // non-blocking lock would return in microseconds
      assert(waitedMs >= holdMs * 0.4,
        s"second process did not block on the held lock (waited ${waitedMs}ms)")
      assert(p.waitFor() == 0)
    } finally {
      p.destroyForcibly()
      ()
    }
  }

  test("same-name locks map to one file; different names do not collide") {
    assert(StoreLock.lockFileFor("a::t1,t2") == StoreLock.lockFileFor("a::t1,t2"))
    assert(StoreLock.lockFileFor("a::t1,t2") != StoreLock.lockFileFor("b::t1,t2"))
  }

  test("withLock is exception-safe: the lock is free again after a throw") {
    val dir = Files.createTempDirectory("graft_lock_")
    val lock = dir.resolve("x.lock")
    intercept[RuntimeException] {
      StoreLock.withLock(lock)(throw new RuntimeException("boom"))
    }
    // re-acquirable immediately (a leaked FileLock/channel would throw
    // OverlappingFileLockException or block)
    assert(StoreLock.withLock(lock)(42) == 42)
  }
}
