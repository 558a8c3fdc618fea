package graft.client

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Leak-safe NIO directory traversal. `Files.list`/`Files.walk` return
  * streams backed by an OPEN DIRECTORY FD that only `close()` releases —
  * draining the iterator does not. On the insert hot path (one staging
  * dir per block) the leaked fds accumulate at blocks-per-insert rate and
  * a long ingest run hits the process fd ceiling (surfaced as
  * `IOException: error=24, Too many open files` from the 5M-row × batch
  * 5K InsertBench sweep). Listings here are small (parts of one table,
  * spill files of one query), so materializing is the right trade.
  */
private[client] object NioFiles {

  def list(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator.asScala.toSeq finally s.close()
  }

  def walk(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator.asScala.toSeq finally s.close()
  }
}
