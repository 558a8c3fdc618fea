package graft.client

import java.io.{InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** HTTP content-codings of the ClickHouse HTTP interface (doc
  * §Compression): the server both emits (`enable_http_compression=1` +
  * `Accept-Encoding`) and accepts (`Content-Encoding` request bodies)
  * `gzip`, `lz4` (LZ4 frame format) and `zstd` alongside the identity
  * coding. LZ4 is the codec the reference pins on its native transport
  * (/root/reference/tests/common/helpers.rs:29,
  * src/connection.rs:107-178); carrying it here gives the HTTP transport
  * the same wire posture without a native driver. The codec
  * implementations come from Spark's own classpath (lz4-java, zstd-jni) —
  * no new dependencies.
  */
object HttpCodec {

  val Supported: Seq[String] = Seq("none", "gzip", "lz4", "zstd")

  /** Validate + lowercase a `compression` option value. Honored-or-
    * rejected: a coding this transport cannot speak errors at setup.
    */
  def normalize(compression: String): String = compression.toLowerCase match {
    case "" | "none" => "none"
    case c @ ("gzip" | "lz4" | "zstd") => c
    case other => throw new IllegalArgumentException(
      s"compression '$other' is not available on the ClickHouse HTTP interface " +
        s"through this transport (supported: ${Supported.mkString(", ")})")
  }

  /** Wrap an upstream (request-body) stream in the named coding. */
  def wrapOutput(codec: String, raw: OutputStream): OutputStream = codec match {
    case "none" => raw
    case "gzip" => new GZIPOutputStream(raw, 8192)
    // 256 KB frame blocks: insert bodies are write.batch_size-bounded
    // (~100s of KB), so the default 4 MB block buffer would be allocated
    // per call and mostly unused
    case "lz4" => new net.jpountz.lz4.LZ4FrameOutputStream(raw,
      net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_256KB)
    case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** Wrap a response stream per its `Content-Encoding` header (null/empty
    * = identity). Decodes ANY coding the server may choose, independent
    * of what this client requested — the header is authoritative.
    */
  def wrapInput(contentEncoding: String, raw: InputStream): InputStream =
    Option(contentEncoding).map(_.trim.toLowerCase).getOrElse("") match {
      case "" | "identity" => raw
      case "gzip" => new GZIPInputStream(raw)
      case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(raw)
      case "zstd" => new com.github.luben.zstd.ZstdInputStream(raw)
      case other => throw new IllegalArgumentException(
        s"server sent unsupported Content-Encoding: $other")
    }
}
