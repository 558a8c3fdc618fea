package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media travel
  * as opaque `binary` payloads with a typed metadata struct alongside;
  * decode / feature-extraction / frame-sampling run as partition-local
  * batch transforms.
  *
  * The ACTUAL decoders are stubbed (this container ships no image/audio
  * codecs): [[StubDecoder]] produces deterministic fake decodes from the
  * payload hash, so schemas, batching, partitioning, and determinism are
  * all real and tested while `decodeImage` is a swap-in point for an
  * ImageIO/ffmpeg-backed implementation.
  *
  * Scale notes: every transform here is a narrow `mapPartitions` — no
  * shuffle, constant memory (iterator in, iterator out, no partition
  * materialization), codec state created once per partition (the
  * expensive part of real decoders) rather than per row.
  */
object Multimodal {

  /** Canonical media-row schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  final case class DecodedImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Swap-in point for a real codec. Implementations must be
    * deterministic and partition-safe (one instance per partition).
    */
  trait MediaDecoder extends Serializable {
    def decodeImage(payload: Array[Byte]): DecodedImage
  }

  /** Deterministic fake: dimensions and pixel sample derived from the
    * payload md5 — stands in for a real header parse + decode.
    */
  object StubDecoder extends MediaDecoder {
    override def decodeImage(payload: Array[Byte]): DecodedImage = {
      val h = MessageDigest.getInstance("MD5").digest(payload)
      def u(i: Int): Int = h(i) & 0xff
      val w = 64 + ((u(0) << 8 | u(1)) % 512)
      val ht = 64 + ((u(2) << 8 | u(3)) % 512)
      DecodedImage(w, ht, 3, h.take(8))
    }
  }

  /** Wrap an id + binary column (+ source metadata) into the canonical
    * media shape.
    */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kind: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(kind).as("kind"),
        col(sourceCol).cast("string").as("source"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  private val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixel_sample", BinaryType, nullable = true)))

  /** Batch-decode a media table: partition-local, iterator-to-iterator
    * (constant memory), decoder instantiated once per partition.
    */
  def decodeImages(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    val enc = ExpressionEncoder(decodedSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = enc
    media.mapPartitions { it =>
      it.map { r =>
        val d = decoder.decodeImage(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), d.width, d.height, d.channels, d.pixels)
      }
    }
  }

  /** Per-payload byte-histogram feature vector (16 buckets, L1-normed) —
    * a real feature-extraction pass (no stub): array<double> output ready
    * for the ANN/similarity kernels.
    */
  def byteHistogramFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = enc
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val hist = new Array[Double](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
        val n = math.max(1.0, bytes.length.toDouble)
        Row(r.getLong(idIdx), hist.map(_ / n).toSeq)
      }
    }
  }

  /** Media validation / quarantine — the data-quality pass a pipeline
    * runs BEFORE spending decode cycles: size bounds, a caller-supplied
    * magic-byte predicate (the header sniff), NULL/empty detection.
    * Pure column expressions (codegen'd, narrow, no shuffle); first
    * matching reason wins, in severity order. Returns
    * (media_id, n_bytes, reason, status) where status is
    * keep | quarantine — downstream stages filter on it, the quarantine
    * stream lands in a side table with its reason for triage.
    */
  def quarantine(
      media: DataFrame, minBytes: Long, maxBytes: Long,
      magicOk: org.apache.spark.sql.Column): DataFrame = {
    val nb = length(col("payload")).cast("long")
    val reason = when(col("payload").isNull, "null_payload")
      .when(nb === 0L, "empty")
      .when(nb < minBytes, "too_small")
      .when(nb > maxBytes, "too_large")
      .when(!magicOk, "bad_magic")
      .otherwise("ok")
    media.select(col("media_id"), nb.as("n_bytes"), reason.as("reason"))
      .withColumn("status",
        when(col("reason") === "ok", "keep").otherwise("quarantine"))
  }

  /** The keep condition of [[quarantine]] as a single predicate over the
    * media shape — for pipelines that only need the keep STREAM (payload
    * included), filtering directly is one narrow pass instead of deriving
    * the (id, status) table and semi-joining the payload back (two scans
    * + a join; optimization r17, guide §2.4). Kept in lockstep with
    * [[quarantine]] for EVERY input, including a NULL magic check:
    * quarantine's `when(!magicOk, ...)` arm skips on NULL (falls through
    * to keep), so the conjunct here is coalesce(magicOk, true) — keep ⟺
    * payload non-null AND minBytes ≤ n_bytes ≤ maxBytes AND NOT
    * (magicOk IS FALSE) (OpsSpec pins set equality of the two routes,
    * including a NULL-magic row).
    */
  def keepPredicate(minBytes: Long, maxBytes: Long,
      magicOk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    col("payload").isNotNull &&
      length(col("payload")).cast("long").between(minBytes, maxBytes) &&
      coalesce(magicOk, lit(true))

  /** 16-bit SimHash over BYTE shingles of the payload — the d04 text
    * kernel's law applied to opaque media bytes, so payload-level
    * near-dup composes with the [[quarantine]] output (run it on the
    * `keep` stream; VERDICT r14 item 5: a 100 TB multimodal corpus
    * needs payload near-dup, not just text-column dedup).
    *
    * Law (DuckDB-mirrorable): shingle j is the `shingleBytes`-byte
    * window at byte offset j*stride, for j in [0, ceil(n/stride));
    * ragged tails stay (same slicing family as [[sampleFrames]]). Each
    * shingle fingerprints as lowercase-hex md5; bit p of the simhash is
    * the majority vote of hex nibble p's high bit across shingles (the
    * exact d04 formulation — `substr(md5, p+1, 1) >= '8'`).
    *
    * Scale shape: the 16 votes aggregate MAP-SIDE in one pass over the
    * shingle stream (16 sum columns, no 16x row explosion), so the only
    * shuffle is one combinable groupBy keyed on media_id — rows per
    * group bounded by 16 longs regardless of payload size. Grouping on
    * the resulting simhash is the bucket step; no all-pairs join exists
    * anywhere (OpsSpec pins the plan shape).
    */
  def payloadSimhash(
      media: DataFrame, shingleBytes: Int, stride: Int): DataFrame = {
    require(shingleBytes > 0 && stride > 0, "shingleBytes/stride must be positive")
    val nSh = (length(col("payload")) + stride - 1) / stride
    val shingles = media
      .filter(col("payload").isNotNull && length(col("payload")) > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), (nSh - 1).cast("int"), lit(1))).as("i"),
        col("payload"))
      .select(col("media_id"),
        md5(col("payload").substr(col("i") * stride + 1, lit(shingleBytes))).as("th"))
    val voteCols = (0 until 16).map { p =>
      sum(when(substring(col("th"), p + 1, 1) >= "8", 1).otherwise(-1)).as(s"v$p")
    }
    val votes = shingles.groupBy("media_id").agg(voteCols.head, voteCols.tail: _*)
    val packed = (0 until 16)
      .map(p => when(col(s"v$p") > 0, lit(1L << p)).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("media_id"), packed.as("simhash"))
  }

  /** Fixed-stride frame sampling over a "video" payload: emits every
    * `frameSize`-byte slice at `stride` frames — pure column expressions
    * (posexplode over a computed index sequence), fully codegen'd.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = (length(col("payload")) + frameSize - 1) / frameSize
    media
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(0), (nFrames - 1).cast("int"), lit(stride))).as(Seq("pos", "idx")))
      .select(col("media_id"), col("idx").as("frame_idx"),
        col("payload").substr(col("idx") * frameSize + 1, lit(frameSize)).as("frame"))
  }
}
