package graft

import org.apache.spark.sql.types.{DataType, StructType}

/** A/B for the columnar-vs-resumable read trade on replica catalogs.
  * Batch reads on a [[graft.client.ResumableReplicaHandle]] ride the
  * NATIVE vector decode with group-aligned delivery (ResumableBatchRead
  * carries each batch's tail cursor group as row copies); this bench
  * guards that path's overhead staying in the noise. Round-10 finding:
  * the round-9 "1.41x row-pack cost" was a RUN-ORDER artifact — the
  * first drain in a fresh JVM runs ~1.4x faster than all later ones —
  * so the bench now warms up first and interleaves shapes
  * (BASELINE.md round-10):
  *
  *  - `columnar_direct`: planQuery → readPartitionColumnar (vector decode)
  *  - `resumable_columnar`: planQueryRanges → resumable handle →
  *    readPartitionColumnar (group-aligned native batches) — includes the
  *    ordered-slice ORDER BY the resume protocol needs
  *  - `row_plain`: planQuery → readPartitionInternal, the row baseline
  *    both shapes degrade to for map/struct schemas
  *
  * GRAFT_ROWS rows of the wire_read schema (Int64, Float64, String)
  * widened by GRAFT_WIDE extra Float64 columns (default 13 → 16 cols —
  * vector decode's advantage scales with width, so a narrow schema would
  * understate the fallback's cost), GRAFT_ITERS iterations, best-of. One
  * JSON line: {"metric":"resume_ab_rows_per_sec","queries":{...}}.
  */
object ResumeAbBench {
  def main(args: Array[String]): Unit = {
    val rowsN = sys.env.getOrElse("GRAFT_ROWS", "2000000").toLong
    val iters = sys.env.getOrElse("GRAFT_ITERS", "3").toInt
    val wide = sys.env.getOrElse("GRAFT_WIDE", "13").toInt
    val server = new graft.client.MockClickHouseHttp
    server.wireReadRows = rowsN
    server.wireReadExtraCols = wide
    try {
      val http = new graft.client.HttpClickHouseClient(server.endpoint)
      val client = new graft.client.FailoverClickHouseClient(IndexedSeq(http, http))
      val cols = (Seq("id", "v", "tag") ++ (0 until wide).map(i => s"w$i"))
        .map(c => s"`$c`").mkString(", ")
      val sql = s"SELECT $cols FROM `bench`.`wire_read`"

      def columnarDrain(handle: graft.client.ChPartitionHandle,
          schema: StructType): Long = {
        var n = 0L
        val it = client.readPartitionColumnar(handle, schema)
        while (it.hasNext) { n += it.next().numRows() }
        n
      }
      val directF = () => {
        val (schema, hs) = client.planQuery(sql, 1)
        columnarDrain(hs.head, schema)
      }
      val resumableF = () => {
        val (schema, hs) = client.planQueryRanges(sql, "id", 1)
        require(hs.head.isInstanceOf[graft.client.ResumableReplicaHandle],
          s"range slice must plan resumable: ${hs.head.getClass}")
        columnarDrain(hs.head, schema)
      }
      val rowPlainF = () => {
        val (schema, hs) = client.planQuery(sql, 1)
        val it = client.readPartitionInternal(hs.head, schema)
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      }

      // the FIRST drain in a fresh JVM runs ~1.4x faster than every
      // later one (pristine heap, no concurrent GC of prior drains'
      // garbage) — round-9's sequential A/B attributed that inflation
      // to whichever shape ran first. Burn it on a warm-up, then
      // INTERLEAVE iterations so residual drift hits all shapes alike.
      require(directF() == rowsN, "warm-up drain incomplete")
      val bestRate = Array(0.0, 0.0, 0.0)
      val shapes = Array(directF, resumableF, rowPlainF)
      for (_ <- 0 until iters; s <- shapes.indices) {
        val t0 = System.nanoTime()
        val n = shapes(s)()
        require(n == rowsN, s"drained $n of $rowsN rows")
        bestRate(s) = math.max(bestRate(s), rowsN / ((System.nanoTime() - t0) / 1e9))
      }
      val Array(direct, resumable, rowPlain) = bestRate
      def r(v: Double): Long = math.round(v)
      println(
        s"""{"metric":"resume_ab_rows_per_sec","unit":"rows/sec","rows":$rowsN,""" +
          s""""queries":{"columnar_direct":${r(direct)},""" +
          s""""resumable_columnar":${r(resumable)},"row_plain":${r(rowPlain)}},""" +
          s""""resumable_vs_columnar":${
            String.format(java.util.Locale.ROOT, "%.3f", direct / resumable)}}""")
    } finally server.close()
  }
}
