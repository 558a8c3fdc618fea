package graft

import org.apache.spark.sql.types.{DataType, StructType}

/** Read-path wire envelope: N concurrent client streams each drain
  * `GRAFT_ROWS` synthetic rows from the in-JVM mock ClickHouse HTTP
  * server as RowBinaryWithNamesAndTypes (the scan hot path —
  * readPartitionInternal, no Spark job around it), so the number is the
  * pure transport cost: server encode + HTTP + content-coding + client
  * binary decode. The mirror of InsertBench's GRAFT_TRANSPORT=http
  * write envelope; GRAFT_COMPRESSION picks the codec
  * (none|gzip|lz4|zstd).
  *
  * Prints ONE JSON line: {"metric":"http_read_rows_per_sec",...,
  * "queries":{"s<streams>":rows_per_sec,...}}.
  */
object WireReadBench {
  def main(args: Array[String]): Unit = {
    val rowsN = sys.env.getOrElse("GRAFT_ROWS", "2000000").toLong
    val streamCounts = sys.env.getOrElse("GRAFT_CONCURRENCIES", "1,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val iters = sys.env.getOrElse("GRAFT_ITERS", "3").toInt
    val compression = sys.env.getOrElse("GRAFT_COMPRESSION", "none")
    val server = new graft.client.MockClickHouseHttp
    server.wireReadRows = rowsN
    try {
      val client = new graft.client.HttpClickHouseClient(
        server.endpoint, compression = compression)
      val sql = "SELECT `id`, `v`, `tag` FROM `bench`.`wire_read`"
      def drainOnce(schemaJson: String, handle: graft.client.ChPartitionHandle): Long = {
        val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        var n = 0L
        val it = client.readPartitionInternal(handle, schema)
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      val results = streamCounts.map { sc =>
        val times = (0 until iters).map { _ =>
          val (schema, handles) = client.planQuery(sql, 1)
          val schemaJson = schema.json
          val t0 = System.nanoTime()
          val threads = (0 until sc).map { _ =>
            val t = new Thread(() => {
              val n = drainOnce(schemaJson, handles.head)
              require(n == rowsN, s"stream drained $n of $rowsN rows")
            })
            t.start(); t
          }
          threads.foreach(_.join())
          (System.nanoTime() - t0) / 1e9
        }
        val best = times.min
        (sc, sc * rowsN / best)
      }
      val qs = results.map { case (sc, rps) => s""""s$sc":$rps""" }.mkString(",")
      val peak = results.map(_._2).max
      println(s"""{"metric":"http_read_rows_per_sec","value":$peak,"unit":"rows/sec","queries":{$qs},"sf":"$rowsN rows","compression":"$compression"}""")
    } finally server.close()
  }
}
