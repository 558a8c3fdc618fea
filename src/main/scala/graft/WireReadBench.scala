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
  * GRAFT_SHARDS=N > 1: one mock server per shard behind the sharded
  * composite client — the scale-OUT read envelope. The composite plans
  * one statement per shard; each shard serves GRAFT_ROWS/N rows and the
  * per-shard handles drain concurrently (the executor-side shape of a
  * sharded scan). Loopback caveat applies doubly here: all "shards"
  * share one box's CPUs and memory bus, so the numbers bound protocol
  * overhead and client decode scaling, NOT real cluster fan-out.
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
    val nShards = math.max(1, sys.env.getOrElse("GRAFT_SHARDS", "1").toInt)
    // GRAFT_NESTED=1 appends `nest Array(Tuple(Int64, String))` to the
    // served schema; GRAFT_READ_MODE=columnar drains through
    // readPartitionColumnar (ColumnarBatch delivery) instead of the row
    // iterator — the A/B pair for nested-composite columnar reads
    val nested = sys.env.get("GRAFT_NESTED").contains("1")
    val columnar = sys.env.get("GRAFT_READ_MODE").contains("columnar")
    val servers = IndexedSeq.fill(nShards)(new graft.client.MockClickHouseHttp)
    servers.foreach(_.wireReadNested = nested)
    // per-shard slice: total rows stay GRAFT_ROWS regardless of shard
    // count, so rows/sec compares apples-to-apples across GRAFT_SHARDS
    val perShard = rowsN / nShards
    servers.foreach(_.wireReadRows = perShard)
    val totalRows = perShard * nShards
    try {
      val client: graft.client.ClickHouseClient =
        if (nShards == 1)
          new graft.client.HttpClickHouseClient(
            servers.head.endpoint, compression = compression)
        else new graft.client.ShardedClickHouseClient(
          servers.map(sv => new graft.client.HttpClickHouseClient(
            sv.endpoint, compression = compression)
            : graft.client.ClickHouseClient),
          Some("id"))
      val sql =
        if (nested) "SELECT `id`, `v`, `tag`, `nest` FROM `bench`.`wire_read`"
        else "SELECT `id`, `v`, `tag` FROM `bench`.`wire_read`"
      def drainOnce(schemaJson: String, handle: graft.client.ChPartitionHandle): Long = {
        val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        var n = 0L
        if (columnar) {
          // no silent row fallback allowed: the packer must claim the
          // schema (nested composites included since round 14)
          require(graft.connector.ColumnarPack.supports(schema),
            s"columnar mode but ColumnarPack rejects schema: $schema")
          val it = client.readPartitionColumnar(handle, schema)
          while (it.hasNext) { n += it.next().numRows() }
        } else {
          val it = client.readPartitionInternal(handle, schema)
          while (it.hasNext) { it.next(); n += 1 }
        }
        n
      }
      // burn the first drain: a fresh JVM serves its first read ~1.4x
      // faster than all later ones (pristine heap, no concurrent GC of
      // prior drains' garbage) — without this the FIRST stream count in
      // the sweep gets the inflated number (round-10 ResumeProbe finding)
      {
        val (schema, handles) = client.planQuery(sql, nShards)
        handles.foreach(h => drainOnce(schema.json, h))
      }
      val results = streamCounts.map { sc =>
        val times = (0 until iters).map { _ =>
          // sharded: one handle per shard, each draining its own slice;
          // single-store: `sc` threads re-drain the same statement
          val (schema, handles) = client.planQuery(sql, nShards)
          val schemaJson = schema.json
          val t0 = System.nanoTime()
          val threads = (0 until sc).flatMap { ti =>
            handles.zipWithIndex.map { case (h, hi) =>
              val t = new Thread(() => {
                val n = drainOnce(schemaJson, h)
                require(n == perShard,
                  s"stream $ti/$hi drained $n of $perShard rows")
              })
              t.start(); t
            }
          }
          threads.foreach(_.join())
          (System.nanoTime() - t0) / 1e9
        }
        val best = times.min
        (sc, sc * totalRows / best)
      }
      val qs = results.map { case (sc, rps) => s""""s$sc":$rps""" }.mkString(",")
      val peak = results.map(_._2).max
      println(s"""{"metric":"http_read_rows_per_sec","value":$peak,"unit":"rows/sec","queries":{$qs},"sf":"$totalRows rows","compression":"$compression","shards":$nShards,"nested":$nested,"mode":"${if (columnar) "columnar" else "rows"}"}""")
    } finally servers.foreach(_.close())
  }
}
