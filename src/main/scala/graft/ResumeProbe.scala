package graft

/** Throwaway isolation probe for the resumable-columnar gap: times each
  * layer of the resumable read separately on the same mock endpoint.
  */
object ResumeProbe {
  def main(args: Array[String]): Unit = {
    val rowsN = sys.env.getOrElse("GRAFT_ROWS", "2000000").toLong
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

      def drainB(it: Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]): Long = {
        var n = 0L; while (it.hasNext) { n += it.next().numRows() }; n
      }
      def once(tag: String)(f: () => Long): Double = {
        val t0 = System.nanoTime(); val n = f()
        require(n == rowsN, s"$tag drained $n")
        rowsN / ((System.nanoTime() - t0) / 1e9)
      }
      val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def time(tag: String)(f: () => Long): Unit = {
        val r = once(tag)(f)
        best(tag) = math.max(best.getOrElse(tag, 0.0), r)
        println(f"  [iter] $tag%-28s ${r / 1000}%6.0fK rows/s")
      }

      // INTERLEAVED iterations: run-order decay (first-in-JVM runs ~1.4x
      // faster than every later drain) poisoned the sequential A/B
      for (_ <- 0 until 4) {
        time("direct") { () =>
          val (schema, hs) = http.planQuery(sql, 1); drainB(http.readPartitionColumnar(hs.head, schema))
        }
        time("ordered-transport-only") { () =>
          val (schema, hs) = client.planQueryRanges(sql, "id", 1)
          val r = hs.head.asInstanceOf[graft.client.ResumableReplicaHandle]
          val inner = http.rehome(r.ordered).get
          drainB(http.readPartitionColumnar(inner, schema))
        }
        time("resumable-full") { () =>
          val (schema, hs) = client.planQueryRanges(sql, "id", 1)
          drainB(client.readPartitionColumnar(hs.head, schema))
        }
        time("row-plain") { () =>
          val (schema, hs) = http.planQuery(sql, 1)
          val it = http.readPartitionInternal(hs.head, schema)
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
        }
      }
      println("---- best of 4 interleaved ----")
      best.foreach { case (t, r) => println(f"$t%-28s ${r / 1000}%6.0fK rows/s") }
    } finally server.close()
  }
}
