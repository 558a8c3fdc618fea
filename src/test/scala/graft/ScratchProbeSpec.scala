package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.client.MockClickHouseHttp

class ScratchProbeSpec extends AnyFunSuite {
  test("probe: 16-col resumable columnar read rides the native path") {
    val r1 = new MockClickHouseHttp
    r1.wireReadRows = 20000
    r1.wireReadExtraCols = 13
    try {
      val http = new graft.client.HttpClickHouseClient(r1.endpoint)
      val client = new graft.client.FailoverClickHouseClient(IndexedSeq(http, http))
      val cols = (Seq("id", "v", "tag") ++ (0 until 13).map(i => s"w$i"))
        .map(c => s"`$c`").mkString(", ")
      val (schema, hs) = client.planQueryRanges(
        s"SELECT $cols FROM `bench`.`wire_read`", "id", 1)
      assert(hs.head.isInstanceOf[graft.client.ResumableReplicaHandle])
      val before = graft.client.HttpClickHouseClient.binaryBatchesDecoded.get()
      var n = 0L
      var batches = 0
      val it = client.readPartitionColumnar(hs.head, schema)
      while (it.hasNext) { n += it.next().numRows(); batches += 1 }
      val after = graft.client.HttpClickHouseClient.binaryBatchesDecoded.get()
      info(s"rows=$n batches=$batches binaryBatchesDecoded delta=${after - before}")
      assert(n == 20000L)
      assert(after > before, "16-col resumable read took the ROW fallback")
    } finally r1.close()
  }
}
