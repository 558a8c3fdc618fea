package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Star-contraction connected components vs a union-find oracle. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("cc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Test-only oracle: plain union-find over the collected edge list. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  /** Both routes must agree with the oracle: the bounded local finish
    * (default — these graphs all fit the driver budget) AND the pure
    * distributed star-contraction loop (forced via the conf, so the
    * 100 TB path stays pinned even though small specs would otherwise
    * never exercise it).
    */
  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val vertices = spark.range(n).toDF("id")
    val e = edges.toDF("u", "v")
    val want = unionFind(n, edges)
    for (localMax <- Seq("65536", "0")) {
      spark.conf.set("graft.cc.localFinishMaxEdges", localMax)
      try {
        val got = ConnectedComponents.label(vertices, e)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got.size == n, s"localFinishMaxEdges=$localMax")
        assert(got == want, s"localFinishMaxEdges=$localMax")
      } finally spark.conf.unset("graft.cc.localFinishMaxEdges")
    }
  }

  test("empty edge set: every vertex is its own singleton component") {
    check(20, Seq.empty)
  }

  test("chain graph (worst case for naive propagation) collapses to one component") {
    check(257, (0L until 256L).map(i => (i, i + 1)))
  }

  test("reversed chain + duplicate and self edges are canonicalized away") {
    val edges = (0L until 100L).map(i => (i + 1, i)) ++
      Seq((5L, 5L), (7L, 8L), (8L, 7L), (7L, 8L))
    check(120, edges)
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 3) {
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      check(n, edges)
    }
  }

  test("hybrid route: distributed rounds first, local finish once under the cap") {
    import spark.implicits._
    // 100 triangle components: 300 canonical edges initially, 200 once
    // contracted to stars — a cap between the two forces at least one
    // distributed round BEFORE the local finish engages
    val n = 300
    val edges = (0 until 100).flatMap { c =>
      val b = 3L * c
      Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
    }
    val vertices = spark.range(n).toDF("id")
    spark.conf.set("graft.cc.localFinishMaxEdges", "220")
    try {
      val got = ConnectedComponents.label(vertices, edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(n, edges))
    } finally spark.conf.unset("graft.cc.localFinishMaxEdges")
  }

  test("non-integral (string) ids never take the local finish: the " +
    "long-cast union-find would NULL them out — the distributed loop " +
    "is type-agnostic and must label them correctly") {
    import spark.implicits._
    // two chains + a singleton, ids chosen so LEXICOGRAPHIC min (what
    // the distributed rounds' min() computes on strings) also matters:
    // "a10" < "a2" lexicographically
    val edges = Seq(("a2", "a10"), ("a10", "a30"), ("b1", "b2")).toDF("u", "v")
    val vertices = Seq("a2", "a10", "a30", "b1", "b2", "c9").toDF("id")
    // cap far above the edge count: an integral graph WOULD local-finish
    // here, so a correct result proves the type gate routed distributed
    spark.conf.set("graft.cc.localFinishMaxEdges", "65536")
    try {
      val got = ConnectedComponents.label(vertices, edges)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map(
        "a2" -> "a10", "a10" -> "a10", "a30" -> "a10",
        "b1" -> "b1", "b2" -> "b1", "c9" -> "c9"))
    } finally spark.conf.unset("graft.cc.localFinishMaxEdges")
  }

  test("two stars joined by a bridge merge into one component") {
    // stars rooted at 0 and 100, bridged via an edge between leaves
    val edges = (1L to 50L).map(i => (0L, i)) ++
      (101L to 150L).map(i => (100L, i)) ++ Seq((50L, 150L))
    check(151, edges)
  }
}
