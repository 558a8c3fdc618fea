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

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val vertices = spark.range(n).toDF("id")
    val e = edges.toDF("u", "v")
    val got = ConnectedComponents.label(vertices, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(n, edges)
    assert(got.size == n)
    assert(got == want)
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

  test("two stars joined by a bridge merge into one component") {
    // stars rooted at 0 and 100, bridged via an edge between leaves
    val edges = (1L to 50L).map(i => (0L, i)) ++
      (101L to 150L).map(i => (100L, i)) ++ Seq((50L, 150L))
    check(151, edges)
  }
}
