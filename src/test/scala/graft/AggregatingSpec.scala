package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.client.EmbeddedClickHouse
import graft.types.ClickHouseType

/** AggregatingMergeTree + `-State` / `-Merge` combinators — the
  * canonical ClickHouse MV rollup beyond SummingMergeTree: the MV's
  * select leaves PARTIAL aggregate states per block in an
  * AggregateFunction-typed target; merges (OPTIMIZE) and FINAL reads
  * combine states by the sorting key; `-Merge` reads produce finals.
  * The embedded store keeps TRANSPARENT state representations
  * (ClickHouseType.aggStateType) so states stay parquet-representable.
  */
class AggregatingSpec extends AnyFunSuite {

  private lazy val root = Files.createTempDirectory("graft_aggmt_").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("aggregating-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.chagg",
      classOf[graft.catalog.ClickHouseCatalog].getName)
    s.conf.set("spark.sql.catalog.chagg.path", root)
    s
  }

  private lazy val client: EmbeddedClickHouse = {
    spark
    new EmbeddedClickHouse(root)
  }

  private lazy val ch: graft.session.ClickHouseSession =
    graft.session.ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chagg").build()

  private var n = 0
  /** Fresh (src, tgt, mv): tgt is AggregatingMergeTree keyed by tag with
    * avg/uniq/count/max states; the MV computes the states per block.
    */
  private def freshTrio(): (String, String, String) = {
    n += 1
    val (src, tgt, mv) = (s"asrc_$n", s"atgt_$n", s"amv_$n")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chagg.main")
    spark.sql(
      s"""CREATE TABLE chagg.main.$src (id BIGINT, tag STRING, v BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    client.createTable("main", tgt, Seq(
      "tag" -> "String",
      "a" -> "AggregateFunction(avg, Int64)",
      "u" -> "AggregateFunction(uniq, Int64)",
      "c" -> "AggregateFunction(count, Int64)",
      "mx" -> "AggregateFunction(max, Int64)"),
      Map("engine" -> "AggregatingMergeTree", "order_by" -> "tag"))
    client.createMaterializedView("main", mv, "main", tgt,
      s"SELECT tag, avgState(v) AS a, uniqState(id) AS u, " +
        s"countState() AS c, maxState(v) AS mx FROM main.$src GROUP BY tag")
    (src, tgt, mv)
  }

  private def mergeRead(tgt: String) = ch.chSql(
    s"""SELECT `tag`, avgMerge(`a`) AS avg_v, uniqMerge(`u`) AS uniq_id,
       |  countMerge(`c`) AS n, maxMerge(`mx`) AS max_v
       |FROM `main`.`$tgt` GROUP BY `tag` ORDER BY `tag`""".stripMargin)
    .collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    .toMap

  test("state types parse to transparent storage reps; avg keeps an " +
    "exact integer sum for integral args") {
    import org.apache.spark.sql.types._
    assert(ClickHouseType.parse("AggregateFunction(avg, Int64)").dataType ==
      StructType(Seq(StructField("s", LongType), StructField("c", LongType))))
    assert(ClickHouseType.parse("AggregateFunction(avg, Float64)").dataType ==
      StructType(Seq(StructField("s", DoubleType), StructField("c", LongType))))
    assert(ClickHouseType.parse("AggregateFunction(uniq, String)").dataType ==
      ArrayType(LongType, containsNull = false))
    assert(ClickHouseType.parse("AggregateFunction(max, String)").dataType ==
      StringType)
    assert(ClickHouseType.aggFunction("AggregateFunction(uniqExact, Int64)")
      .contains("uniqExact"))
    assert(ClickHouseType.aggFunction("Int64").isEmpty)
    intercept[IllegalArgumentException](
      ClickHouseType.parse("AggregateFunction(median, Int64)"))
  }

  test("MV leaves PARTIAL states per block; -Merge reads combine them " +
    "to the direct aggregate over the source") {
    val (src, tgt, _) = freshTrio()
    // two blocks: tag 'a' gets partial states in both
    spark.sql(s"INSERT INTO chagg.main.$src VALUES " +
      "(1,'a',10),(2,'a',20),(3,'b',5),(2,'a',20)") // id 2 twice: uniq dedups
    spark.sql(s"INSERT INTO chagg.main.$src VALUES (4,'a',1),(5,'c',7)")
    val partials = spark.table(s"chagg.main.$tgt").where("tag = 'a'").count()
    assert(partials >= 2, s"expected partial state rows for 'a', got $partials")
    assert(mergeRead(tgt) == Map(
      "a" -> ((51.0 / 4.0, 3L, 4L, 20L)),
      "b" -> ((5.0, 1L, 1L, 5L)),
      "c" -> ((7.0, 1L, 1L, 7L))))
  }

  test("OPTIMIZE merges states to ONE row per key; -Merge reads are " +
    "unchanged; FINAL reads combine on the fly without OPTIMIZE") {
    val (src, tgt, _) = freshTrio()
    spark.sql(s"INSERT INTO chagg.main.$src VALUES (1,'a',10),(2,'b',2)")
    spark.sql(s"INSERT INTO chagg.main.$src VALUES (3,'a',30),(4,'b',4)")
    // FINAL read pre-OPTIMIZE: states merged on the fly
    val fin = ch.chSql(
      s"""SELECT `tag`, avgMerge(`a`) AS avg_v, uniqMerge(`u`) AS uniq_id
         |FROM `main`.`$tgt` FINAL GROUP BY `tag` ORDER BY `tag`""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(fin.toSeq == Seq(("a", 20.0, 2L), ("b", 3.0, 2L)))
    val before = mergeRead(tgt)
    client.optimizeTable("main", tgt, finalize = false)
    assert(spark.table(s"chagg.main.$tgt").count() == 2,
      "post-OPTIMIZE: one merged state row per key")
    assert(mergeRead(tgt) == before, "merge collapse must not change results")
  }

  test("uniqState skips NULLs (Nullable source column)") {
    n += 1
    val (src, tgt) = (s"nsrc_$n", s"ntgt_$n")
    client.createTable("main", src,
      Seq("id" -> "Int64", "tag" -> "String", "u" -> "Nullable(Int64)"),
      Map("engine" -> "MergeTree", "order_by" -> "id"))
    client.createTable("main", tgt,
      Seq("tag" -> "String", "uq" -> "AggregateFunction(uniq, Nullable(Int64))"),
      Map("engine" -> "AggregatingMergeTree", "order_by" -> "tag"))
    client.createMaterializedView("main", s"nmv_$n", "main", tgt,
      s"SELECT tag, uniqState(u) AS uq FROM main.$src GROUP BY tag")
    spark.sql(s"INSERT INTO chagg.main.$src VALUES " +
      "(1,'a',7),(2,'a',NULL),(3,'a',7),(4,'a',9)")
    val r = ch.chSql(
      s"SELECT uniqMerge(`uq`) AS u FROM `main`.`$tgt` GROUP BY `tag`")
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("direct insertSelect with -State aggregates works (no MV needed); " +
    "sum/min states merge too") {
    n += 1
    val (src, tgt) = (s"dsrc_$n", s"dtgt_$n")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chagg.main")
    spark.sql(
      s"""CREATE TABLE chagg.main.$src (id BIGINT, tag STRING, v BIGINT)
         |TBLPROPERTIES ('engine' = 'MergeTree', 'order_by' = 'id')""".stripMargin)
    spark.sql(s"INSERT INTO chagg.main.$src VALUES (1,'a',10),(2,'a',3),(3,'b',5)")
    client.createTable("main", tgt, Seq(
      "tag" -> "String",
      "sm" -> "AggregateFunction(sum, Int64)",
      "mn" -> "AggregateFunction(min, Int64)"),
      Map("engine" -> "AggregatingMergeTree", "order_by" -> "tag"))
    client.insertSelect("main", tgt,
      s"SELECT tag, sumState(v) AS sm, minState(v) AS mn " +
        s"FROM main.$src GROUP BY tag")
    client.insertSelect("main", tgt,
      s"SELECT tag, sumState(v * 10) AS sm, minState(v * 10) AS mn " +
        s"FROM main.$src GROUP BY tag")
    val out = ch.chSql(
      s"""SELECT `tag`, sumMerge(`sm`) AS s, minMerge(`mn`) AS m
         |FROM `main`.`$tgt` GROUP BY `tag` ORDER BY `tag`""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 143L, 3L), ("b", 55L, 5L)))
  }

  test("fuzz: 12 seeded block schedules with random POPULATE, OPTIMIZEs " +
    "and FINAL/plain merge reads — the -Merge result always equals the " +
    "shadow aggregate over the rows the view saw") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.util.Random
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chagg.main")
    val sch = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("tag", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    for (seed <- 0 until 12) {
      val r = new Random(seed)
      val (src, tgt, mv) = (s"fz_src_$seed", s"fz_tgt_$seed", s"fz_mv_$seed")
      client.createTable("main", src,
        Seq("id" -> "Int64", "tag" -> "String", "v" -> "Int64"),
        Map("engine" -> "MergeTree", "order_by" -> "id"))
      client.createTable("main", tgt, Seq(
        "tag" -> "String",
        "a" -> "AggregateFunction(avg, Int64)",
        "u" -> "AggregateFunction(uniq, Int64)",
        "c" -> "AggregateFunction(count, Int64)",
        "mx" -> "AggregateFunction(max, Int64)"),
        Map("engine" -> "AggregatingMergeTree", "order_by" -> "tag"))
      // shadow: per tag (sum, uniq ids, count, max) over rows the VIEW saw
      var shadow = Map.empty[String, (Long, Set[Long], Long, Long)]
        .withDefaultValue((0L, Set.empty[Long], 0L, Long.MinValue))
      var nextId = 0L
      def block(seen: Boolean): Unit = {
        val rows = (0 until (1 + r.nextInt(6))).map { _ =>
          nextId += 1
          val tag = s"t${r.nextInt(3)}"
          val v = r.nextInt(41) - 20L
          if (seen) {
            val (s0, u0, c0, m0) = shadow(tag)
            shadow += (tag -> (s0 + v, u0 + nextId, c0 + 1, math.max(m0, v)))
          }
          Row(nextId, tag, v)
        }
        client.insert("main", src, sch, rows)
      }
      // pre-create blocks: visible ONLY via POPULATE
      val preBlocks = r.nextInt(3)
      val populate = r.nextBoolean()
      for (_ <- 0 until preBlocks) block(seen = populate)
      client.createMaterializedView("main", mv, "main", tgt,
        s"SELECT tag, avgState(v) AS a, uniqState(id) AS u, " +
          s"countState() AS c, maxState(v) AS mx FROM main.$src GROUP BY tag",
        populate)
      for (_ <- 0 until (1 + r.nextInt(4))) {
        block(seen = true)
        if (r.nextBoolean()) client.optimizeTable("main", tgt)
      }
      val finalKw = if (r.nextBoolean()) " FINAL" else ""
      val got = ch.chSql(
        s"""SELECT `tag`, avgMerge(`a`) AS av, uniqMerge(`u`) AS uq,
           |  countMerge(`c`) AS n, maxMerge(`mx`) AS mx
           |FROM `main`.`$tgt`$finalKw GROUP BY `tag`""".stripMargin)
        .collect().map(row => row.getString(0) ->
          ((row.getDouble(1), row.getLong(2), row.getLong(3), row.getLong(4))))
        .toMap
      val expect = shadow.collect { case (tag, (s0, u0, c0, m0)) if c0 > 0 =>
        tag -> ((s0.toDouble / c0.toDouble, u0.size.toLong, c0, m0)) }
      assert(got == expect, s"seed $seed (populate=$populate): $got vs $expect")
    }
  }

  test("VersionedCollapsingMergeTree: FINAL cancels +1/-1 pairs per " +
    "(key, version), OPTIMIZE materializes") {
    import org.apache.spark.sql.Row
    n += 1
    val t = s"vc_$n"
    client.createTable("main", t, Seq(
      "id" -> "Int64", "ver" -> "Int64", "sign" -> "Int8", "v" -> "Int64"),
      Map("engine" -> "VersionedCollapsingMergeTree(sign, ver)",
        "order_by" -> "id"))
    val sch = client.sparkSchema("main", t)
    client.insert("main", t, sch, Seq(
      Row(1L, 1L, 1.toByte, 10L)))             // state v1
    client.insert("main", t, sch, Seq(
      Row(1L, 1L, (-1).toByte, 10L),           // cancel v1
      Row(1L, 2L, 1.toByte, 20L),              // new state v2
      Row(2L, 1L, 1.toByte, 7L)))              // key 2, uncancelled
    val fin = ch.chSql(
      s"SELECT `id`, `ver`, `sign`, `v` FROM `main`.`$t` FINAL ORDER BY `id`")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getByte(2), r.getLong(3)))
    assert(fin.toSeq == Seq((1L, 2L, 1.toByte, 20L), (2L, 1L, 1.toByte, 7L)),
      fin.mkString(","))
    // OPTIMIZE materializes the collapse (merge-time behavior)
    client.optimizeTable("main", t, finalize = false)
    assert(spark.table(s"chagg.main.$t").count() == 2)
  }

  test("CollapsingMergeTree(sign): insertion-order collapse via the " +
    "part-sequence view — net +1 keeps the LAST state, net -1 the FIRST " +
    "cancel, net 0 keeps first-cancel+last-state only when the group " +
    "ends in a state; OPTIMIZE materializes; malformed groups raise") {
    import org.apache.spark.sql.Row
    n += 1
    val t = s"cc_$n"
    client.createTable("main", t, Seq(
      "id" -> "Int64", "sign" -> "Int8", "v" -> "Int64"),
      Map("engine" -> "CollapsingMergeTree(sign)", "order_by" -> "id"))
    val sch = client.sparkSchema("main", t)
    def fin() = ch.chSql(
      s"SELECT `id`, `sign`, `v` FROM `main`.`$t` FINAL ORDER BY `id`, `sign`")
      .collect().map(r => (r.getLong(0), r.getByte(1).toInt, r.getLong(2))).toSeq
    // key 1: state then (cancel, new state) ACROSS parts → last state wins
    client.insert("main", t, sch, Seq(Row(1L, 1.toByte, 10L)))
    client.insert("main", t, sch, Seq(
      Row(1L, (-1).toByte, 10L), Row(1L, 1.toByte, 20L)))
    // key 2: equal counts ending in a CANCEL → nothing survives
    client.insert("main", t, sch, Seq(
      Row(2L, 1.toByte, 7L), Row(2L, (-1).toByte, 7L)))
    // key 3: equal counts ending in a STATE (cancel of a pre-collapsed
    // row, then its replacement) → first cancel AND last state survive
    client.insert("main", t, sch, Seq(
      Row(3L, (-1).toByte, 5L), Row(3L, 1.toByte, 6L)))
    // key 4: lone cancel (net -1) → the first cancel survives
    client.insert("main", t, sch, Seq(Row(4L, (-1).toByte, 9L)))
    assert(fin() == Seq(
      (1L, 1, 20L), (3L, -1, 5L), (3L, 1, 6L), (4L, -1, 9L)), fin().toString)
    // OPTIMIZE materializes the same collapse and keeps order defined:
    // a later cancel of key 1's surviving state still collapses
    client.optimizeTable("main", t, finalize = false)
    assert(spark.table(s"chagg.main.$t").count() == 4)
    client.insert("main", t, sch, Seq(Row(1L, (-1).toByte, 20L)))
    val after = fin()
    assert(!after.exists(r => r._1 == 1L && r._2 == 1),
      s"key 1's state must cancel after the merge: $after")
    // malformed: two uncancelled states for one key → loud error, never
    // an unpredictable answer (the server logs a logical error there)
    n += 1
    val bad = s"ccbad_$n"
    client.createTable("main", bad, Seq("id" -> "Int64", "sign" -> "Int8"),
      Map("engine" -> "CollapsingMergeTree(sign)", "order_by" -> "id"))
    val bsch = client.sparkSchema("main", bad)
    client.insert("main", bad, bsch, Seq(
      Row(1L, 1.toByte), Row(1L, 1.toByte)))
    val e = intercept[Exception](
      ch.chSql(s"SELECT * FROM `main`.`$bad` FINAL").collect())
    assert(e.getMessage.contains("logical error") ||
      Option(e.getCause).exists(_.getMessage.contains("logical error")),
      e.getMessage)
  }

  test("CollapsingMergeTree fuzz: the upsert/delete writer protocol over " +
    "random block splits + interleaved OPTIMIZE always FINAL-reads to " +
    "the shadow state") {
    import org.apache.spark.sql.Row
    for (seed <- 1 to 8) {
      n += 1
      val t = s"ccf_$n"
      client.createTable("main", t, Seq(
        "id" -> "Int64", "sign" -> "Int8", "v" -> "Int64"),
        Map("engine" -> "CollapsingMergeTree(sign)", "order_by" -> "id"))
      val sch = client.sparkSchema("main", t)
      val rnd = new scala.util.Random(seed)
      val shadow = scala.collection.mutable.Map.empty[Long, Long]
      var pending = Vector.empty[Row]
      def flush(): Unit = if (pending.nonEmpty) {
        client.insert("main", t, sch, pending); pending = Vector.empty
      }
      for (_ <- 1 to 60) {
        val k = rnd.nextInt(8).toLong
        rnd.nextInt(4) match {
          case 0 | 1 => // upsert: cancel old (if any) + new state
            shadow.get(k).foreach(old =>
              pending :+= Row(k, (-1).toByte, old))
            val nv = rnd.nextInt(1000).toLong
            pending :+= Row(k, 1.toByte, nv)
            shadow(k) = nv
          case 2 => // delete
            shadow.remove(k).foreach(old =>
              pending :+= Row(k, (-1).toByte, old))
          case 3 => // block boundary, sometimes a merge
            flush()
            if (rnd.nextBoolean()) client.optimizeTable("main", t)
        }
      }
      flush()
      val got = ch.chSql(
        s"SELECT `id`, `v` FROM `main`.`$t` FINAL")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == shadow.toMap, s"seed $seed: $got vs $shadow")
      spark.sql(s"DROP TABLE chagg.main.$t")
    }
  }

  test("ReplacingMergeTree(ver, is_deleted): FINAL reads drop max-version " +
    "tombstones; OPTIMIZE FINAL keeps them physically (a server purges " +
    "only under FINAL CLEANUP); non-integer is_deleted rejects") {
    n += 1
    val t = s"rmt_isd_$n"
    client.createTable("main", t, Seq(
      "k" -> "Int64", "ver" -> "Int64", "isd" -> "Int32", "v" -> "String"),
      Map("engine" -> s"ReplacingMergeTree(ver, isd)", "order_by" -> "k"))
    import org.apache.spark.sql.Row
    client.insert("main", t, client.sparkSchema("main", t), Seq(
      Row(1L, 1L, 0, "a"), Row(1L, 2L, 0, "b"), // live upsert → b
      Row(2L, 1L, 0, "c"), Row(2L, 2L, 1, "d"), // deleted at max ver → gone
      Row(3L, 1L, 1, "e"), // only row is a tombstone → gone
      Row(4L, 2L, 1, "f"), Row(4L, 3L, 0, "g"))) // re-created after delete → g
    def finals(): Map[Long, String] =
      ch.chSql(s"SELECT `k`, `v` FROM `main`.`$t` FINAL").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(finals() == Map(1L -> "b", 4L -> "g"))
    // the connector's final=true option rides the same rewrite
    val viaOption = spark.read.option("final", "true")
      .table(s"chagg.main.$t").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(viaOption == Map(1L -> "b", 4L -> "g"))
    // OPTIMIZE FINAL materializes max-version survivors but KEEPS the
    // is_deleted=1 rows (k=2 'd', k=3 'e') for plain reads
    client.optimizeTable("main", t, finalize = true)
    val plain = spark.table(s"chagg.main.$t").collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("v"), r.getAs[Int]("isd")))
      .toMap
    assert(plain == Map(1L -> ("b", 0), 2L -> ("d", 1),
      3L -> ("e", 1), 4L -> ("g", 0)), plain.toString)
    // FINAL reads after the merge still hide tombstones
    assert(finals() == Map(1L -> "b", 4L -> "g"))
    // is_deleted must be an integer 0/1 flag
    n += 1
    client.createTable("main", s"rmt_bad_$n", Seq(
      "k" -> "Int64", "ver" -> "Int64", "flag" -> "String"),
      Map("engine" -> "ReplacingMergeTree(ver, flag)", "order_by" -> "k"))
    val e = intercept[Exception](
      ch.chSql(s"SELECT `k` FROM `main`.`rmt_bad_$n` FINAL").collect())
    assert(e.getMessage.contains("integer 0/1 flag"), e.getMessage)
  }

  test("a CollapsingMergeTree part without an insert sequence rejects on " +
    "PLAIN reads too (not only FINAL): defaulting it to sort last would " +
    "let a mutation re-stamp wrong insertion order") {
    n += 1
    val t = s"cc_legacy_$n"
    client.createTable("main", t, Seq(
      "k" -> "Int64", "sign" -> "Int8", "v" -> "Int64"),
      Map("engine" -> "CollapsingMergeTree(sign)", "order_by" -> "k"))
    import org.apache.spark.sql.Row
    client.insert("main", t, client.sparkSchema("main", t),
      Seq(Row(1L, 1.toByte, 10L)))
    // plant a legacy part: a data file whose name carries no sequence
    val dir = java.nio.file.Paths.get(root, "main", t)
    val stream = java.nio.file.Files.list(dir)
    val real =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      } finally stream.close()
    java.nio.file.Files.copy(real, dir.resolve("legacy-old.parquet"))
    // bump the store version so the next read re-registers views
    client.createTable("main", s"${t}_bump", Seq("x" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "x"))
    val e = intercept[Exception](
      spark.table(s"chagg.main.$t").collect())
    assert(e.getMessage.contains("no insert sequence") &&
      e.getMessage.contains("re-ingest"), e.getMessage)
  }

  test("FINAL on an engine without a merge rule still rejects; " +
    "AggregateFunction over a non-numeric arg rejects where required") {
    n += 1
    client.createTable("main", s"plain_$n", Seq("id" -> "Int64"),
      Map("engine" -> "MergeTree", "order_by" -> "id"))
    val e = intercept[Exception](
      ch.chSql(s"SELECT * FROM `main`.`plain_$n` FINAL").collect())
    assert(e.getMessage.contains("FINAL"), e.getMessage)
    intercept[IllegalArgumentException](client.createTable("main", s"bad_$n",
      Seq("tag" -> "String", "a" -> "AggregateFunction(avg, String)"),
      Map("engine" -> "AggregatingMergeTree", "order_by" -> "tag")))
  }
}
