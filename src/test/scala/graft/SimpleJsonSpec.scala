package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftSimpleJson
import graft.functions.GraftUrlFns
import graft.session.ClickHouseSession

/** Documented-law pins for the round-16 function wave: the simpleJSON /
  * visitParam byte-scanner family (every pinned value is a documented
  * ClickHouse example from the simpleJSON docs section), the default
  * firstSignificantSubdomain 4-name heuristic, JSONLength's polymorphic
  * 0-default, and toStartOfInterval's calendar-origin steps (DateLUT
  * origins: multi-week from Monday 1970-01-05, months/quarters from
  * 1970-01, years from 1970).
  */
class SimpleJsonSpec extends AnyFunSuite {

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  test("simpleJSONHas: needle law, first occurrence, canonical encoding") {
    assert(GraftSimpleJson.sjHas(u("""{"abc":"def"}"""), u("abc")) == 1)
    assert(GraftSimpleJson.sjHas(u("""{"abc":"def"}"""), u("bar")) == 0)
    // assumption 2 (documented): the name matches its raw byte spelling
    // only — an escape-encoded name does NOT match
    assert(GraftSimpleJson.sjHas(u("{\"\\u0061\\u0062\\u0063\":\"def\"}"),
      u("abc")) == 0)
    // any nesting level, dumbly
    assert(GraftSimpleJson.sjHas(u("""{"a":{"abc":1}}"""), u("abc")) == 1)
    // no-spaces assumption: a spaced separator does not match
    assert(GraftSimpleJson.sjHas(u("""{"abc" :1}"""), u("abc")) == 0)
  }

  test("simpleJSONExtractUInt/Int: documented front-read examples") {
    def ui(j: String): Long =
      GraftSimpleJson.sjUInt(u(j), u("foo")).toLong
    assert(ui("""{"foo":"4e3"}""") == 4L)
    assert(ui("""{"foo":3.4}""") == 3L)
    assert(ui("""{"foo":-3.4}""") == 0L)
    assert(ui("""{"foo":5}""") == 5L)
    assert(ui("""{"foo":"not1number"}""") == 0L)
    assert(ui("""{"baz":2}""") == 0L)
    def si(j: String): Long = GraftSimpleJson.sjInt(u(j), u("foo"))
    assert(si("""{"foo":-3.4}""") == -3L)
    assert(si("""{"foo":"-4e3"}""") == -4L)
    assert(si("""{"foo":5}""") == 5L)
    assert(si("""{"baz":2}""") == 0L)
    // UInt64 range is exact through the Decimal(20,0) rep
    assert(GraftSimpleJson.sjUInt(
      u("""{"foo":18446744073709551615}"""), u("foo")).toString ==
      "18446744073709551615")
    // overflow past the width: loud (the server's wrap is not pinnable)
    intercept[IllegalArgumentException] {
      GraftSimpleJson.sjUInt(u("""{"foo":18446744073709551616}"""), u("foo"))
    }
    intercept[IllegalArgumentException] {
      GraftSimpleJson.sjInt(u("""{"foo":9223372036854775808}"""), u("foo"))
    }
  }

  test("simpleJSONExtractFloat: decimal grammar; inf/nan spellings loud") {
    def f(j: String): Double = GraftSimpleJson.sjFloat(u(j), u("foo"))
    assert(f("""{"foo":"4e3"}""") == 4000.0)
    assert(f("""{"foo":-3.4}""") == -3.4)
    assert(f("""{"foo":5}""") == 5.0)
    assert(f("""{"foo":"not1number"}""") == 0.0)
    assert(f("""{"baz":2}""") == 0.0)
    intercept[IllegalArgumentException] { f("""{"foo":inf}""") }
    intercept[IllegalArgumentException] { f("""{"foo":-Infinity}""") }
    intercept[IllegalArgumentException] { f("""{"foo":NaN}""") }
  }

  test("simpleJSONExtractBool: literal-true prefix only") {
    def b(j: String, k: String): Int = GraftSimpleJson.sjBool(u(j), u(k))
    assert(b("""{"foo":false,"bar":true}""", "bar") == 1)
    assert(b("""{"foo":false,"bar":true}""", "foo") == 0)
    assert(b("""{"foo":"true","baz":true}""", "foo") == 0) // quoted → 0
    assert(b("""{"foo":1}""", "foo") == 0)
    assert(b("""{"foo":1}""", "nope") == 0)
  }

  test("simpleJSONExtractRaw: balance-scanned value incl. separators") {
    def r(j: String): String = GraftSimpleJson.sjRaw(u(j), u("foo")).toString
    assert(r("""{"baz":2}""") == "")
    assert(r("""{"foo":"-4e3"}""") == "\"-4e3\"")
    assert(r("""{"foo":-3.4}""") == "-3.4")
    assert(r("""{"foo":5}""") == "5")
    assert(r("""{"foo":{"def":[1,2,3]}}""") == """{"def":[1,2,3]}""")
    // mid-object value terminates at the top-level comma
    assert(r("""{"foo":[1,{"a":2}],"b":3}""") == """[1,{"a":2}]""")
  }

  test("simpleJSONExtractString: strict JSON unescaping, '' on failure") {
    def s(j: String, k: String = "foo"): String =
      GraftSimpleJson.sjString(u(j), u(k)).toString
    assert(s("{\"foo\":\"\\n\\u0000\"}") == "\n\u0000")
    assert(s("{\"foo\":\"\\u263a\"}") == "\u263a")
    // 3-digit hex escape fails → ''
    assert(s("{\"foo\":\"\\u263\"}") == "")
    // unterminated → ''
    assert(s("""{"foo":"hello}""") == "")
    // non-string value → ''
    assert(s("""{"foo":5}""") == "")
    // surrogate pair composes; lone surrogate fails
    assert(s("{\"foo\":\"\\ud83d\\ude00\"}") == "\ud83d\ude00")
    assert(s("{\"foo\":\"\\ud83dx\"}") == "")
    // first occurrence wins at any depth
    assert(s("""{"a":{"k":"x"},"k":"y"}""", "k") == "x")
  }

  test("firstSignificantSubdomain: documented 4-name heuristic") {
    def fsd(url: String): String = GraftUrlFns.fsd(u(url), cut = false).toString
    def cut(url: String): String = GraftUrlFns.fsd(u(url), cut = true).toString
    assert(fsd("https://news.clickhouse.com.tr/") == "clickhouse")
    assert(fsd("http://www.example.com/a/b/c") == "example")
    assert(fsd("https://clickhouse.com") == "clickhouse")
    assert(fsd("http://a.co.uk/x") == "a")
    assert(cut("https://news.clickhouse.com.tr/") == "clickhouse.com.tr")
    assert(cut("http://www.example.com/a/b/c") == "example.com")
    assert(cut("http://a.co.uk/x") == "a.co.uk")
    // chosen instances (documented in GraftUrlFns, not server-pinned):
    // dotless host and a heuristic step past the first label → ''
    assert(fsd("http://localhost/") == "")
    assert(fsd("http://com.tr/") == "")
  }

  test("round-16 URL additions + JSONExtractKeys: documented examples") {
    val spark = SparkSession.builder().master("local[4]")
      .appName("simplejson-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = Files.createTempDirectory("graft_sjurl_").toString
    val ch = ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chsjurl").build()
    ch.createDatabase("db")
    ch.newTable("db", "one").column("id", "Int64")
      .engine("MergeTree").orderBy("id").create()
    ch.insertReturningCount("INSERT INTO chsjurl.db.one VALUES (1)")
    val r = ch.chSql(
      """SELECT cutFragment('https://x.com/a#f') AS cf,
        |  cutQueryStringAndFragment('https://x.com/a?q=1#f') AS cqf,
        |  netloc('http://paul@www.example.com:80/p') AS nl,
        |  netloc('www.example.com/p?q') AS nl2,
        |  port('http://x.com:8080/p') AS p1,
        |  port('http://x.com/p') AS p0,
        |  port('http://x.com/p', 443) AS pd,
        |  JSONExtractKeys('{"a":1,"b":2}') AS ks,
        |  JSONExtractKeys('[1,2]') AS ke,
        |  extractGroups('hello abc=111 world',
        |    '("[^"]+"|\\w+)=("[^"]+"|\\w+)') AS eg,
        |  extractGroups('no match here', '(\\d+)=(\\d+)') AS egm,
        |  arrayDifference([1, 5, 2]) AS ad,
        |  arrayCumSum([1, 1, 1]) AS acs,
        |  arrayDifference(array()) AS ade,
        |  arrayCumSum([5]) AS acs1,
        |  arrayCumSumNonNegative([1, 1, -4, 1]) AS acn
        |FROM `db`.`one`""".stripMargin).collect().head
    assert(r.getString(0) == "https://x.com/a")
    assert(r.getString(1) == "https://x.com/a")
    assert(r.getString(2) == "paul@www.example.com:80") // the doc example
    assert(r.getString(3) == "www.example.com")
    assert(r.getInt(4) == 8080)
    assert(r.getInt(5) == 0)
    assert(r.getInt(6) == 443)
    assert(r.getSeq[String](7) == Seq("a", "b"))
    assert(r.getSeq[String](8) == Seq.empty)
    // the documented extractGroups example; no-match → empty array
    assert(r.getSeq[String](9) == Seq("abc", "111"))
    assert(r.getSeq[String](10) == Seq.empty)
    // arrayDifference: first element 0 then adjacent diffs;
    // arrayCumSum: prefix sums; empty/singleton pass through
    assert(r.getSeq[Int](11) == Seq(0, 4, -3))
    assert(r.getSeq[Int](12) == Seq(1, 2, 3))
    assert(r.getSeq[Any](13) == Seq.empty)
    assert(r.getSeq[Int](14) == Seq(5))
    // the documented clamped-scan example
    assert(r.getSeq[Int](15) == Seq(1, 2, 0, 1))
  }

  test("windowFunnel/retention/uniqUpTo: documented-law pins over an " +
    "integral timestamp (window inclusive; chain-restart dominance; " +
    "conditions out of order never count; strict modes reject)") {
    val spark = SparkSession.builder().master("local[4]")
      .appName("simplejson-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = Files.createTempDirectory("graft_wf_").toString
    val ch = ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chwf").build()
    ch.createDatabase("db")
    ch.newTable("db", "ev").column("g", "Int64").column("t", "Int64")
      .column("e", "String").engine("MergeTree").orderBy("g").create()
    ch.insertReturningCount(
      """INSERT INTO chwf.db.ev VALUES
        |(1, 0, 'A'), (1, 3600, 'B'),
        |(2, 0, 'A'), (2, 3601, 'B'),
        |(3, 0, 'A'), (3, 5, 'B'), (3, 6, 'A'), (3, 7, 'C'),
        |(4, 0, 'B'), (4, 1, 'C'), (4, 2, 'A'),
        |(5, 0, 'C'), (5, 1, 'C'),
        |(6, 0, 'A'), (6, 1, 'B'), (6, 2, 'A'), (6, 3, 'B'), (6, 4, 'A')""".stripMargin)
    val rows = ch.chSql(
      """SELECT `g`,
        |  toInt64(windowFunnel(3600)(`t`, `e` = 'A', `e` = 'B', `e` = 'C'))
        |    AS lvl,
        |  toInt64(retention(`e` = 'A', `e` = 'B', `e` = 'C')[2]) AS r2,
        |  toInt64(uniqUpTo(1)(`e`)) AS ut,
        |  toInt64(sequenceMatch('(?1)(?2)(?3)')(`t`, `e` = 'A',
        |    `e` = 'B', `e` = 'C')) AS s3,
        |  toInt64(sequenceMatch('(?1)(?t<=5)(?2)')(`t`, `e` = 'A',
        |    `e` = 'B')) AS sle,
        |  toInt64(sequenceMatch('(?1)(?t<5)(?2)')(`t`, `e` = 'A',
        |    `e` = 'B')) AS slt,
        |  toInt64(sequenceMatch('(?1).*(?2)')(`t`, `e` = 'A',
        |    `e` = 'B')) AS sst,
        |  sequenceCount('(?1)(?2)')(`t`, `e` = 'A', `e` = 'B') AS sq
        |FROM `db`.`ev` GROUP BY `g` ORDER BY `g`""".stripMargin).collect()
      .map(r => (0 to 8).map(r.getLong))
    // g=1: B exactly AT start+window — inclusive → level 2; the
    // unconstrained subsequence (?1).*(?2) also matches and counts once
    assert(rows(0) == Seq(1L, 2L, 1L, 2L, 0L, 0L, 0L, 1L, 1L))
    // g=2: one tick past the window → level 1
    assert(rows(1) == Seq(2L, 1L, 1L, 2L, 0L, 0L, 0L, 1L, 1L))
    // g=3: the A@6 restart dominates — chain A@0..B@5 extends to C@7
    // through the propagated start (the documented scan law) → 3;
    // (?t<=5) holds at gap 5 exactly, (?t<5) does not
    assert(rows(2) == Seq(3L, 3L, 1L, 2L, 1L, 1L, 0L, 1L, 1L))
    // g=4: B and C BEFORE any A never count → level 1 (the trailing A);
    // retention r2 is 1 (A held AND B held — independent rows)
    assert(rows(3) == Seq(4L, 1L, 1L, 2L, 0L, 0L, 0L, 0L, 0L))
    // g=5: no A at all → level 0; uniqUpTo(1) caps 1 distinct at 1
    assert(rows(4) == Seq(5L, 0L, 0L, 1L, 0L, 0L, 0L, 0L, 0L))
    // g=6 (A,B,A,B,A): sequenceCount counts NON-OVERLAPPING A→B chains
    // → 2; the trailing A starts nothing
    assert(rows(5) == Seq(6L, 2L, 1L, 2L, 0L, 1L, 1L, 1L, 2L))
    // round-17: lower-bound gaps and '.' steps now evaluate (candidate-
    // set DP) — spot-check on this corpus before the dedicated pins
    val r17 = ch.chSql(
      """SELECT `g`,
        |  toInt64(sequenceMatch('(?1)(?t>5)(?2)')(`t`, `e` = 'A',
        |    `e` = 'B')) AS sgt
        |FROM `db`.`ev` GROUP BY `g` ORDER BY `g`""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // g=1: A@0→B@3600, gap 3600 > 5 → 1; g=3: A@0→B@5 gap NOT >5 and
    // the later A@6 has no B after it → 0 (earliest-start dominance:
    // keeping only the LATEST A would also give 0 here, the dedicated
    // inversion pin lives in the round-17 test)
    assert(r17(1L) == 1L && r17(2L) == 1L && r17(3L) == 0L)
    // unknown mode strings still reject loudly (incl. deprecated bare
    // 'strict' — ambiguous across server versions)
    val ex = intercept[Exception] {
      ch.chSql("SELECT windowFunnel(10, 'strict')(`t`, `e` = 'A', " +
        "`e` = 'B') AS v FROM `db`.`ev` GROUP BY `g`").collect()
    }
    assert(ex.getMessage.contains("unknown mode"))
  }

  test("round-17 windowFunnel strict modes + sequenceMatch gap/dot " +
    "extensions: documented-law pins with mode-discriminating patterns") {
    val spark = SparkSession.builder().master("local[4]")
      .appName("simplejson-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = Files.createTempDirectory("graft_wf17_").toString
    val ch = ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chwf17").build()
    ch.createDatabase("db")
    ch.newTable("db", "ev").column("g", "Int64").column("t", "Int64")
      .column("e", "String").engine("MergeTree").orderBy("g").create()
    // 'D' matches no condition — the strict_order intervener
    ch.insertReturningCount(
      """INSERT INTO chwf17.db.ev VALUES
        |(10, 0, 'A'), (10, 1, 'B'), (10, 2, 'D'), (10, 3, 'C'),
        |(11, 0, 'D'), (11, 1, 'A'), (11, 2, 'B'), (11, 3, 'C'),
        |(12, 0, 'A'), (12, 1, 'C'), (12, 2, 'B'),
        |(13, 0, 'A'), (13, 4000, 'B'), (13, 5000, 'A'), (13, 5001, 'B'),
        |  (13, 5002, 'C'),
        |(20, 0, 'A'), (20, 1, 'B'), (20, 2, 'B'), (20, 3, 'C'),
        |(21, 0, 'A'), (21, 1, 'A'), (21, 2, 'B'),
        |(30, 0, 'A'), (30, 5, 'B'), (30, 5, 'C'),
        |(31, 0, 'A'), (31, 0, 'B')""".stripMargin)
    def funnel(modes: String): Map[Long, Long] = ch.chSql(
      s"""SELECT `g`, toInt64(windowFunnel(3600$modes)(`t`, `e` = 'A',
         |  `e` = 'B', `e` = 'C')) AS lvl
         |FROM `db`.`ev` GROUP BY `g`""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dflt = funnel("")
    val so = funnel(", 'strict_order'")
    val sd = funnel(", 'strict_dedup'")
    val si = funnel(", 'strict_increase'")
    // g=10 (A,B,D,C): the doc's own example — D intervenes → 2 under
    // strict_order; default reaches 3
    assert(dflt(10L) == 3L && so(10L) == 2L)
    // g=11: a D BEFORE the chain starts intervenes with nothing → 3
    assert(so(11L) == 3L)
    // g=12 (A,C,B): C is an out-of-order FUNNEL event — intervenes the
    // same as an other-event → 1; default skips it and reaches 2
    assert(dflt(12L) == 2L && so(12L) == 1L)
    // g=13: an in-order but OUT-OF-WINDOW B does not intervene (its
    // predecessor level is reached — it merely fails to promote); the
    // refreshed chain completes → 3 in both modes
    assert(dflt(13L) == 3L && so(13L) == 3L)
    // g=20 (A,B,B,C): the repeated B interrupts under strict_dedup,
    // reporting the REPEATED condition's level → 2; default reaches 3
    assert(dflt(20L) == 3L && sd(20L) == 2L)
    // g=21 (A,A,B): cond1 repeats REFRESH (the refresh case precedes
    // the dedup check) — never interrupt → 2 in both modes
    assert(dflt(21L) == 2L && sd(21L) == 2L)
    // g=30 (A@0, B@5, C@5): the B→C tie violates strict increase → 2;
    // default promotes through the tie → 3
    assert(dflt(30L) == 3L && si(30L) == 2L)
    // g=31 (A@0, B@0): the A→B tie → 1 under strict_increase
    assert(dflt(31L) == 2L && si(31L) == 1L)
    // modes combine: strict_order + strict_dedup on g=20 — the repeat
    // interrupt fires (B@2's predecessor IS reached, so order passes)
    val both = ch.chSql(
      """SELECT toInt64(windowFunnel(3600, 'strict_dedup',
        |  'strict_order')(`t`, `e` = 'A', `e` = 'B', `e` = 'C')) AS lvl
        |FROM `db`.`ev` WHERE `g` = 20 GROUP BY `g`""".stripMargin)
      .collect().head.getLong(0)
    assert(both == 2L)

    // ---- sequenceMatch round-17 tokens; 'D' rows exercise zero-mask
    // recording for '.' steps
    ch.newTable("db", "sq").column("g", "Int64").column("t", "Int64")
      .column("e", "String").engine("MergeTree").orderBy("g").create()
    ch.insertReturningCount(
      """INSERT INTO chwf17.db.sq VALUES
        |(1, 0, 'A'), (1, 3, 'B'), (1, 10, 'B'),
        |(2, 0, 'A'), (2, 8, 'A'), (2, 10, 'B'),
        |(3, 0, 'A'), (3, 3, 'A'), (3, 7, 'B'),
        |(4, 0, 'A'), (4, 1, 'B'),
        |(5, 0, 'A'), (5, 1, 'D'), (5, 2, 'B'),
        |(6, 0, 'A'), (6, 1, 'A'), (6, 2, 'B')""".stripMargin)
    def seq(pat: String): Map[Long, Long] = ch.chSql(
      s"""SELECT `g`, toInt64(sequenceMatch('$pat')(`t`, `e` = 'A',
         |  `e` = 'B')) AS m
         |FROM `db`.`sq` GROUP BY `g`""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val gt5 = seq("(?1)(?t>5)(?2)")
    // g=1: B@10 is >5 from A@0 → 1 (B@3 is not)
    assert(gt5(1L) == 1L)
    // g=2 is the DOMINANCE-INVERSION pin the round-16 scaladoc named:
    // candidates A@0 and A@8 — only the EARLIEST satisfies 10-t>5; a
    // latest-candidate scan (the round-16 law) would answer 0
    assert(gt5(2L) == 1L)
    // g=4: gap 1 → 0
    assert(gt5(4L) == 0L)
    val ge7 = seq("(?1)(?t>=7)(?2)")
    assert(ge7(3L) == 1L && ge7(1L) == 1L && ge7(4L) == 0L)
    // equality gaps need the full candidate SET: g=3 has A@0 and A@3
    // with B@7 — ==4 matches only via the LATER A, ==7 only via the
    // EARLIER; both answer 1 only if both candidates are kept
    val eq4 = seq("(?1)(?t==4)(?2)")
    val eq7 = seq("(?1)(?t==7)(?2)")
    val eq5 = seq("(?1)(?t==5)(?2)")
    assert(eq4(3L) == 1L && eq7(3L) == 1L && eq5(3L) == 0L)
    // '.' = exactly one arbitrary event between the matched steps:
    // adjacent A,B → 0; with a no-condition D between → 1; with a
    // condition-matching A between → 1
    val dot = seq("(?1).(?2)")
    assert(dot(4L) == 0L && dot(5L) == 1L && dot(6L) == 1L)
    // sequenceCount over lower-bound gaps rides the same DP
    val cnt = ch.chSql(
      """SELECT toInt64(sequenceCount('(?1)(?t>5)(?2)')(`t`,
        |  `e` = 'A', `e` = 'B')) AS c
        |FROM `db`.`sq` WHERE `g` = 1 GROUP BY `g`""".stripMargin)
      .collect().head.getLong(0)
    assert(cnt == 1L)

    // ---- sumMapWithOverflow wrap-boundary pins: Int32 values wrap at
    // 32 bits SIGNED (the same-type result law), declared UInt8 store
    // columns wrap UNSIGNED at the declared byte width (r91 plumbing)
    ch.newTable("db", "ov").column("g", "Int64").column("i32", "Int32")
      .column("u8", "UInt8").engine("MergeTree").orderBy("g").create()
    ch.insertReturningCount(
      """INSERT INTO chwf17.db.ov VALUES
        |(1, 2000000000, 200), (1, 2000000000, 100),
        |(2, 2000000000, 7), (2, 147483648, 8)""".stripMargin)
    val ov = ch.chSql(
      """SELECT `g`,
        |  tupleElement(sumMapWithOverflow(['a'], [`i32`]), 2)[1] AS w32,
        |  tupleElement(sumMapWithOverflow(['a'], [`u8`]), 2)[1] AS w8,
        |  tupleElement(sumMap(['a'], [`i32`]), 2)[1] AS exact
        |FROM `db`.`ov` GROUP BY `g` ORDER BY `g`""".stripMargin).collect()
    // g=1: 4e9 wraps to -294967296 at Int32; 300 wraps to 44 at UInt8;
    // plain sumMap keeps the exact Long 4e9
    assert(ov(0).getLong(1) == -294967296L)
    assert(ov(0).getLong(2) == 44L)
    assert(ov(0).getLong(3) == 4000000000L)
    // g=2: the exact 2^31 boundary wraps to Int32.MinValue; 15 no wrap
    assert(ov(1).getLong(1) == -2147483648L)
    assert(ov(1).getLong(2) == 15L)

    // ---- round-17 fn sweep pins: parseDateTime (PARSE-sharable
    // directives), dateAdd/dateSub spellings, RFC 3986 percent
    // encoding (the doc's own example; '~' kept and '*' encoded —
    // NOT java.net.URLEncoder's law), bitmask expansion
    val sw = ch.chSql(
      """SELECT
        |  toString(parseDateTime('2024-03-07 08:05:09',
        |    '%Y-%m-%d %H:%i:%s')) AS pdt,
        |  parseDateTimeOrNull('garbage', '%Y-%m-%d') AS pdn,
        |  toString(parseDateTimeOrZero('garbage', '%F')) AS pdz,
        |  toString(dateAdd(DAY, 3, parseDateTime('2024-03-07 08:05:09',
        |    '%Y-%m-%d %H:%i:%s'))) AS da,
        |  toString(date_sub(parseDateTime('2024-03-07 08:05:09',
        |    '%Y-%m-%d %H:%i:%s'), INTERVAL 1 HOUR)) AS ds,
        |  encodeURLComponent('http://127.0.0.1:8123/?query=SELECT 1;')
        |    AS eu,
        |  encodeURLComponent('a~b*c é') AS eu2,
        |  decodeURLComponent('http%3A%2F%2F127.0.0.1%3A8123%2F%3Fquery' ||
        |    '%3DSELECT%201%3B') AS du,
        |  decodeURLComponent('a+b') AS dup,
        |  encodeURLFormComponent('a b+c') AS ef,
        |  decodeURLFormComponent('a+b%2Bc') AS df,
        |  bitmaskToList(50) AS bl,
        |  bitmaskToList(0) AS bl0,
        |  arrayStringConcat(arrayMap(x -> toString(x),
        |    bitmaskToArray(50)), '|') AS ba
        |FROM `db`.`ov` WHERE `g` = 1 LIMIT 1""".stripMargin).collect().head
    assert(sw.getString(0) == "2024-03-07 08:05:09")
    assert(sw.isNullAt(1))
    assert(sw.getString(2) == "1970-01-01 00:00:00")
    assert(sw.getString(3) == "2024-03-10 08:05:09")
    assert(sw.getString(4) == "2024-03-07 07:05:09")
    assert(sw.getString(5) ==
      "http%3A%2F%2F127.0.0.1%3A8123%2F%3Fquery%3DSELECT%201%3B")
    assert(sw.getString(6) == "a~b%2Ac%20%C3%A9")
    assert(sw.getString(7) == "http://127.0.0.1:8123/?query=SELECT 1;")
    // '+' is NOT a space under RFC 3986; it IS under the Form variant
    assert(sw.getString(8) == "a+b")
    assert(sw.getString(9) == "a+b%2Bc")
    assert(sw.getString(10) == "a b+c")
    assert(sw.getString(11) == "2,16,32") // the documented example
    assert(sw.getString(12) == "")
    assert(sw.getString(13) == "2|16|32")
    // unsupported parse directives and malformed %-sequences are loud
    intercept[Exception] {
      ch.chSql("SELECT parseDateTime('07 Mar', '%d %a') AS v " +
        "FROM `db`.`ov` LIMIT 1").collect()
    }
    intercept[Exception] {
      ch.chSql("SELECT decodeURLComponent('bad%G1') AS v " +
        "FROM `db`.`ov` LIMIT 1").collect()
    }
    intercept[Exception] {
      ch.chSql("SELECT bitmaskToList(-1) AS v " +
        "FROM `db`.`ov` LIMIT 1").collect()
    }
  }

  test("chSql end to end: scanner family, JSONLength, fsd, calendar intervals") {
    val spark = SparkSession.builder().master("local[4]")
      .appName("simplejson-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft_sj_").toString
    val ch = ClickHouseSession.builder(spark)
      .storePath(root).catalogName("chsj").build()
    ch.createDatabase("db")
    ch.newTable("db", "t").column("id", "Int64").column("j", "String")
      .column("ts", "DateTime64(6)").engine("MergeTree").orderBy("id").create()
    ch.insertReturningCount(
      """INSERT INTO chsj.db.t VALUES
        |(1, '{"k":"4e3","arr":[1,2,3],"obj":{"a":1,"b":2},"flag":true}',
        |  timestamp'2024-03-12 10:20:30'),
        |(2, '{"k":-3.4,"s":"hi","url":"https://news.clickhouse.com.tr/"}',
        |  timestamp'2024-02-15 00:00:00')""".stripMargin)
    val rows = ch.chSql(
      """SELECT `id`,
        |  simpleJSONHas(`j`, 'k') AS h,
        |  simpleJSONExtractUInt(`j`, 'k') AS ui,
        |  visitParamExtractInt(`j`, 'k') AS i,
        |  simpleJSONExtractFloat(`j`, 'k') AS f,
        |  simpleJSONExtractBool(`j`, 'flag') AS bl,
        |  simpleJSONExtractRaw(`j`, 'obj') AS raw,
        |  simpleJSONExtractString(`j`, 's') AS st,
        |  JSONLength(`j`, 'arr') AS la,
        |  JSONLength(`j`, 'obj') AS lo,
        |  firstSignificantSubdomain(simpleJSONExtractString(`j`, 'url')) AS fsd,
        |  toStartOfInterval(`ts`, INTERVAL 2 WEEK) AS w2,
        |  toStartOfInterval(`ts`, INTERVAL 1 WEEK) AS w1,
        |  toStartOfInterval(`ts`, INTERVAL 2 MONTH) AS m2,
        |  toStartOfInterval(`ts`, INTERVAL 2 QUARTER) AS q2,
        |  toStartOfInterval(`ts`, INTERVAL 5 YEAR) AS y5
        |FROM `db`.`t` ORDER BY `id`""".stripMargin).collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getInt(1) == 1) // has
    assert(r1.getDecimal(2).longValueExact() == 4L)
    assert(r1.getLong(3) == 4L)
    assert(r1.getDouble(4) == 4000.0)
    assert(r1.getInt(5) == 1)
    assert(r1.getString(6) == """{"a":1,"b":2}""")
    assert(r1.getString(7) == "") // 's' missing on row 1
    assert(r1.getLong(8) == 3L) // arr length
    assert(r1.getLong(9) == 2L) // obj keys
    assert(r1.getString(10) == "")
    // 2024-03-12 → 1-week Monday 2024-03-11; 2-week bucket from the
    // 1970-01-05 origin lands 2024-03-04; months/quarters from 1970-01;
    // years from 1970
    assert(r1.getDate(11).toString == "2024-03-04")
    assert(r1.getDate(12).toString == "2024-03-11")
    assert(r1.getDate(13).toString == "2024-03-01")
    assert(r1.getDate(14).toString == "2024-01-01")
    assert(r1.getDate(15).toString == "2020-01-01")
    val r2 = rows(1)
    assert(r2.getDecimal(2).longValueExact() == 0L) // -3.4 → UInt 0
    assert(r2.getLong(3) == -3L)
    assert(r2.getDouble(4) == -3.4)
    assert(r2.getInt(5) == 0)
    assert(r2.getString(6) == "")
    assert(r2.getString(7) == "hi")
    assert(r2.getLong(8) == 0L) // no arr → 0
    assert(r2.getString(10) == "clickhouse")
    assert(r2.getDate(13).toString == "2024-01-01") // Feb → 2-month bucket Jan
    // pre-origin input: loud reject, never the server's wraparound garbage
    val ex = intercept[Exception] {
      ch.chSql("SELECT toStartOfInterval(" +
        "toDateTime64('1969-06-01 00:00:00.000000', 6), INTERVAL 2 WEEK) " +
        "AS v FROM `db`.`t`").collect()
    }
    assert(ex.getMessage != null)
    // JSONExtractRaw (simdjson family) still rejects loudly
    val ex2 = intercept[IllegalArgumentException] {
      ch.chSql("SELECT JSONExtractRaw(`j`, 'k') AS v FROM `db`.`t`").collect()
    }
    assert(ex2.getMessage.contains("simpleJSONExtractRaw"))
  }
}
