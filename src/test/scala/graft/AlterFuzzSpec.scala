package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.client.{ChAlterOp, EmbeddedClickHouse}

/** Randomized ALTER TABLE differential: 30 seeded sequences of schema
  * ops (ADD / DROP / RENAME / widening MODIFY) interleaved with inserts
  * under the THEN-CURRENT schema, driven through the embedded client and
  * mirrored in an independent plain-Scala shadow model (schema as
  * (name, chType) pairs, rows as value vectors, defaults computed by
  * hand). At the end the store's full contents and fetched columns must
  * equal the shadow — any divergence in sequential-application order,
  * default filling, rename data preservation, or cast semantics fails
  * the seed. Rejected ops (duplicate add, unknown drop, key column)
  * must leave both sides untouched.
  */
class AlterFuzzSpec extends AnyFunSuite {

  private val root = Files.createTempDirectory("graft_alterfuzz_").toString
  private val client = new EmbeddedClickHouse(root)

  // the embedded store executes on a child of the active session
  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // op palette: chType → (spark type, default value for non-null adds,
  // value generator for inserts)
  private case class Kind(
      chType: String,
      spark: DataType,
      default: Any,
      gen: Random => Any)
  private val kinds: Vector[Kind] = Vector(
    Kind("Int64", LongType, 0L, r => r.nextLong(1000000)),
    Kind("Int32", IntegerType, 0, r => r.nextInt(100000)),
    Kind("Nullable(Int64)", LongType, null,
      r => if (r.nextInt(4) == 0) null else r.nextLong(1000)),
    Kind("String", StringType, "", r => s"s${r.nextInt(100)}"),
    Kind("Nullable(String)", StringType, null,
      r => if (r.nextInt(4) == 0) null else s"n${r.nextInt(100)}"),
    Kind("Bool", BooleanType, false, r => r.nextBoolean()))

  /** widening MODIFYs: (new chType, closed-form value conversion, new
    * insert generator matching the widened Spark type)
    */
  private def widen(ch: String): Option[(String, Any => Any, Random => Any)] = ch match {
    case "Int32" => Some(("Int64",
      x => if (x == null) null else x.asInstanceOf[Int].toLong,
      r => r.nextLong(100000)))
    case "Int64" => Some(("Nullable(Int64)", identity,
      r => if (r.nextInt(4) == 0) null else r.nextLong(1000)))
    case "String" => Some(("Nullable(String)", identity,
      r => if (r.nextInt(4) == 0) null else s"w${r.nextInt(100)}"))
    case _ => None
  }

  test("30 seeded ALTER sequences agree with the shadow model, bit for bit") {
    spark // force the session up before the embedded store needs it
    client.createDatabase("main")
    for (seed <- 0 until 30) {
      val r = new Random(seed)
      val t = s"fz_$seed"
      // shadow: parallel vectors — schema (name, kindIdx-or-chType) + rows
      var names = Vector("id", "c0")
      var types = Vector(kinds(0), kinds(1 + r.nextInt(kinds.size - 1)))
      var rows = Vector.empty[Vector[Any]]
      client.createTable("main", t,
        names.zip(types).map { case (n, k) => n -> k.chType },
        Map("engine" -> "MergeTree", "order_by" -> "id"))

      var nextId = 0L
      var nextCol = 1
      // positioned ADDs move `id` around — pick ALTER targets by name,
      // never by assumed position
      def nonId(r: Random): Int = {
        val is = names.indices.filter(names(_) != "id")
        is(r.nextInt(is.size))
      }
      def insertSome(): Unit = {
        val schema = StructType(names.zip(types).map { case (n, k) =>
          StructField(n, k.spark,
            nullable = graft.types.ClickHouseType.parse(k.chType).nullable) })
        val idAt = names.indexOf("id")
        val fresh = (0 until (1 + r.nextInt(5))).map { _ =>
          val vals = types.zipWithIndex.map { case (k, i) =>
            if (i == idAt) { nextId += 1; nextId } else k.gen(r)
          }
          rows :+= vals
          Row.fromSeq(vals)
        }
        client.insert("main", t, schema, fresh)
      }
      insertSome()

      // one optional snapshot for the EXCHANGE-restore op: (names,
      // types, rows) at snapshot time, held in a twin table built via
      // ATTACH PARTITION FROM
      var snap: Option[(Vector[String], Vector[Kind], Vector[Vector[Any]])] = None
      val snapT = s"${t}_snap"

      for (_ <- 0 until (3 + r.nextInt(4))) {
        r.nextInt(7) match {
          case 5 => // TRUNCATE: rows vanish, schema stays, inserts land again
            client.truncateTable("main", t)
            rows = Vector.empty
          case 6 =>
            snap match {
              case None => // take a snapshot: twin table + part clone
                client.createTable("main", snapT,
                  names.zip(types).map { case (n, k) => n -> k.chType },
                  Map("engine" -> "MergeTree", "order_by" -> "id"))
                client.attachPartitionsFrom("main", snapT, "main", t)
                snap = Some((names, types, rows))
              case Some((sn, st, sr)) => // restore: atomic swap back
                client.exchangeTables("main", t, "main", snapT)
                client.dropTable("main", snapT)
                names = sn; types = st; rows = sr
                snap = None
            }
          case 0 => // ADD, randomly positioned (append / FIRST / AFTER c)
            nextCol += 1
            val n = s"c$nextCol"
            val k = kinds(r.nextInt(kinds.size))
            val (pos, at) = r.nextInt(3) match {
              case 0 => (None, names.size)
              case 1 => (Some(None), 0)
              case _ =>
                val c = r.nextInt(names.size)
                (Some(Some(names(c))), c + 1)
            }
            client.alterTable("main", t, Seq(ChAlterOp.AddColumn(n, k.chType, pos)))
            names = names.patch(at, Seq(n), 0)
            types = types.patch(at, Seq(k), 0)
            rows = rows.map(v => v.patch(at, Seq(k.default), 0))
          case 1 if names.size > 2 => // DROP a non-key, non-id column
            val i = nonId(r)
            client.alterTable("main", t, Seq(ChAlterOp.DropColumn(names(i))))
            names = names.patch(i, Nil, 1); types = types.patch(i, Nil, 1)
            rows = rows.map(v => v.patch(i, Nil, 1))
          case 2 => // RENAME a non-key column
            val i = nonId(r)
            nextCol += 1
            val b = s"c$nextCol"
            client.alterTable("main", t, Seq(ChAlterOp.RenameColumn(names(i), b)))
            names = names.updated(i, b)
          case 3 => // widening MODIFY when the palette offers one
            val i = nonId(r)
            widen(types(i).chType).foreach { case (newCh, conv, gen) =>
              client.alterTable("main", t, Seq(ChAlterOp.ModifyType(names(i), newCh)))
              val p = graft.types.ClickHouseType.parse(newCh)
              types = types.updated(i, Kind(newCh, p.dataType, null, gen))
              rows = rows.map(v => v.updated(i, conv(v(i))))
            }
          case _ if r.nextBoolean() => // TTL: metadata-only until a merge
            // (the fuzz never OPTIMIZEs, so data stays invariant); must
            // type-check as DateTime — far-future epoch seconds
            val expr =
              if (r.nextBoolean())
                Some(s"toDateTime64(${4102444800L + r.nextInt(100)}, 3)")
              else None
            client.alterTable("main", t, Seq(ChAlterOp.ModifyTtl(expr)))
            val got = client.fetchTableOptions("main", t).get("ttl")
            assert(got == expr, s"seed $seed: ttl $got != $expr")
          case _ => // rejected ops leave both sides untouched
            val bad = r.nextInt(3) match {
              case 0 => ChAlterOp.AddColumn(names(r.nextInt(names.size)), "Int64")
              case 1 => ChAlterOp.DropColumn("nope_zz")
              case 2 => ChAlterOp.DropColumn("id") // order_by key
            }
            intercept[Exception](client.alterTable("main", t, Seq(bad)))
        }
        if (r.nextBoolean()) insertSome()
      }

      // compare schema
      assert(client.fetchColumns("main", t) ==
        names.zip(types).map { case (n, k) => n -> k.chType },
        s"seed $seed: schema diverged")
      // compare full contents, ordered by id
      val got = client.query(
        s"SELECT * FROM `main`.`$t` ORDER BY `id`", 1)._2.flatten
        .map(_.toSeq.toVector)
      val want = rows.sortBy(_(names.indexOf("id")).asInstanceOf[Long])
      assert(got.size == want.size, s"seed $seed: ${got.size} vs ${want.size} rows")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"seed $seed row $i: $g != $w (cols $names)")
      }
      if (snap.isDefined) client.dropTable("main", snapT)
      client.dropTable("main", t)
    }
  }
}
