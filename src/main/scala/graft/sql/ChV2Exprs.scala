package graft.sql

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, GeneralScalarExpression, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** DSv2 (`connector.expressions`) → ClickHouse SQL compilers, the v2
  * counterpart of [[ChSql.compileFilter]]'s v1-`Filter` probe. Same
  * contract everywhere: `None` = not expressible remotely, caller keeps
  * the construct local (the reference's exactness probe,
  * /root/reference/src/sql.rs:215-228, applied to aggregates / top-k /
  * runtime filters instead of scan filters).
  */
object ChV2Exprs {

  /** Single-part column reference → its field in `schema`. */
  def columnRef(e: V2Expression, schema: StructType): Option[StructField] =
    bridge.fieldRefName(e).flatMap(n => schema.fields.find(_.name == n))

  private def colSql(e: V2Expression, schema: StructType): Option[String] =
    columnRef(e, schema).map(f => ChSql.quoteIdent(f.name))

  /** v2 literal (Catalyst-internal value) → ClickHouse literal. */
  def literalSql(e: V2Expression): Option[String] =
    bridge.literalParts(e).flatMap { case (v, dt) =>
      ChSql.literal(CatalystTypeConverters.convertToScala(v, dt))
    }

  /** Aggregate function → (SQL, result field). Result types mirror the
    * store engine's ANSI aggregate typing so `readSchema` matches what
    * the remote query actually returns.
    */
  def compileAggregate(f: AggregateFunc, schema: StructType): Option[(String, StructField)] = {
    def sumType(dt: DataType): Option[DataType] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(LongType)
      case FloatType | DoubleType => Some(DoubleType)
      case d if bridge.decimalParts(d).isDefined =>
        bridge.decimalParts(d).map { case (p, s) => DecimalType(math.min(38, p + 10), s) }
      case _ => None
    }
    def orderable(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | DateType | TimestampType | BooleanType => true
      case _ => false
    }
    f match {
      case _: CountStar =>
        Some(("count(*)", StructField("agg", LongType, nullable = false)))
      case c: Count =>
        colSql(c.column, schema).map { col =>
          val d = if (c.isDistinct) "DISTINCT " else ""
          (s"count($d$col)", StructField("agg", LongType, nullable = false))
        }
      case s: Sum =>
        for {
          fld <- columnRef(s.column, schema)
          rt <- sumType(fld.dataType)
        } yield {
          val d = if (s.isDistinct) "DISTINCT " else ""
          (s"sum($d${ChSql.quoteIdent(fld.name)})", StructField("agg", rt))
        }
      case m: Min =>
        columnRef(m.column, schema).filter(f => orderable(f.dataType)).map(fld =>
          (s"min(${ChSql.quoteIdent(fld.name)})", StructField("agg", fld.dataType)))
      case m: Max =>
        columnRef(m.column, schema).filter(f => orderable(f.dataType)).map(fld =>
          (s"max(${ChSql.quoteIdent(fld.name)})", StructField("agg", fld.dataType)))
      case a: Avg =>
        columnRef(a.column, schema).collect {
          // integral/floating only: decimal avg widens scale engine-specifically
          case fld if (fld.dataType match {
            case FloatType | DoubleType => true
            case d => bridge.isIntegral(d)
          }) =>
            val d = if (a.isDistinct) "DISTINCT " else ""
            (s"avg($d${ChSql.quoteIdent(fld.name)})", StructField("agg", DoubleType))
        }
      // statistical aggregates: ClickHouse computes them over Float64
      // exactly like Spark's double-based implementations
      case g: GeneralAggregateFunc if !g.isDistinct =>
        val chName = g.name() match {
          case "VAR_POP" => Some("varPop")
          case "VAR_SAMP" => Some("varSamp")
          case "STDDEV_POP" => Some("stddevPop")
          case "STDDEV_SAMP" => Some("stddevSamp")
          case "COVAR_POP" => Some("covarPop")
          case "COVAR_SAMP" => Some("covarSamp")
          case "CORR" => Some("corr")
          case _ => None
        }
        // Spark wraps integral inputs in CAST(col AS double) — compile
        // the cast through (ClickHouse computes over Float64 either way)
        def numericInput(e: V2Expression): Option[String] = e match {
          case c: org.apache.spark.sql.connector.expressions.Cast =>
            for {
              f <- columnRef(c.expression(), schema)
              if f.dataType.isInstanceOf[NumericType]
              t <- scala.util.Try(graft.types.ClickHouseType.render(c.dataType())).toOption
            } yield s"CAST(${ChSql.quoteIdent(f.name)} AS $t)"
          case other =>
            columnRef(other, schema)
              .filter(_.dataType.isInstanceOf[NumericType])
              .map(f => ChSql.quoteIdent(f.name))
        }
        for {
          n <- chName
          cols <- sequence(g.children().toSeq.map(numericInput))
          if cols.nonEmpty
        } yield (s"$n(${cols.mkString(", ")})", StructField("agg", DoubleType))
      case _ => None
    }
  }

  /** Sort order → `col ASC|DESC NULLS FIRST|LAST` over `schema`'s cols. */
  def compileSortOrder(o: SortOrder, schema: StructType): Option[String] =
    colSql(o.expression, schema).map { col =>
      val dir = if (o.direction == SortDirection.ASCENDING) "ASC" else "DESC"
      val nulls =
        if (o.nullOrdering == NullOrdering.NULLS_FIRST) "NULLS FIRST" else "NULLS LAST"
      s"$col $dir $nulls"
    }

  /** Runtime-filter predicate → boolean SQL over `schema`'s columns.
    * Conservative: anything unrecognized returns None and is simply not
    * applied (runtime filters are an optimization, never required for
    * correctness — Spark re-applies the join itself).
    */
  def compilePredicate(
      p: Predicate, schema: StructType, maxInValues: Int = Int.MaxValue): Option[String] = {
    def operands(g: GeneralScalarExpression): Array[V2Expression] = g.children()
    val kids = operands(p)
    p.name() match {
      case "IN" if kids.length >= 2 && kids.length - 1 <= maxInValues =>
        for {
          col <- colSql(kids.head, schema)
          lits <- sequence(kids.tail.toSeq.map(literalSql))
        } yield s"$col IN (${lits.mkString(", ")})"
      // an oversized runtime IN-list still narrows ordered keys via its
      // bounding range — O(1) SQL size regardless of value count (real
      // engines cap IN pushdown the same way; the join re-applies exactly)
      case "IN" if kids.length >= 2 =>
        // finite numerics only: NaN/Infinity have no BigDecimal form and
        // no meaningful range — their presence skips the degrade entirely
        // (runtime filters are optional, never required for correctness)
        def finite(v: Any): Boolean = v match {
          case d: java.lang.Double => !d.isNaN && !d.isInfinite
          case f: java.lang.Float => !f.isNaN && !f.isInfinite
          case _: Number => true
          case _ => false
        }
        val nums = kids.tail.toSeq.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value() != null && finite(l.value()) =>
            new java.math.BigDecimal(l.value().toString)
        }
        if (nums.length != kids.length - 1) None
        else colSql(kids.head, schema).map { col =>
          val lo = nums.reduce((a, b) => if (a.compareTo(b) <= 0) a else b)
          val hi = nums.reduce((a, b) => if (a.compareTo(b) >= 0) a else b)
          s"($col >= $lo AND $col <= $hi)"
        }
      case op @ ("=" | "<" | "<=" | ">" | ">=" | "<>") if kids.length == 2 =>
        for {
          col <- colSql(kids(0), schema)
          lit <- literalSql(kids(1))
        } yield s"$col $op $lit"
      case "IS_NOT_NULL" if kids.length == 1 =>
        colSql(kids(0), schema).map(c => s"$c IS NOT NULL")
      case "IS_NULL" if kids.length == 1 =>
        colSql(kids(0), schema).map(c => s"$c IS NULL")
      case "AND" if kids.length == 2 =>
        both(kids, schema).map { case (l, r) => s"($l AND $r)" }
      case "OR" if kids.length == 2 =>
        both(kids, schema).map { case (l, r) => s"($l OR $r)" }
      case _ => None
    }
  }

  private def both(kids: Array[V2Expression], schema: StructType): Option[(String, String)] =
    (kids(0), kids(1)) match {
      case (l: Predicate, r: Predicate) =>
        for (cl <- compilePredicate(l, schema); cr <- compilePredicate(r, schema))
          yield (cl, cr)
      case _ => None
    }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None
}
