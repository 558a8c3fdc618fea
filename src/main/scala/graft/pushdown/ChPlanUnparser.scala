package graft.pushdown

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.connector.ChScan
import graft.sql.ChSql

/** Catalyst `LogicalPlan` subtree → ClickHouse SQL (the analog of the
  * reference's `Unparser(ClickHouseDialect).plan_to_sql`,
  * /root/reference/src/context/plan_node.rs:75-80).
  *
  * Every level becomes a derived table whose columns are aliased
  * `a<exprId>` — exprIds are unique across the plan, so parent references
  * stay unambiguous even through joins (this sidesteps the subquery-alias
  * bugs the reference hit, plan_node.rs:104-155). The leaf FROM clause is
  * the DSv2 scan's own generated SQL, so column pruning and filter
  * pushdown compose with subtree collapse.
  *
  * Limits/sorts are intentionally NOT unparsed — kept outside the wrapped
  * subtree, matching the reference's deliberate choice (plan_node.rs:150-155).
  */
object ChPlanUnparser {

  final case class Unparsed(sql: String, scope: Map[ExprId, String])

  def aliasOf(id: ExprId): String = s"a${id.id}"

  /** Slice-site marker for keyed-collapse bucket reads. Emitted INSIDE
    * the aggregation statement's WHERE (on the pre-aggregation alias of
    * the shard routing key), so a transport substitutes its hash-mod
    * predicate BEFORE the GROUP BY: the server aggregates 1/N of the
    * rows per slice instead of re-aggregating everything N times and
    * post-filtering — semantically free to move because the predicate is
    * a pure function of the GROUP BY key. Un-substituted the token is an
    * SQL comment and the clause reads `WHERE true` (embedded transports
    * execute once and repartition; they never substitute).
    */
  val SliceOpen = "/*__CH_SLICE__("
  val SliceClose = ")*/ true"

  /** Unparse a subtree; None = subtree not expressible remotely. */
  def unparse(plan: LogicalPlan): Option[Unparsed] = unparse(plan, None)

  /** Unparse with a slice site: `sliceKey` is the exprId of a grouping
    * AttributeReference carrying the shard routing value; the DEEPEST
    * aggregate whose child scope binds it gets the slice token in its
    * WHERE (deeper = more pre-aggregation pruning; every aggregate above
    * it groups by the same key, so whole-group filtering commutes).
    */
  def unparse(plan: LogicalPlan, sliceKey: Option[ExprId]): Option[Unparsed] = {
    val fresh = new AtomicInteger()
    def sub(): String = s"t${fresh.getAndIncrement()}"
    var sliceEmitted = false

    def go(p: LogicalPlan): Option[Unparsed] = p match {

      case DataSourceV2ScanRelation(_, scan: ChScan, output, _, _) =>
        if (output.isEmpty) None // empty-projection scans handled by DSv2 alone
        else {
          val cols = output.map(a => s"${ChSql.quoteIdent(a.name)} AS ${aliasOf(a.exprId)}")
          Some(Unparsed(
            s"SELECT ${cols.mkString(", ")} FROM (${scan.generatedSql}) AS ${sub()}",
            output.map(a => a.exprId -> aliasOf(a.exprId)).toMap))
        }

      // column-pruned COUNT(*) shape: a no-column Project feeding an
      // aggregate — emit a constant column (`SELECT  FROM` is invalid)
      case Project(Nil, child) =>
        go(child).map(c =>
          Unparsed(s"SELECT 1 AS __one FROM (${c.sql}) AS ${sub()}", Map.empty))

      case Project(list, child) =>
        for {
          c <- go(child)
          items <- sequence(list.map {
            case a: Alias =>
              ChExprUnparser.compile(a.child, c.scope)
                .map(s => (s"$s AS ${aliasOf(a.exprId)}", a.exprId))
            case ar: AttributeReference =>
              c.scope.get(ar.exprId).map(n => (s"$n AS ${aliasOf(ar.exprId)}", ar.exprId))
            case _ => None
          })
        } yield Unparsed(
          s"SELECT ${items.map(_._1).mkString(", ")} FROM (${c.sql}) AS ${sub()}",
          items.map { case (_, id) => id -> aliasOf(id) }.toMap)

      case Filter(cond, child) =>
        // Runtime-filter (dynamic pruning) conjuncts are redundant inside a
        // collapsed subtree — the join they pre-filter for ships remotely in
        // the same SQL — so drop them rather than letting an unparseable
        // subquery expression block the collapse.
        val conjuncts = splitConjuncts(cond).filterNot(
          _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
        if (conjuncts.isEmpty) go(child)
        else
          for {
            c <- go(child)
            ws <- sequence(conjuncts.map(ChExprUnparser.compile(_, c.scope)))
          } yield Unparsed(
            s"SELECT * FROM (${c.sql}) AS ${sub()} WHERE ${ws.mkString(" AND ")}", c.scope)

      case j @ Join(left, right, joinType, cond, _) =>
        val kw = joinType match {
          case Inner => Some("JOIN")
          case LeftOuter => Some("LEFT JOIN")
          case RightOuter => Some("RIGHT JOIN")
          case FullOuter => Some("FULL JOIN")
          case LeftSemi => Some("LEFT SEMI JOIN")
          case LeftAnti => Some("LEFT ANTI JOIN")
          case Cross => Some("CROSS JOIN")
          case _ => None
        }
        for {
          k <- kw
          l <- go(left)
          r <- go(right)
          scope = l.scope ++ r.scope
          on <- cond match {
            case Some(cd) => ChExprUnparser.compile(cd, scope).map(s => s" ON $s")
            case None if joinType == Cross || joinType == Inner => Some("")
            case None => None
          }
          outScope = joinType match {
            case LeftSemi | LeftAnti => l.scope
            case _ => scope
          }
          outCols = j.output.flatMap(a => outScope.get(a.exprId))
          if outCols.length == j.output.length
        } yield {
          // a join whose every output column was pruned away (count()
          // over a join) still needs a select list — emit a constant
          val sel = if (outCols.isEmpty) "1 AS __one" else outCols.mkString(", ")
          Unparsed(
            s"SELECT $sel FROM (${l.sql}) AS ${sub()} " +
              s"$k (${r.sql}) AS ${sub()}$on",
            j.output.map(a => a.exprId -> outScope(a.exprId)).toMap)
        }

      // Point-in-time join → server-native ASOF LEFT JOIN. The ON clause
      // carries the equi-key plus the one inequality ClickHouse requires;
      // join_use_nulls=1 pins NULL padding for unmatched left rows (the
      // server default pads with type defaults — a silent value lie).
      // ClickHouse accepts a SETTINGS clause on subquery SELECTs, so the
      // statement stays nestable inside the collapse wrapper.
      case aj: ChAsOfJoin =>
        for {
          l <- go(aj.left)
          r <- go(aj.right)
          lks <- sequence(aj.leftKeys.map(k => l.scope.get(k.exprId)))
          rks <- sequence(aj.rightKeys.map(k => r.scope.get(k.exprId)))
          lt <- l.scope.get(aj.leftTime.exprId)
          rt <- r.scope.get(aj.rightTime.exprId)
          pay <- sequence(aj.payload.map(p => r.scope.get(p.exprId)))
        } yield {
          val leftCols = aj.left.output.map(a => l.scope(a.exprId))
          val paySel = aj.payloadOut.zip(pay).map { case (o, src) =>
            s"$src AS ${aliasOf(o.exprId)}"
          }
          val sel = (leftCols.map(c => s"$c AS $c") ++ paySel).mkString(", ")
          val kw = if (aj.leftJoin) "ASOF LEFT JOIN" else "ASOF JOIN"
          val eqs = lks.zip(rks).map { case (lk, rk) => s"$lk = $rk" }
          Unparsed(
            s"SELECT $sel FROM (${l.sql}) AS ${sub()} $kw " +
              s"(${r.sql}) AS ${sub()} ON ${eqs.mkString(" AND ")} " +
              s"AND $rt ${aj.op} $lt SETTINGS join_use_nulls = 1",
            l.scope ++ aj.payloadOut.map(a => a.exprId -> aliasOf(a.exprId)).toMap)
        }

      case Aggregate(groupingExprs, aggExprs, child, _) =>
        for {
          c <- go(child)
          items <- sequence(aggExprs.map {
            case a: Alias =>
              ChExprUnparser.compile(a.child, c.scope)
                .map(s => (s"$s AS ${aliasOf(a.exprId)}", a.exprId))
            case ar: AttributeReference =>
              c.scope.get(ar.exprId).map(n => (s"$n AS ${aliasOf(ar.exprId)}", ar.exprId))
            case _ => None
          })
          groups <- sequence(groupingExprs.map(g => ChExprUnparser.compile(g, c.scope)))
        } yield {
          val gb = if (groups.isEmpty) "" else s" GROUP BY ${groups.mkString(", ")}"
          // Spark's count() rewrite leaves an Aggregate with ZERO output
          // columns — `SELECT  FROM` is invalid SQL, so emit a constant.
          // Grouped: `SELECT 1 ... GROUP BY k` is one row per group, the
          // Aggregate's own cardinality. UNGROUPED the same shape would
          // be one row per INPUT row — a global aggregate must still
          // aggregate, so ship an actual aggregate function instead.
          val sel =
            if (items.nonEmpty) items.map(_._1).mkString(", ")
            else if (groups.nonEmpty) "1 AS __one"
            else "count(*) AS __one"
          // slice site: bottom-up recursion means the DEEPEST qualifying
          // aggregate claims the token first
          val whereSlice = sliceKey match {
            case Some(id) if !sliceEmitted && c.scope.contains(id) =>
              sliceEmitted = true
              s" WHERE $SliceOpen${c.scope(id)}$SliceClose"
            case _ => ""
          }
          Unparsed(
            s"SELECT $sel FROM (${c.sql}) AS ${sub()}$whereSlice$gb",
            items.map { case (_, id) => id -> aliasOf(id) }.toMap)
        }

      // Window: child columns pass through; each window expression
      // compiles with its own OVER spec (ChExprUnparser.windowSpec).
      // ClickHouse executes standard window SQL, so a remote sort/window
      // no longer forces the subtree local.
      case w @ Window(windowExprs, _, _, child, _) =>
        for {
          c <- go(child)
          wins <- sequence(windowExprs.map {
            case a: Alias =>
              ChExprUnparser.compile(a.child, c.scope)
                .map(s => (s"$s AS ${aliasOf(a.exprId)}", a.exprId))
            case _ => None
          })
        } yield {
          val passthrough = child.output.flatMap(a => c.scope.get(a.exprId))
            .map(n => s"$n AS $n")
          val items = passthrough ++ wins.map(_._1)
          Unparsed(
            s"SELECT ${items.mkString(", ")} FROM (${c.sql}) AS ${sub()}",
            c.scope ++ wins.map { case (_, id) => id -> aliasOf(id) })
        }

      // UNION ALL: children align positionally under fresh aliases
      // (each child's own aliases differ, so every branch re-projects to
      // u0..un and the union's output binds to those positions)
      case u @ Union(children, false, false) =>
        val colNames = u.output.indices.map(i => s"u$i")
        val parts = children.map { c =>
          go(c).flatMap { cu =>
            val cols = c.output.zipWithIndex.map { case (a, i) =>
              cu.scope.get(a.exprId).map(n => s"$n AS ${colNames(i)}")
            }
            if (cols.exists(_.isEmpty)) None
            else Some(s"SELECT ${cols.flatten.mkString(", ")} FROM (${cu.sql}) AS ${sub()}")
          }
        }
        if (parts.exists(_.isEmpty)) None
        else Some(Unparsed(
          parts.flatten.mkString(" UNION ALL "),
          u.output.zipWithIndex.map { case (a, i) => a.exprId -> colNames(i) }.toMap))

      // row expansion: explode (the rewritten clickhouse arrayJoin)
      // becomes ClickHouse's arrayJoin — same SELECT-level row-expanding
      // semantics. Non-outer only (arrayJoin drops empty arrays, as does
      // inner explode). InferFiltersFromGenerate's size(arr)>0 /
      // isnotnull(arr) conjuncts are peeled: arrayJoin already emits no
      // rows for null/empty arrays, and ClickHouse length() on the array
      // wouldn't survive the embedded translator's string length().
      case Generate(Explode(arr), _, false, _, generatorOutput, child0)
          if generatorOutput.length == 1 =>
        val child = child0 match {
          case Filter(cond, gc) =>
            val kept = splitConjuncts(cond).filterNot {
              case GreaterThan(s: Size, Literal(0, _)) => s.child.semanticEquals(arr)
              case IsNotNull(a) => a.semanticEquals(arr)
              case _ => false
            }
            if (kept.isEmpty) gc else Filter(kept.reduce(And), gc)
          case other => other
        }
        for {
          c <- go(child)
          arrSql <- ChExprUnparser.compile(arr, c.scope)
        } yield {
          val out = generatorOutput.head
          val passCols = child.output.flatMap(a => c.scope.get(a.exprId)).map(n => s"$n AS $n")
          val cols = passCols :+ s"arrayJoin($arrSql) AS ${aliasOf(out.exprId)}"
          Unparsed(
            s"SELECT ${cols.mkString(", ")} FROM (${c.sql}) AS ${sub()}",
            c.scope ++ Map(out.exprId -> aliasOf(out.exprId)))
        }

      case _ => None
    }

    go(plan)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def sequence[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.exists(_.isEmpty)) None else Some(xs.flatten)
}
