package graft.pushdown

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.connector.ChScan
import graft.functions.{ClickHouseEval, ClickHouseFn, ClickHousePassthrough}

/** The function-pushdown / federation rule — the Spark analog of the
  * reference's 1540-LoC `ClickHouseFunctionPushdown` AnalyzerRule
  * (/root/reference/src/analyzer/function_pushdown.rs) plus the
  * datafusion-federation subtree collapse (src/federation.rs).
  *
  * Runs in the optimizer's user-provided batch, after Catalyst has done
  * column pruning / filter pushdown into the DSv2 scans, so the collapsed
  * SQL composes with scan pushdown. Three behaviors:
  *
  *  1. Passthrough elimination: any subtree containing `clickhouse(...)`/
  *     `clickhouse_eval`/`clickhouse_fn` expressions is unparsed to
  *     ClickHouse SQL and replaced by a [[ClickHouseRemoteNode]] — the
  *     expressions are Unevaluable, so this rule MUST consume them.
  *  2. Hoisting: when a passthrough sits in a node we cannot collapse
  *     (window, sort, unsupported agg...), it is hoisted into a Project
  *     over the child whose output covers its references — the reference's
  *     "push functions into the child that covers their columns"
  *     (function_pushdown.rs:40-74) — and wrapped there.
  *  3. Federation: joins whose both sides reach only ClickHouse scans that
  *     share one connection key collapse into a single remote query, and
  *     aggregates directly over collapsible subtrees ship whole (the
  *     compute_context gating of sql.rs:413-425).
  *
  * Spark's globally-unique ExprIds replace the reference's ColumnId/
  * SourceContext lineage machinery (source_visitor.rs, source_context.rs):
  * attribute identity IS lineage, which collapses ~1100 LoC of the
  * reference into the scope maps of [[ChPlanUnparser]].
  */
object ClickHouseFunctionPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val hasOurScan = plan.exists {
      case DataSourceV2ScanRelation(_, _: ChScan, _, _, _) => true
      case _ => false
    }
    lazy val hasPassthrough = plan.exists(_.expressions.exists(containsPassthrough))
    if (!hasOurScan && !hasPassthrough) return plan
    if (!hasOurScan && hasPassthrough)
      throw new IllegalStateException(
        "clickhouse()/clickhouse_eval()/clickhouse_fn() require at least one " +
          "ClickHouse table in the query (no remote source to ship the expression to)")
    rewrite(plan)
  }

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case _: ClickHouseRemoteNode => p

    // INSERT INTO <ch-table> SELECT over SAME-STORE tables: the whole
    // statement executes server-side (insertSelect) — zero rows cross
    // the wire. Falls through to the normal recursion (which still
    // collapses the READ side) when the shapes don't line up.
    case a: AppendData =>
      rewriteInsertSelect(a).getOrElse(hoistAndRecurse(p))

    // Remote top-k pre-limit: ORDER BY + LIMIT n ship into the remote SQL
    // while Spark's own Sort+Limit stay in the plan operating on <= n
    // rows — the transfer shrinks from |table| to n. The reference
    // DISABLED limit pushdown into collapsed subtrees because of unparser
    // aliasing bugs (plan_node.rs:150-155); exprId-derived aliases make
    // it safe here. Tie-breaking: any valid top-n under equal sort keys
    // is a correct SQL answer, and the retained local Sort re-orders it.
    case gl @ GlobalLimit(Literal(n: Int, _), ll @ LocalLimit(_, srt @ Sort(order, true, child, _)))
        if collapsible(child) =>
      wrapTopK(child, order, n) match {
        case Some(remote) =>
          gl.copy(child = ll.copy(child = srt.copy(child = remote)))
        case None => hoistAndRecurse(p)
      }

    // Pure LIMIT (no sort) over a collapsible subtree: any n rows are a
    // valid answer — ship LIMIT n remotely, keep the outer limits.
    case gl @ GlobalLimit(Literal(n: Int, _), ll @ LocalLimit(_, child))
        if !child.isInstanceOf[Sort] && collapsible(child) && shouldWrap(child) =>
      wrapWithSuffix(child, s" LIMIT $n") match {
        case Some(remote) => gl.copy(child = ll.copy(child = remote))
        case None => hoistAndRecurse(p)
      }

    // As-of join marker: collapse to server-native ASOF LEFT JOIN when
    // both sides reach one store (neither event stream crosses the wire);
    // otherwise lower to the local tagged-union + window composition —
    // the marker must never reach the planner either way.
    case aj: ChAsOfJoin =>
      (if (collapsible(aj)) wrap(aj) else None)
        .getOrElse(rewrite(aj.expand))

    // joins first try the plain collapse (single domain / shard-key
    // co-located), then the GLOBAL-broadcast shape on sharded clients
    case j: Join =>
      (if (shouldWrap(j)) wrap(j) else None)
        .orElse(rewriteGlobalJoin(j))
        .getOrElse(hoistAndRecurse(j))

    case _ if shouldWrap(p) =>
      wrap(p).getOrElse(hoistAndRecurse(p))
    case _ => hoistAndRecurse(p)
  }

  /** Rows above which a dim side stops being GLOBAL-broadcastable (the
    * inline literal table ships once per shard — the client-side
    * `distributed_product_mode = 'global'`).
    */
  private val GlobalDimRowCap = 65536

  /** GLOBAL-broadcast dim join on a SHARDED client: a join that is NOT
    * shard-key co-located still collapses per shard when one side is a
    * small row-local dim — the dim materializes once on the initiator
    * (exactly what a server's GLOBAL JOIN does,
    * distributed_product_mode='global') and ships inline in each shard's
    * statement, so the FACT side never leaves its shards. Correctness of
    * the per-shard union: the fact side distributes (row-local or
    * key-local) and the dim is COMPLETE on every shard, so
    * union_i(fact_i ⋈ dim) = fact ⋈ dim for every fact-preserving join
    * type; dim-preserving types (RightOuter with dim right, FullOuter)
    * would duplicate unmatched dim rows per shard and never take this
    * path. Bounded: the dim's plan stats must fit the broadcast
    * threshold, a count probe (summed across shards — scalar probes
    * return one row per shard) must fit [[GlobalDimRowCap]], and every
    * value must render as a ClickHouse literal; otherwise the join stays
    * in Spark.
    */
  private def rewriteGlobalJoin(j: Join): Option[LogicalPlan] = {
    val leaves = j.collectLeaves()
    val scans = leaves.collect {
      case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s
    }
    if (scans.length != leaves.length || leaves.isEmpty) return None
    if (scans.map(_.chClient.connectionKey).distinct.length != 1) return None
    val client = scans.head.chClient
    if (client.singleExecutionDomain) return None // plain collapse territory
    val cond = j.condition.getOrElse(return None)
    // candidate (fact, dim) orientations: the dim must be on the
    // non-preserved side and row-local (its subquery unions whole across
    // shards when materialized); the fact side must itself distribute
    def factDistributes(p: LogicalPlan): Boolean = {
      val fScans = p.collectLeaves().collect {
        case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s }
      rowLocal(p) || shardKeyLocal(p, fScans)
    }
    val candidates: Seq[(LogicalPlan, LogicalPlan, String, Boolean)] =
      j.joinType match {
        case Inner => Seq(
          (j.left, j.right, "JOIN", false), (j.right, j.left, "JOIN", true))
        case LeftOuter => Seq((j.left, j.right, "LEFT JOIN", false))
        case LeftSemi => Seq((j.left, j.right, "LEFT SEMI JOIN", false))
        case LeftAnti => Seq((j.left, j.right, "LEFT ANTI JOIN", false))
        case RightOuter => Seq((j.right, j.left, "RIGHT JOIN", true))
        case _ => Seq.empty
      }
    // unit-aware typed accessor ("10MB" parses); <= 0 disables GLOBAL
    // exactly like it disables Spark's own broadcasts
    val threshold = org.apache.spark.sql.internal.SQLConf.get
      .autoBroadcastJoinThreshold
    candidates.view.flatMap { case (fact, dim, kw, dimIsLeft) =>
      if (!rowLocal(dim) || !factDistributes(fact)) None
      else if (threshold <= 0 || dim.stats.sizeInBytes > threshold) None
      else for {
        uFact <- ChPlanUnparser.unparse(fact)
        uDim <- ChPlanUnparser.unparse(dim)
        dimCols = dim.output.map(a => uDim.scope(a.exprId))
        if dim.output.nonEmpty
        dimSql = s"SELECT ${dimCols.mkString(", ")} FROM (${uDim.sql}) AS gdim"
        rows <- globalDimRows(client, dimSql)
        inline <- inlineDimTable(dim.output, rows)
        dimScope = dim.output.map(a =>
          a.exprId -> ChPlanUnparser.aliasOf(a.exprId)).toMap
        scope = uFact.scope ++ dimScope
        on <- ChExprUnparser.compile(cond, scope)
        outScope = j.joinType match {
          case LeftSemi | LeftAnti => uFact.scope
          case _ => scope
        }
        outCols = j.output.flatMap(a => outScope.get(a.exprId))
        if outCols.length == j.output.length
      } yield {
        val sel = if (outCols.isEmpty) "1 AS __one" else outCols.mkString(", ")
        val (lhs, rhs) =
          if (dimIsLeft) (s"($inline) AS gL", s"(${uFact.sql}) AS gR")
          else (s"(${uFact.sql}) AS gL", s"($inline) AS gR")
        val sql = s"SELECT $sel FROM $lhs $kw $rhs ON $on"
        buildRemote(j, ChPlanUnparser.Unparsed(sql,
          j.output.map(a => a.exprId -> outScope(a.exprId)).toMap), "")
      }
    }.headOption.flatten
  }

  /** Memoized GLOBAL dim materializations: (connectionKey, data-version
    * token, alpha-renamed dimSql) → rows. Re-planning the same join —
    * interactively or across AQE stages — otherwise pays the count probe
    * AND the full dim read per planning (VERDICT r12 item 7). Entries
    * are only written under a [[ClickHouseClient.dataVersionToken]]
    * (staleness must be detectable; wire transports re-probe), and the
    * KEY alpha-renames the exprId-derived `c<id>` aliases by first
    * occurrence — a rebuilt DataFrame mints fresh exprIds for the same
    * query, and positional renaming makes those texts collide exactly
    * when the statements are identical. Rows cache, not inline SQL:
    * the inline rendering carries the CURRENT planning's aliases.
    */
  private val globalDimCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[org.apache.spark.sql.Row]]

  /** Test hook: number of plan-time dim probes that actually hit the
    * store (cache misses).
    */
  private[graft] val globalDimProbes = new java.util.concurrent.atomic.AtomicLong

  // generated tokens only: column aliases `a<exprId>` (aliasOf) and
  // subquery aliases `t<counter>` — real identifiers are always
  // backtick-quoted by the unparser, so bare tokens not adjacent to a
  // backtick are guaranteed generated (a genuine column named a1 appears
  // as `a1` and is left alone)
  private val AliasToken = raw"(?<![`\w])([at])(\d+)(?![`\w])".r

  private def alphaRename(sql: String): String = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    AliasToken.replaceAllIn(sql, m => {
      val id = seen.getOrElseUpdate(m.group(1) + m.group(2), seen.size)
      s"${m.group(1)}§$id"
    })
  }

  /** The dim rows for a GLOBAL collapse, memoized per (connection,
    * data version, canonical statement); None when the dim is empty or
    * over [[GlobalDimRowCap]].
    */
  private def globalDimRows(
      client: graft.client.ClickHouseClient,
      dimSql: String): Option[Seq[org.apache.spark.sql.Row]] = {
    val key = client.dataVersionToken.map(tok =>
      client.connectionKey + " " + tok + " " + alphaRename(dimSql))
    key.flatMap(k => Option(globalDimCache.get(k))) match {
      case Some(rows) => Some(rows)
      case None =>
        globalDimProbes.incrementAndGet()
        // count probe first: one row PER SHARD — fold with a sum. Decode
        // defensively: a wire transport types count() as UInt64, which
        // lands as Decimal(20,0), not Long
        val n = client.query(s"SELECT count(*) AS n FROM ($dimSql) AS gcnt", 1)
          ._2.flatten.map(_.get(0) match {
            case v: Number => v.longValue()
            case other => other.toString.toLong
          }).sum
        if (n <= 0 || n > GlobalDimRowCap) None
        else {
          val rows = client.query(dimSql, 1)._2.flatten
          key.foreach { k =>
            if (globalDimCache.size > 64) globalDimCache.clear()
            globalDimCache.put(k, rows)
          }
          Some(rows)
        }
    }
  }

  /** Render materialized dim rows as an inline UNION ALL literal table
    * whose first row CASTs every column to its declared ClickHouse type
    * (so NULLs and empty-ish branches type correctly on both transports)
    * and aliases the exprId-derived column names the join scope uses.
    * None when any value has no ClickHouse literal rendering.
    */
  private def inlineDimTable(
      output: Seq[Attribute], rows: Seq[org.apache.spark.sql.Row]): Option[String] = {
    val rendered = rows.map { r =>
      val lits = output.indices.map(i => graft.sql.ChSql.literal(r.get(i)))
      if (lits.exists(_.isEmpty)) return None
      lits.flatten
    }
    if (rendered.isEmpty) return None
    val first = rendered.head.zip(output).map { case (lit, a) =>
      s"CAST($lit AS ${graft.types.ClickHouseType.render(a.dataType, nullable = true)})" +
        s" AS ${ChPlanUnparser.aliasOf(a.exprId)}"
    }
    val rest = rendered.tail.map(ls => s"SELECT ${ls.mkString(", ")}")
    Some((s"SELECT ${first.mkString(", ")}" +: rest).mkString(" UNION ALL "))
  }

  /** Collapse `child` with a remote ORDER BY + LIMIT appended. */
  private def wrapTopK(
      child: LogicalPlan,
      order: Seq[SortOrder],
      n: Int): Option[LogicalPlan] =
    ChPlanUnparser.unparse(child).flatMap { u =>
      sequenceOpt(order.map { so =>
        ChExprUnparser.compile(so.child, u.scope).map { e =>
          s"$e ${so.direction.sql} ${so.nullOrdering.sql}"
        }
      }).flatMap { orderParts =>
        // ORDER BY references the inner aliases, still in scope under fin
        buildRemote(child, u, s" ORDER BY ${orderParts.mkString(", ")} LIMIT $n")
      }
    }

  /** Collapse `child` and append a SQL suffix to the final select. */
  private def wrapWithSuffix(child: LogicalPlan, suffix: String): Option[LogicalPlan] =
    ChPlanUnparser.unparse(child).flatMap(u => buildRemote(child, u, suffix))

  private def buildRemote(
      child: LogicalPlan,
      u: ChPlanUnparser.Unparsed,
      suffix: String): Option[LogicalPlan] = {
    val scans = child.collectLeaves().collect {
      case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s
    }
    if (scans.isEmpty) None
    else {
      // a fully column-pruned child (count() over a collapsed join/agg)
      // has ZERO output columns — `SELECT  FROM` is invalid SQL, so ship
      // a constant column and surface it as a synthetic attribute (the
      // parent count references nothing, extra output is legal). The
      // constant is CAST to Int32 because a bare `1` types UInt8 on a
      // real server — decoded ShortType, which the strict
      // coerce_schemas=false drift check would (rightly) refuse against
      // the declared IntegerType.
      val nodeOutput =
        if (child.output.nonEmpty) child.output
        else Seq(AttributeReference("__one", org.apache.spark.sql.types.IntegerType,
          nullable = false)())
      val finalCols =
        if (child.output.isEmpty) Seq("CAST(1 AS Int32) AS c0")
        else child.output.zipWithIndex
          .map { case (a, i) => s"${u.scope(a.exprId)} AS c$i" }
      val sql = s"SELECT ${finalCols.mkString(", ")} FROM (${u.sql}) AS fin$suffix"
      // Range-split cursor for the collapsed read: only for shapes a
      // per-slice re-execution cannot corrupt — no LIMIT anywhere (its
      // row choice is per-execution), no nondeterministic expressions.
      // Output columns are aliased c0..cn on the wire, so the cursor
      // maps to its alias.
      val splitSafe = !suffix.contains(" LIMIT ") &&
        !child.exists {
          case _: GlobalLimit | _: LocalLimit => true
          // ASOF tie picks are unspecified: two slice re-executions may
          // resolve a tied (key, time) differently, so a sliced read
          // could duplicate or lose the row whose payload changed
          case _: ChAsOfJoin => true
          case p => p.expressions.exists(e => !e.deterministic)
        }
      val (splitBy, splitBuckets, slicedSql) =
        if (!splitSafe) (None, false, None)
        else child match {
          case agg: Aggregate =>
            // a SHARD-KEY-grouped collapse (the r41 shape) emits one row
            // per routing-key value — corpus-proportional at scale, so it
            // slices on the key. HASH-mod buckets, not value ranges: a
            // range split would pay one full extra execution of the
            // aggregation for the min/max probe, while bucket slices need
            // no extremes; hash partitions of the grouping column hold
            // whole, disjoint groups (deterministic), and the slice
            // predicate is a function of the server's own GROUP BY key.
            // A non-keyed aggregate keeps one stream: its result is
            // small and per-slice re-execution buys nothing.
            val cur = for {
              key <- scans.head.chClient.shardRoutingColumn
              ks <- shardKeyAttrs(agg, key)
              if ks.nonEmpty
              c <- child.output.zipWithIndex.collectFirst {
                case (a, i) if ks.contains(a) => s"c$i"
              }
            } yield c
            // re-unparse with the slice site INSIDE the aggregation
            // statement's WHERE: a real server evaluates an outer WHERE
            // over a GROUP BY subquery post-aggregation (N slices x full
            // re-aggregation) unless its optimizer moves it; the inner
            // placement makes each slice aggregate only its own rows.
            // The slice key is a grouping AttributeReference carrying
            // the routing value in the aggregate's CHILD scope.
            val resliced = if (cur.isEmpty) None else for {
              key <- scans.head.chClient.shardRoutingColumn
              cks <- shardKeyAttrs(agg.child, key)
              inner <- agg.groupingExpressions.collectFirst {
                case a: AttributeReference if cks.contains(a) => a
              }
              u2 <- ChPlanUnparser.unparse(child, Some(inner.exprId))
              if u2.sql.contains(ChPlanUnparser.SliceOpen)
            } yield s"SELECT ${finalCols.mkString(", ")} FROM (${u2.sql}) AS fin$suffix"
            (cur, cur.isDefined, resliced)
          case _ =>
            (scans.head.chSplitBy.flatMap { c =>
              child.output.zipWithIndex.collectFirst {
                case (a, i) if a.name.equalsIgnoreCase(c) => s"c$i"
              }
            }, false, None)
        }
      Some(ClickHouseRemoteNode(nodeOutput, slicedSql.getOrElse(sql),
        scans.head.chClient,
        scans.head.chStreams, remoteSizeEstimate(child, suffix),
        coerce = scans.forall(_.chCoerce), splitBy = splitBy,
        splitBuckets = splitBuckets))
    }
  }

  /** Shape-aware transfer estimate for a collapsed subtree: grouped
    * aggregates shrink ~two orders vs their input (floor 8 KiB, cap
    * 1 MiB — broadcastable but honest about non-trivial group counts); a
    * LIMIT-topped collapse is bounded small; row-preserving shapes
    * (window/filter/join) keep the child plan's own statistics, which
    * flow up from the scans' SupportsReportStatistics. Join placement
    * and AQE then decide from real sizes instead of a hardcoded "tiny".
    */
  private def remoteSizeEstimate(child: LogicalPlan, suffix: String): BigInt = {
    val base = child.stats.sizeInBytes
    child match {
      case _: Aggregate => (base / 100).max(BigInt(8) << 10).min(BigInt(1) << 20)
      case _ if suffix.contains(" LIMIT ") => base.min(BigInt(1) << 20)
      case _ => base
    }
  }

  private def sequenceOpt[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.exists(_.isEmpty)) None else Some(xs.flatten)

  /** Some(command) when this AppendData is a same-store INSERT SELECT a
    * single remote statement can satisfy. Conservative by construction:
    * every read leaf must be a ChScan on the TARGET's connection key;
    * the transport must be a single execution domain (a sharded client
    * would need the client-side routing the Spark write path performs);
    * write options must be empty (an option the server path cannot
    * honor must not be silently dropped); and the query must unparse.
    * Spark has already aligned the query's output to the table's column
    * order at analysis, so the remote SELECT aliases positionally to
    * the sink's names (insertSelect re-verifies names AND types).
    */
  private def rewriteInsertSelect(a: AppendData): Option[LogicalPlan] =
    a.table match {
      case r: DataSourceV2Relation => r.table match {
        case t: graft.connector.ClickHouseTable
            if a.writeOptions.isEmpty && t.chClient.singleExecutionDomain =>
          val leaves = a.query.collectLeaves()
          val scans = leaves.collect {
            case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s
          }
          val sink = t.columns().map(_.name)
          if (scans.length != leaves.length || leaves.isEmpty ||
            !scans.forall(_.chClient.connectionKey == t.chClient.connectionKey) ||
            sink.length != a.query.output.length) None
          else {
          // NOT-NULL sink columns make the analyzer wrap the query's
          // outputs in AssertNotNull, which no remote dialect carries —
          // strip it HERE ONLY: insertSelect's runtime NULL guard
          // raises the same loud per-row error server-side, so the
          // zero-copy collapse keeps identical failure semantics.
          // (Read-path unparse must NOT strip it — a remote NULL would
          // silently replace Spark's error.)
          val query = a.query.transformExpressions {
            case org.apache.spark.sql.catalyst.expressions.objects
              .AssertNotNull(c, _) => c
          }
          ChPlanUnparser.unparse(query).map { u =>
            val sel = query.output.zip(sink).map { case (attr, name) =>
              s"${u.scope(attr.exprId)} AS ${graft.sql.ChSql.quoteIdent(name)}"
            }
            val full = s"SELECT ${sel.mkString(", ")} FROM (${u.sql}) AS __ins"
            val refreshName = r.catalog.map { c =>
              (Seq(c.name()) ++
                r.identifier.map(i => i.namespace().toSeq :+ i.name())
                  .getOrElse(Seq(t.chDb, t.chTable))).mkString(".")
            }
            ChInsertSelectCommand(t.chClient, t.chDb, t.chTable, full, refreshName)
          }
          }
        case _ => None
      }
      case _ => None
    }

  private def hoistAndRecurse(p: LogicalPlan): LogicalPlan = {
    val hoisted = hoistPassthroughs(p)
    hoisted.mapChildren(rewrite)
  }

  /** A subtree is worth collapsing when it must be (passthroughs) or when
    * federation wins (multi-scan join, or aggregation over remote data
    * that shrinks the transfer).
    */
  private def shouldWrap(p: LogicalPlan): Boolean = {
    def ourScans(q: LogicalPlan): Int = q.collectLeaves().count {
      case DataSourceV2ScanRelation(_, _: ChScan, _, _, _) => true
      case _ => false
    }
    def allLeavesOurs(q: LogicalPlan): Boolean = {
      val leaves = q.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case DataSourceV2ScanRelation(_, _: ChScan, _, _, _) => true
        case _ => false
      }
    }
    if (!allLeavesOurs(p)) false
    else {
      val subtreeHasPassthrough =
        p.exists(_.expressions.exists(containsPassthrough))
      val federatable = p match {
        case _: Join | _: Union => ourScans(p) >= 2
        case _: Aggregate => true
        // window compute ships to the store that already holds the rows
        // (same row count back, but the sort/partition work stays remote)
        case _: Window => true
        // a residual Filter here means V2 scan pushdown could NOT express
        // the predicate (OR-of-LIKE, regex, ...); collapsing it shrinks
        // the transfer to the matching rows. wrap() falls back when the
        // predicate doesn't unparse either. A DynamicPruning conjunct,
        // though, marks a runtime-filter site whose join is an ANCESTOR
        // (outside this subtree): keep the DSv2 scan so its
        // SupportsRuntimeV2Filtering IN-list narrows the remote read at
        // execution — collapsing would silently discard it. (When the
        // pruned join itself collapses, the DPP filter is nested inside
        // that subtree and ChPlanUnparser drops it as redundant.)
        case f: Filter => !f.condition.exists(_.isInstanceOf[DynamicPruning])
        // a projection that provably SHRINKS the wire: every output is
        // bounded-width (narrow type, or a digest with fixed output)
        // while at least one consumed column is unbounded — computing it
        // in the store ships digests instead of documents. DPP-marked
        // subtrees keep their DSv2 scan (same reasoning as Filter above).
        case prj: Project =>
          def wide(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
            case org.apache.spark.sql.types.StringType |
                 org.apache.spark.sql.types.BinaryType => true
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType => true
            case _ => false
          }
          def bounded(e: Expression): Boolean = e match {
            case a: Alias => bounded(a.child)
            case _: Md5 | _: Sha1 | _: Sha2 => true // fixed-size hex digests
            case _ => !wide(e.dataType)
          }
          val noDpp = !prj.exists {
            case f: Filter => f.condition.exists(_.isInstanceOf[DynamicPruning])
            case _ => false
          }
          noDpp && prj.projectList.forall(bounded) &&
            prj.references.exists(a => wide(a.dataType))
        case _ => false
      }
      subtreeHasPassthrough || federatable
    }
  }

  /** Collapse subtree → remote node, gated on a single connection key for
    * every scan (JoinPushDown::AllowedFor semantics).
    */
  private def wrap(p: LogicalPlan): Option[LogicalPlan] = {
    val scans = p.collectLeaves().collect {
      case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s
    }
    val keys = scans.map(_.chClient.connectionKey).distinct
    if (keys.length != 1) None
    // same execution-domain gate as collapsible(): a sharded client runs
    // the collapsed statement per shard — only row-local or shard-key-
    // local subtrees distribute over that union (a collapsed ungrouped
    // Aggregate would return one SHARD's aggregate as if it were the
    // whole result)
    else if (!scans.forall(_.chClient.singleExecutionDomain) && !rowLocal(p) &&
      !shardKeyLocal(p, scans)) None
    else ChPlanUnparser.unparse(p).flatMap(u => buildRemote(p, u, ""))
  }

  /** Move passthrough expressions out of a node we will not collapse into
    * a Project over the child whose output covers their references; the
    * recursion then wraps that Project.
    */
  private def hoistPassthroughs(p: LogicalPlan): LogicalPlan = {
    if (p.children.isEmpty || !p.expressions.exists(containsPassthrough)) return p

    // aliases to add at each hoist site, keyed by node IDENTITY (the same
    // subtree can appear structurally equal in two places)
    val aliasesBySite =
      new java.util.IdentityHashMap[LogicalPlan, Vector[Alias]]()
    var folded = false

    // a passthrough may hoist into a site only if (a) the site covers its
    // references and can collapse, and (b) the expression provably compiles
    // to remote SQL — otherwise hoisting would loop: wrap fails, hoist
    // again, forever (the reference guards this with its semantic-violation
    // checks, function_pushdown.rs:475-643)
    def compilesAgainst(e: Expression, c: LogicalPlan): Boolean = {
      val dummyScope = c.output.map(a => a.exprId -> "x").toMap
      ChExprUnparser.compile(e, dummyScope).isDefined
    }

    def qualifies(d: LogicalPlan, e: Expression): Boolean =
      e.references.subsetOf(d.outputSet) && collapsible(d) && compilesAgainst(e, d)

    // Hoist site: the shallowest qualifying node reachable from a child
    // through OUTPUT-PRESERVING nodes (Join/Filter pass their children's
    // attributes through, so a column added at the site surfaces at p
    // unchanged). Descending past the direct child matters when a
    // federated/decorrelated join mixes a ClickHouse side with a local
    // side: the join itself can't collapse, but the ClickHouse branch can.
    // Only sides NOT null-padded by the join may host the hoist: an
    // expression computed below e.g. the right side of a LEFT OUTER join
    // sees the stored value where the join would emit NULL, so f(NULL)
    // (ifNull/toString/...) would silently differ for unmatched rows.
    def findSite(c: LogicalPlan, e: Expression): Option[LogicalPlan] =
      if (qualifies(c, e)) Some(c)
      else c match {
        case j: Join =>
          val sides = j.joinType match {
            case Inner | Cross => j.children
            case LeftOuter | LeftSemi | LeftAnti => Seq(j.left)
            case RightOuter => Seq(j.right)
            case _ => Seq.empty // FullOuter & exotic types: both sides padded
          }
          sides.view.flatMap(ch => findSite(ch, e)).headOption
        case f: Filter => findSite(f.child, e)
        case _ => None
      }

    val rewritten = p.mapExpressions { e =>
      e.transformDown {
        case pt if isPassthrough(pt) =>
          p.children.view.flatMap(c => findSite(c, pt)).headOption match {
            case Some(site) =>
              val alias = Alias(pt, s"__ch_pushed_${pt.hashCode.abs}")()
              aliasesBySite.put(site,
                Option(aliasesBySite.get(site)).getOrElse(Vector.empty) :+ alias)
              alias.toAttribute
            // a reference-free passthrough (e.g. clickhouse(abs(2)) above
            // a FEDERATED join, e2e.rs:856) has no child to hoist into —
            // it is a remote SCALAR: evaluate it on the store once and
            // fold to a literal, as the reference's scalar resolution does
            case None if pt.references.isEmpty =>
              folded = true
              remoteScalarLiteral(p, pt).getOrElse(throw new IllegalStateException(
                s"cannot evaluate ClickHouse scalar remotely: ${pt.sql}"))
            case None => throw new IllegalStateException(
              s"cannot push ClickHouse expression to a remote source " +
                s"(unsupported expression shape or mixed sources): ${pt.sql}")
          }
      }
    }

    if (aliasesBySite.isEmpty)
      // scalar folds rewrite expressions without adding child Projects —
      // returning the ORIGINAL p here would silently discard them
      (if (folded) rewritten else p)
    else {
      val newChildren = p.children.map { c =>
        if (!subtreeHasSite(c, aliasesBySite)) c
        else c.transformDown {
          case node if aliasesBySite.containsKey(node) =>
            // remove after applying: transformDown revisits the inserted
            // Project's child (same identity) and must not wrap twice
            val extra = aliasesBySite.remove(node)
            Project(node.output ++ extra, node)
        }
      }
      rewritten.withNewChildren(newChildren)
    }
  }

  private def subtreeHasSite(
      c: LogicalPlan,
      sites: java.util.IdentityHashMap[LogicalPlan, Vector[Alias]]): Boolean =
    c.exists(n => sites.containsKey(n))

  // Memoized remote scalar folds: the rule re-runs on every optimizer
  // pass (and on each AQE re-plan), and each re-run repeated the blocking
  // remote round-trip. Volatile functions are excluded so e.g. now() is
  // still re-evaluated per fold site rather than frozen for the JVM.
  private val scalarCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Any, org.apache.spark.sql.types.DataType)]

  // prefix-matched on call sites so now64(, rand32(, generateUUIDv4( and
  // friends are all caught, not just the bare names
  private val volatileFnCall =
    raw"(?i)\b(now|today|yesterday|rand|random|uuid|generateuuid)\w*\s*\(".r

  /** Evaluate a reference-free passthrough as a one-row remote scalar
    * query against any ClickHouse scan reachable from `p`, folding the
    * result to a (cast) literal.
    */
  private def remoteScalarLiteral(p: LogicalPlan, pt: Expression): Option[Expression] = {
    val scanOpt = p.collectLeaves().collectFirst {
      case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s
    }
    for {
      scan <- scanOpt
      sql <- ChExprUnparser.compile(pt, Map.empty)
    } yield {
      val key = (scan.chClient.connectionKey, sql)
      val cacheable = volatileFnCall.findFirstIn(sql).isEmpty
      val (v, dt) = {
        val hit = if (cacheable) scalarCache.get(key) else null
        if (hit != null) hit
        else {
          val evaluated =
            try {
              val (schema, parts) = scan.chClient.query(s"SELECT $sql AS v", 1)
              (parts.flatten.headOption.map(_.get(0)).orNull, schema.fields(0).dataType)
            } catch {
              case e: Exception => throw new IllegalStateException(
                s"remote evaluation of ClickHouse scalar failed for `$sql`: ${e.getMessage}", e)
            }
          if (cacheable) scalarCache.put(key, evaluated)
          evaluated
        }
      }
      val lit = Literal.create(v, dt)
      if (lit.dataType == pt.dataType) lit
      else Cast(lit, pt.dataType, Some("UTC"))
    }
  }

  /** Can this subtree in principle collapse (all leaves ours, one key)? */
  private def collapsible(p: LogicalPlan): Boolean = {
    val leaves = p.collectLeaves()
    val scans = leaves.collect {
      case DataSourceV2ScanRelation(_, s: ChScan, _, _, _) => s
    }
    scans.length == leaves.length && leaves.nonEmpty &&
      scans.map(_.chClient.connectionKey).distinct.length == 1 &&
      // a collapsed subtree executes as ONE remote statement; a sharded
      // client runs it per shard and unions — wrong for joins/aggregates/
      // windows/set-ops (shard-local results are not the whole-result
      // semantics the subtree declared). ROW-LOCAL subtrees (projections/
      // filters over one table, incl. clickhouse() expression shipping)
      // distribute over the union unchanged, and the rule's LIMIT/top-k
      // entry points RETAIN the outer Sort/Limit nodes, so a per-shard
      // LIMIT/ORDER-BY suffix is a correct superset bound there too.
      // SHARD-KEY-LOCAL subtrees (joins/aggregates/windows keyed on the
      // catalog's declared shard_by routing column) ALSO distribute:
      // co-located keys make each shard's slice self-contained.
      (scans.forall(_.chClient.singleExecutionDomain) || rowLocal(p) ||
        shardKeyLocal(p, scans))
  }

  /** True when every cross-row operator in `p` is keyed on the sharded
    * client's declared routing column — then `p`'s semantics distribute
    * over the union of per-shard executions (equal routing values
    * co-reside by the write path's placement hash; NULLs all ride shard
    * 0, so the NULL group is whole too and NULL join keys never match).
    * The client-side expression of ClickHouse's co-located Distributed
    * JOIN (`distributed_product_mode = 'local'`) and
    * `optimize_distributed_group_by_sharding_key`.
    */
  private def shardKeyLocal(p: LogicalPlan, scans: Seq[ChScan]): Boolean =
    scans.headOption.flatMap(_.chClient.shardRoutingColumn)
      .exists(key => shardKeyAttrs(p, key).isDefined)

  /** Some(attrs) iff `p` distributes over the per-shard union given rows
    * co-located by `key`; `attrs` = output attributes still carrying the
    * resident shard's routing value (what a parent join/aggregate may key
    * on). None = does not distribute. Scans of tables WITHOUT the routing
    * column return Some(empty): row-local work over them distributes, but
    * nothing above can claim key-alignment through them.
    */
  private def shardKeyAttrs(p: LogicalPlan, key: String): Option[AttributeSet] = p match {
    case DataSourceV2ScanRelation(_, _: ChScan, output, _, _) =>
      // only placement-STABLE key types carry co-location (the write
      // path rejects unstable shard_by types, but data loaded before
      // that guard — or read-only declarations — must not be trusted)
      Some(AttributeSet(output.filter(a =>
        a.name == key &&
          graft.client.ShardedClickHouseClient.placementStable(a.dataType))))
    case proj: Project =>
      shardKeyAttrs(proj.child, key).map { ks =>
        AttributeSet(proj.projectList.collect {
          case a: AttributeReference if ks.contains(a) => a
          case al @ Alias(ar: AttributeReference, _) if ks.contains(ar) =>
            al.toAttribute
        })
      }
    case f: Filter => shardKeyAttrs(f.child, key)
    case sa: SubqueryAlias => shardKeyAttrs(sa.child, key)
    case j: Join =>
      for {
        lk <- shardKeyAttrs(j.left, key)
        rk <- shardKeyAttrs(j.right, key)
        out <- shardKeyJoin(j, lk, rk)
      } yield out
    case agg: Aggregate =>
      shardKeyAttrs(agg.child, key).flatMap { ks =>
        val keyGrouped = agg.groupingExpressions.exists {
          case a: AttributeReference => ks.contains(a)
          case _ => false
        }
        if (!keyGrouped) None // cross-shard groups would double-count
        else Some(AttributeSet(agg.aggregateExpressions.collect {
          case a: AttributeReference if ks.contains(a) => a
          case al @ Alias(ar: AttributeReference, _) if ks.contains(ar) =>
            al.toAttribute
        }))
      }
    case w: Window =>
      shardKeyAttrs(w.child, key).flatMap { ks =>
        val keyPartitioned = w.partitionSpec.exists {
          case a: AttributeReference => ks.contains(a)
          case _ => false
        }
        if (keyPartitioned) Some(ks) else None // frames stay intra-shard
      }
    // as-of joins match only within equal key values, so a routing-keyed
    // as-of distributes exactly like a LeftOuter equi-join: every
    // candidate match lives on the probe row's own shard, and only the
    // (non-padded) left side still carries placement truth
    case aj: ChAsOfJoin =>
      for {
        lk <- shardKeyAttrs(aj.left, key)
        rk <- shardKeyAttrs(aj.right, key)
        if aj.leftKeys.lazyZip(aj.rightKeys).exists { (a, b) =>
          lk.contains(a) && rk.contains(b) && a.dataType == b.dataType
        }
      } yield lk
    case _ => None
  }

  /** A join distributes iff its condition CONJUNCTION includes equality
    * between routing-carrying attributes of both sides with IDENTICAL
    * types (the placement hash is the JVM value hash — equal values of
    * different widths may box to different hashCodes, so a cross-type
    * equi-join could match rows living on different shards). Extra
    * conjuncts only restrict matches further — still co-located.
    */
  private def shardKeyJoin(
      j: Join, lk: AttributeSet, rk: AttributeSet): Option[AttributeSet] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    // EqualNullSafe too: the INTERSECT/EXCEPT-to-semi-join rewrite
    // compares with <=>, and NULL routing values all ride shard 0, so
    // null-safe key matches are co-located as well
    val keyEq = j.condition.toSeq.flatMap(conjuncts).exists {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.dataType == b.dataType =>
        (lk.contains(a) && rk.contains(b)) || (lk.contains(b) && rk.contains(a))
      case EqualNullSafe(a: AttributeReference, b: AttributeReference)
          if a.dataType == b.dataType =>
        (lk.contains(a) && rk.contains(b)) || (lk.contains(b) && rk.contains(a))
      case _ => false
    }
    if (!keyEq) None
    else j.joinType match {
      case Inner => Some(lk ++ rk)
      // semi/anti/outer: every potential match is on the probe row's own
      // shard, so per-shard existence checks and null-padding are exact;
      // only the non-padded side still carries placement truth
      case LeftSemi | LeftAnti | LeftOuter => Some(lk)
      case RightOuter => Some(rk)
      case _ => None // FullOuter pads both sides; Cross has no key at all
    }
  }

  /** Projections/filters over exactly one scan: semantics distribute over
    * a union of shard-local executions.
    */
  private def rowLocal(p: LogicalPlan): Boolean = p match {
    case DataSourceV2ScanRelation(_, _: ChScan, _, _, _) => true
    case proj: Project => rowLocal(proj.child)
    case f: Filter => rowLocal(f.child)
    case sa: SubqueryAlias => rowLocal(sa.child)
    case _ => false
  }

  private def isPassthrough(e: Expression): Boolean = e match {
    case _: ClickHousePassthrough | _: ClickHouseEval | _: ClickHouseFn => true
    case _ => false
  }

  private def containsPassthrough(e: Expression): Boolean = e.exists(isPassthrough)
}
