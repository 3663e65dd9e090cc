package graft.catalog

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SetViewProperties, ShowTableProperties, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** SQL view support for graft catalogs, wired the way engines must wire
  * it on current Spark: the connector `ViewCatalog` API exists but the
  * analyzer rejects view DDL on any non-session catalog
  * (`ResolveSessionCatalog` → MISSING_CATALOG_ABILITY) and never
  * consults `loadView` for reads — so the extension injects
  *
  *  - a '''parser wrapper''' that rewrites `CREATE [OR REPLACE] VIEW` /
  *    `DROP VIEW` / `SHOW VIEWS` whose target resolves to a
  *    [[GraftSparkCatalog]] into engine commands driving the catalog's
  *    `ViewCatalog` implementation (the rewrite must happen pre-analysis;
  *    a resolution rule would run after the built-in rejection), and
  *  - a '''resolution rule''' that expands a relation naming a stored
  *    view into its parsed definition, with the view's saved
  *    catalog/namespace context qualifying relative table references and
  *    exact cycle detection on nested views.
  *
  * Activate with `spark.sql.extensions=graft.catalog.GraftSqlExtensions`.
  * Everything else (tables, procedures, CTAS) works without the
  * extension; only SQL view statements need it. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) =>
      new GraftViewParser(session, delegate))
    ext.injectResolutionRule(session => ResolveGraftViews(session))
    ext.injectResolutionRule(_ => ResolveGraftDynamicOverwrite)
  }
}

/** Dynamic partition overwrite for graft tables. Spark plans
  * `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` as
  * `OverwritePartitionsDynamic`, which has no V1 write fallback — so
  * once the write is output-resolved (columns aligned by the built-in
  * rules), swap the node for a command that runs the aligned query
  * through [[graft.write.GraftWriter.overwriteDynamic]]: one snapshot
  * replacing exactly the partitions present in the batch, with the
  * removal set computed from value-exact partition stats (metadata
  * only, no data read). */
object ResolveGraftDynamicOverwrite
  extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case o: org.apache.spark.sql.catalyst.plans.logical.OverwritePartitionsDynamic
          if o.table.resolved && o.query.resolved && o.outputResolved =>
        o.table match {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
            r.table match {
              case g: GraftV2Table =>
                val (cat, ns, name) = g.graftIdentity
                GraftDynamicOverwriteCommand(cat, ns, name, o.query)
              case _ => o
            }
          case _ => o
        }
    }
}

final case class GraftDynamicOverwriteCommand(cat: GraftCatalog, ns: String,
    table: String, query: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.classic.GraftSqlShims.dfOf(session, query)
    new graft.write.GraftWriter(cat).overwriteDynamic(ns, table, df,
      graft.write.WriteConfig(retryUnitMs = 50),
      s"sql-dyn-${java.util.UUID.randomUUID().toString.take(12)}")
    Nil
  }
}

object GraftViewSupport {
  /** The named catalog iff it is a graft catalog; `None` for unknown
    * names or foreign catalogs (statement passes through untouched). */
  def graftCatalog(session: SparkSession, name: String): Option[GraftSparkCatalog] =
    try session.sessionState.catalogManager.catalog(name) match {
      case g: GraftSparkCatalog => Some(g)
      case _ => None
    } catch { case NonFatal(_) => None }

  /** Split a multipart name into (catalogName, namespace, leaf) under
    * the session's current catalog/namespace, graft-catalogs only. */
  def target(session: SparkSession, parts: Seq[String]):
      Option[(GraftSparkCatalog, String, Seq[String], String)] = {
    val cm = session.sessionState.catalogManager
    def isCatalog(name: String): Boolean =
      try { cm.catalog(name); true } catch { case NonFatal(_) => false }
    if (parts.length >= 2)
      graftCatalog(session, parts.head)
        .map(g => (g, parts.head, parts.tail.init, parts.last))
        .orElse {
          // a head that names a REGISTERED non-graft catalog is an
          // explicit target — pass through to the delegate instead of
          // hijacking the statement into the current graft catalog
          // (CREATE VIEW spark_catalog.default.v must create a session
          // view, not a graft view under namespace "spark_catalog")
          if (isCatalog(parts.head)) None
          else graftCatalog(session, cm.currentCatalog.name())
            .map(g => (g, cm.currentCatalog.name(), parts.init, parts.last))
        }
    else
      graftCatalog(session, cm.currentCatalog.name())
        .map(g => (g, cm.currentCatalog.name(),
          cm.currentNamespace.toSeq, parts.last))
  }
}

/** Delegating parser that post-processes view statements (see
  * [[GraftSqlExtensions]]). All other statements pass through verbatim. */
final class GraftViewParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment,
        collation, props, originalText, query, allowExisting, replace, _) =>
      if (collation.isDefined) c
      else GraftViewSupport.target(session, parts).map { case (_, cat, ns, name) =>
        CreateGraftViewCommand(cat, ns, name,
          originalText.getOrElse(throw new IllegalArgumentException(
            s"CREATE VIEW $cat.${(ns :+ name).mkString(".")} without query text")),
          cols, comment, props, query, allowExisting, replace)
      }.getOrElse(c)
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      GraftViewSupport.target(session, parts).map { case (_, cat, ns, name) =>
        DropGraftViewCommand(cat, ns, name, ifExists)
      }.getOrElse(d)
    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      val cm = session.sessionState.catalogManager
      def isCatalog(name: String): Boolean =
        try { cm.catalog(name); true }
        catch { case scala.util.control.NonFatal(_) => false }
      val (catName, ns) = parts match {
        case head +: rest if GraftViewSupport.graftCatalog(session, head).isDefined =>
          (head, rest)
        // an explicit non-graft catalog head passes through to the
        // delegate — never reinterpreted as a namespace of the current
        // graft catalog
        case head +: _ if isCatalog(head) => return s
        case _ => (cm.currentCatalog.name(), parts)
      }
      if (GraftViewSupport.graftCatalog(session, catName).isDefined)
        ShowGraftViewsCommand(catName, ns, pattern, output)
      else s
    case s @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
      viewTarget(parts).map { case (cat, ns, name) =>
        AlterGraftViewCommand(cat, ns, name,
          props.map { case (k, v) =>
            org.apache.spark.sql.connector.catalog.ViewChange.setProperty(k, v)
          }.toSeq)
      }.getOrElse(s)
    case s @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _) =>
      viewTarget(parts).map { case (cat, ns, name) =>
        AlterGraftViewCommand(cat, ns, name, keys.map(
          org.apache.spark.sql.connector.catalog.ViewChange.removeProperty))
      }.getOrElse(s)
    // SHOW TBLPROPERTIES over a stored view (the built-in resolution is
    // table-only for non-session catalogs)
    case s @ ShowTableProperties(UnresolvedTableOrView(parts, _, _), key, output) =>
      viewTarget(parts).map { case (cat, ns, name) =>
        ShowGraftViewPropsCommand(cat, ns, name, key, output)
      }.getOrElse(s)
    case other => other
  }

  /** The (catalog, namespace, name) triple iff `parts` names a STORED
    * graft view — statements over tables pass through untouched. */
  private def viewTarget(parts: Seq[String]): Option[(String, Seq[String], String)] =
    GraftViewSupport.target(session, parts).collect {
      case (g, cat, ns, name)
          if g.viewExists(Identifier.of(ns.toArray, name)) =>
        (cat, ns, name)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW <graft-cat>.<ns>.<name> AS <query>`: the
  * query is analyzed NOW (bad references fail at create, like Spark's
  * session-catalog views) and the definition persists via the catalog's
  * `ViewCatalog` API with the session's catalog/namespace context. */
final case class CreateGraftViewCommand(catalogName: String, ns: Seq[String],
    name: String, sql: String, userCols: Seq[(String, Option[String])],
    comment: Option[String], props: Map[String, String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val cm = session.sessionState.catalogManager
    val cat = cm.catalog(catalogName).asInstanceOf[ViewCatalog]
    val ident = Identifier.of(ns.toArray, name)
    val analyzed = session.sessionState.executePlan(query).analyzed
    val schema = analyzed.schema
    if (userCols.nonEmpty && userCols.length != schema.length)
      throw new IllegalArgumentException(
        s"view column list has ${userCols.length} names but the query " +
          s"produces ${schema.length} columns")
    val info = new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace,
      schema, schema.fieldNames,
      userCols.map(_._1).toArray,
      userCols.map(_._2.orNull).toArray,
      (props ++ comment.map(ViewCatalog.PROP_COMMENT -> _)).asJava)
    if (replace) cat.replaceView(info, true)
    else if (allowExisting && cat.viewExists(ident)) ()
    else cat.createView(info)
    Nil
  }
}

final case class DropGraftViewCommand(catalogName: String, ns: Seq[String],
    name: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(ns.toArray, name)
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}

final case class ShowGraftViewsCommand(catalogName: String, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[ViewCatalog]
    val names = cat.listViews(ns: _*).map(_.name()).toSeq.sorted
    val filtered = pattern.fold(names)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p))
    filtered.map(n => Row(ns.mkString("."), n, false))
  }
}

final case class AlterGraftViewCommand(catalogName: String, ns: Seq[String],
    name: String,
    changes: Seq[org.apache.spark.sql.connector.catalog.ViewChange])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[ViewCatalog]
      .alterView(Identifier.of(ns.toArray, name), changes: _*)
    Nil
  }
}

final case class ShowGraftViewPropsCommand(catalogName: String, ns: Seq[String],
    name: String, key: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[ViewCatalog].loadView(Identifier.of(ns.toArray, name))
    val props = v.properties().asScala.toSeq.sortBy(_._1)
    key.fold(props)(k => props.filter(_._1 == k))
      .map { case (k, value) => Row(k, value) }
  }
}

/** Expands relations that name stored graft views into their parsed
  * definitions. Single-part table references inside a view body are
  * qualified with the view's SAVED catalog/namespace (the context its
  * author wrote it under), nested views expand recursively with an
  * explicit seen-set — a definition cycle fails with the chain named
  * instead of an analyzer max-iterations error. */
final case class ResolveGraftViews(session: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UnresolvedRelation =>
        expand(u, Set.empty).getOrElse(u)
    }

  private def expand(u: UnresolvedRelation,
      seen: Set[String]): Option[LogicalPlan] = {
    val t = GraftViewSupport.target(session, u.multipartIdentifier)
    t.flatMap { case (g, catName, ns, name) =>
      val ident = Identifier.of(ns.toArray, name)
      if (!g.viewExists(ident)) None
      else {
        val fq = (catName +: ns :+ name).mkString(".")
        if (seen.contains(fq))
          throw new IllegalArgumentException(
            s"recursive view definition: ${(seen + fq).mkString(" -> ")}")
        val v = g.loadView(ident)
        val parsed = session.sessionState.sqlParser.parsePlan(v.query)
        val ctx = v.currentCatalog +: v.currentNamespace.toSeq
        val qualified = parsed.transformUp {
          case r: UnresolvedRelation =>
            val full =
              if (r.multipartIdentifier.length == 1)
                r.copy(multipartIdentifier = ctx ++ r.multipartIdentifier)
              // a two-part reference (ns.tbl) written under the view's
              // catalog must not rebind against the READER's current
              // catalog — prepend the saved catalog unless the first
              // part is itself a registered catalog name
              else if (r.multipartIdentifier.length == 2 &&
                  !session.sessionState.catalogManager
                    .isCatalogRegistered(r.multipartIdentifier.head))
                r.copy(multipartIdentifier =
                  v.currentCatalog +: r.multipartIdentifier)
              else r
            expand(full, seen + fq).getOrElse(full)
        }
        val aliased =
          if (v.columnAliases != null && v.columnAliases.nonEmpty)
            UnresolvedSubqueryColumnAliases(
              v.columnAliases.toSeq, qualified)
          else qualified
        Some(SubqueryAlias(name, aliased))
      }
    }
  }
}
