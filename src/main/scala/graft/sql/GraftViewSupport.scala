package graft.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.dsv2.GraftCatalog

/** SQL routing for v2 view catalogs — the piece vanilla Spark 4.1 is
  * missing: `ResolveSessionCatalog` throws `MISSING_CATALOG_ABILITY`
  * for any view statement whose identifier resolves to a non-session
  * catalog, even one implementing
  * [[org.apache.spark.sql.connector.catalog.ViewCatalog]]
  * (ResolveSessionCatalog.scala:469 — the match is unconditional).
  * Because that rule runs BEFORE extension-injected resolution rules
  * inside the same fixed-point batch, a resolution rule can never win
  * the race for DDL; the statements are intercepted at PARSE time
  * instead (the Iceberg extensions play):
  *
  *   - [[GraftViewSqlParser]] rewrites `CREATE [OR REPLACE] VIEW` /
  *     `ALTER VIEW ... AS` / `DROP VIEW` / `SHOW VIEWS` whose target
  *     names a [[GraftCatalog]] into runnable commands against its
  *     `ViewCatalog` API — before the analyzer ever sees a
  *     `CreateView` node to trip on;
  *   - [[GraftViewSubstitution]] (a resolution rule — reads are not
  *     contested, the builtin rules simply leave an unknown relation
  *     unresolved) expands `SELECT ... FROM wh.ns.v` by parsing the
  *     stored view text, re-qualifying bare table names against the
  *     creation-time catalog/namespace context, and re-applying the
  *     declared column aliases.
  *
  * Views stay plain files (`<ns>/<name>.graftview.json`, atomic
  * publish) — SQL routing adds no storage, only the missing analyzer
  * plumbing. */
class GraftViewSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  private def catalogManager = session.sessionState.catalogManager

  private def isGraft(name: String): Boolean =
    try catalogManager.catalog(name).isInstanceOf[GraftCatalog]
    catch { case _: Exception => false }

  /** `cat.ns….name` → (catalog, ident) when `cat` is a GraftCatalog;
    * bare names route through the CURRENT catalog when that is one.
    * A leading part naming ANY other registered catalog (e.g.
    * `spark_catalog.default.v` while `USE wh`) is explicitly qualified
    * elsewhere — never hijacked into the current graft catalog. */
  private def graftIdent(parts: Seq[String]): Option[(String, Identifier)] =
    if (parts.length >= 2 && isGraft(parts.head))
      Some((parts.head,
        Identifier.of(parts.tail.init.toArray, parts.last)))
    else if (catalogManager.currentCatalog.isInstanceOf[GraftCatalog] &&
             !session.sessionState.catalog.isTempView(parts) &&
             (parts.length == 1 || !catalogManager.isCatalogRegistered(parts.head)))
      Some((catalogManager.currentCatalog.name,
        if (parts.length == 1)
          Identifier.of(catalogManager.currentNamespace, parts.head)
        else Identifier.of(parts.init.toArray, parts.last)))
    else None

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, originalText, query, allowExisting, replace, _) =>
      graftIdent(parts).map { case (cat, ident) =>
        GraftCreateViewCommand(cat, ident, cols, comment, props,
          originalText.getOrElse(throw new IllegalArgumentException(
            "graft view: CREATE VIEW requires SQL text")),
          query, allowExisting = allowExisting, replace = replace,
          mustExist = false): LogicalPlan
      }.getOrElse(cv)
    case av @ AlterViewAs(
        org.apache.spark.sql.catalyst.analysis.UnresolvedView(parts, _, _, _),
        originalText, query) =>
      graftIdent(parts).map { case (cat, ident) =>
        GraftCreateViewCommand(cat, ident, Nil, None, Map.empty,
          originalText, query, allowExisting = false, replace = true,
          mustExist = true): LogicalPlan
      }.getOrElse(av)
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      graftIdent(parts).map { case (cat, ident) =>
        GraftDropViewCommand(cat, ident, ifExists): LogicalPlan
      }.getOrElse(dv)
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, out)
        if parts.nonEmpty && isGraft(parts.head) =>
      GraftShowViewsCommand(parts.head, parts.tail, pattern, out)
    case other => other
  }

  // pure delegation below — only plans carry view statements
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext) =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
}

/** CREATE [OR REPLACE] VIEW / ALTER VIEW ... AS against a
  * [[GraftCatalog]]: analyzes the body ONCE to capture the schema and
  * output names, then persists the ORIGINAL SQL text plus the
  * creation context through the ViewCatalog API. */
final case class GraftCreateViewCommand(
    catName: String, ident: Identifier,
    userCols: Seq[(String, Option[String])],
    comment: Option[String], props: Map[String, String],
    originalText: String, query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean, mustExist: Boolean)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val cm = session.sessionState.catalogManager
    val cat = cm.catalog(catName).asInstanceOf[ViewCatalog]
    val exists = cat.viewExists(ident)
    if (mustExist && !exists) throw new NoSuchViewException(ident)
    if (exists && allowExisting) return Nil
    if (exists && !replace) throw new ViewAlreadyExistsException(ident)
    val analyzed = session.sessionState.executePlan(query).analyzed
    val queryCols = analyzed.output.map(_.name)
    if (userCols.nonEmpty)
      require(userCols.length == queryCols.length,
        s"view column list has ${userCols.length} names, query produces " +
          s"${queryCols.length} columns")
    val aliases =
      if (userCols.isEmpty) Array.empty[String]
      else userCols.map(_._1).toArray
    val comments =
      if (userCols.isEmpty) Array.empty[String]
      else userCols.map(_._2.orNull).toArray
    val schema =
      if (userCols.isEmpty) analyzed.schema
      else org.apache.spark.sql.types.StructType(
        analyzed.schema.fields.zip(aliases).map { case (f, a) => f.copy(name = a) })
    val allProps = new java.util.HashMap[String, String]()
    if (mustExist && exists) {
      // ALTER VIEW ... AS replaces only the query (Spark semantics):
      // the existing properties and comment carry forward; the declared
      // column-alias list does NOT (the new query defines the output).
      cat.loadView(ident).properties.forEach((k, v) => allProps.put(k, v))
    }
    props.foreach { case (k, v) => allProps.put(k, v) }
    comment.foreach(c => allProps.put(ViewCatalog.PROP_COMMENT, c))
    val info = new ViewInfo(ident, originalText,
      cm.currentCatalog.name, cm.currentNamespace, schema,
      queryCols.toArray, aliases, comments, allProps)
    // replaceView is a single atomic publish in GraftCatalog — a crash
    // mid-replace leaves either the old or the new definition, never
    // neither (the drop-then-create it supersedes had a loss window)
    if (exists) cat.replaceView(info, false) else cat.createView(info)
    Nil
  }
}

final case class GraftDropViewCommand(catName: String, ident: Identifier,
                                      ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catName)
      .asInstanceOf[ViewCatalog]
    if (!cat.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Nil
  }
}

final case class GraftShowViewsCommand(catName: String, ns: Seq[String],
                                       pattern: Option[String],
                                       override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catName)
      .asInstanceOf[ViewCatalog]
    cat.listViews(ns: _*)
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name), p).nonEmpty))
      .sortBy(_.name)
      .map(id => Row(id.namespace.mkString("."), id.name, false)).toSeq
  }
}

/** Read-side view expansion: an [[UnresolvedRelation]] the builtin
  * rules left unresolved, whose identifier names a view in a
  * [[GraftCatalog]], is replaced by the parsed stored SQL — bare
  * table names re-qualified against the creation-time context, the
  * declared column aliases re-applied, the whole body scoped under a
  * SubqueryAlias carrying the view's fully-qualified name. Nested
  * views expand across fixed-point iterations; a direct
  * self-reference is refused explicitly (a deeper cycle dies on the
  * analyzer's iteration cap). */
final case class GraftViewSubstitution(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def catalogManager = session.sessionState.catalogManager

  private def viewCatalog(name: String): Option[ViewCatalog] =
    try catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  private def lookup(parts: Seq[String])
      : Option[(String, Identifier, ViewCatalog)] = {
    val candidates: Seq[(String, Seq[String])] =
      (if (parts.length >= 2) Seq((parts.head, parts.tail)) else Nil) ++
        (if (catalogManager.currentCatalog.isInstanceOf[GraftCatalog] &&
             !session.sessionState.catalog.isTempView(parts) &&
             (parts.length == 1 ||
               !catalogManager.isCatalogRegistered(parts.head)))
           Seq((catalogManager.currentCatalog.name,
             if (parts.length == 1) catalogManager.currentNamespace.toSeq ++ parts
             else parts))
         else Nil)
    candidates.iterator.flatMap { case (cat, rest) =>
      viewCatalog(cat).flatMap { vc =>
        val ident = Identifier.of(rest.init.toArray, rest.last)
        if (rest.nonEmpty && vc.viewExists(ident)) Some((cat, ident, vc))
        else None
      }
    }.nextOption()
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        lookup(u.multipartIdentifier)
          .map { case (cat, ident, vc) => expand(cat, ident, vc) }
          .getOrElse(u)
    }

  private def expand(cat: String, ident: Identifier,
                     vc: ViewCatalog): LogicalPlan = {
    val view = vc.loadView(ident)
    val body = session.sessionState.sqlParser.parsePlan(view.query)
    val ctxCat = view.currentCatalog
    val ctxNs = view.currentNamespace.toSeq
    val fqn = (cat +: ident.namespace.toSeq) :+ ident.name
    // re-qualify bare names against the CREATION context (the view
    // must mean the same tables regardless of the reader's current
    // catalog/namespace); already-qualified names pass through
    val qualified = body.transformUp {
      case r: UnresolvedRelation
          if r.multipartIdentifier.length <= 2 &&
            !session.sessionState.catalog.isTempView(r.multipartIdentifier) =>
        val full =
          if (r.multipartIdentifier.length == 1)
            (ctxCat +: ctxNs) ++ r.multipartIdentifier
          else ctxCat +: r.multipartIdentifier
        if (full == fqn.toList || r.multipartIdentifier == fqn)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "RECURSIVE_VIEW",
            messageParameters = Map(
              "viewIdent" -> fqn.mkString("."),
              "newPath" -> fqn.mkString(".")))
        UnresolvedRelation(full, r.options, r.isStreaming)
      case r: UnresolvedRelation if r.multipartIdentifier == fqn =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "RECURSIVE_VIEW",
          messageParameters = Map(
            "viewIdent" -> fqn.mkString("."),
            "newPath" -> fqn.mkString(".")))
    }
    val aliased =
      if (view.columnAliases == null || view.columnAliases.isEmpty) qualified
      else UnresolvedSubqueryColumnAliases(
        view.columnAliases.toIndexedSeq, qualified)
    SubqueryAlias(fqn, aliased)
  }
}
