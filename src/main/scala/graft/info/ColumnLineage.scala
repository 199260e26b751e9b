package graft.info

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

import scala.collection.mutable

/** Column-level lineage from the ANALYZED plan — the governance /
  * impact-analysis primitive: for every output column of a query,
  * which physical source columns (table, column) feed it, through any
  * depth of projections, aggregates, joins, unions and windows.
  *
  * Works on the analyzed (pre-optimization) plan so lineage reflects
  * what the user WROTE, not what the optimizer pruned; resolution is
  * by `ExprId`, the only stable identity for an attribute across
  * plan operators (names repeat freely across scopes).
  *
  * This is a plan ANALYSIS, not a query operator: it runs on the
  * driver over the logical plan (never touches data) and returns a
  * tiny local DataFrame — (out_column, source_table, source_column)
  * edges, one row per dependency.
  *
  * Scope: dependency edges flow through anything that exposes
  * `NamedExpression`s (Project/Aggregate/Window), through generators
  * (explode/posexplode/UDTFs — generated columns derive from the
  * generator's inputs) and grouping-set expansions (positionally),
  * set operations map positionally, and leaves resolve to their
  * file-relation path (the parquet "table"). Literal-only columns
  * report no source rows.
  * Filter/join CONDITIONS are deliberately out of scope — this is
  * value lineage (what feeds the column), not control lineage.
  */
object ColumnLineage {

  /** (output column, source table, source column) dependency edges. */
  def of(spark: SparkSession, df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    // exprId -> set of (table, column) leaves, built bottom-up
    val leaves = mutable.Map.empty[ExprId, Set[(String, String)]]

    def tableNameOf(rel: LogicalPlan): String = rel match {
      case lr: LogicalRelation =>
        // parquet path basename, e.g. .../lineitem.parquet -> lineitem
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .map(_.getName.replaceAll("\\.parquet$", ""))
              .getOrElse("<relation>")
          case _ => "<relation>"
        }
      case lr: LocalRelation => "<local>"
      case other             => s"<${other.nodeName}>"
    }

    def sourcesOf(e: Expression): Set[(String, String)] =
      e.references.iterator
        .flatMap(a => leaves.getOrElse(a.exprId, Set.empty))
        .toSet

    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case leaf @ (_: LogicalRelation | _: LocalRelation) =>
          val t = tableNameOf(leaf)
          leaf.output.foreach { a =>
            leaves(a.exprId) = Set((t, a.name))
          }
        case u: Union =>
          // positional: each output attribute unions its input columns
          u.output.zipWithIndex.foreach { case (out, i) =>
            val srcs = u.children
              .flatMap(c => leaves.getOrElse(c.output(i).exprId, Set.empty))
              .toSet
            leaves(out.exprId) = srcs
          }
        case g: Generate =>
          // generator outputs (explode/posexplode/inline/UDTF results)
          // are FRESH attributes, not NamedExpressions — without this
          // branch they'd report no sources and be indistinguishable
          // from literals. Every generated column derives from the
          // generator's input references.
          val srcs = sourcesOf(g.generator)
          g.generatorOutput.foreach(a => leaves(a.exprId) = srcs)
        case e: Expand =>
          // rollup/cube/grouping-sets expansion: output attributes are
          // fresh; each maps positionally to the union of its slot's
          // expressions across all projections
          e.output.zipWithIndex.foreach { case (out, i) =>
            val srcs = e.projections.flatMap(pr => sourcesOf(pr(i))).toSet
            leaves(out.exprId) = srcs
          }
        case n =>
          // any NamedExpression this node produces maps to the union
          // of its referenced attributes' leaves; attributes passing
          // through untouched keep their entry
          n.expressions.foreach {
            _.foreach {
              case ne: NamedExpression if !ne.isInstanceOf[Attribute] =>
                leaves(ne.exprId) = sourcesOf(ne)
              case _ => ()
            }
          }
      }
    }
    walk(plan)

    import spark.implicits._
    plan.output
      .flatMap { a =>
        leaves
          .getOrElse(a.exprId, Set.empty)
          .toSeq
          .sorted
          .map { case (t, c) => (a.name, t, c) }
      }
      .toDF("out_column", "source_table", "source_column")
  }

  /** Convenience: lineage rendered as one row per output column with
    * its sources comma-joined — the human-readable report form.
    */
  def report(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    of(spark, df)
      .groupBy(col("out_column"))
      .agg(
        concat_ws(
          ", ",
          sort_array(
            collect_list(concat(col("source_table"), lit("."), col("source_column")))
          )
        ).as("sources")
      )
      .orderBy("out_column")
  }
}
