package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LeafNode, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage from the analyzed plan: which SOURCE columns
  * does each output column derive from? The impact-analysis primitive a
  * data platform needs ("if documents.text changes, which outputs
  * move?") — computed by walking attribute references from the leaves
  * up, no execution required.
  *
  * Source columns are labeled `<relation>.<column>`, where relation is
  * the scan's root-path basename for file relations (e.g.
  * `documents.parquet.text`), `local` for in-memory relations.
  * Transitive: an alias of an alias resolves to the original scan
  * columns; aggregates/windows/generators resolve through their
  * argument references; Union merges lineage position-wise across all
  * branches.
  */
object Lineage {

  private def relationLabel(leaf: LeafNode): String = leaf match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        val p = h.location.rootPaths.headOption.map(_.getName).getOrElse("file")
        p
      case other => other.getClass.getSimpleName.toLowerCase
    }
    case other => other.getClass.getSimpleName
      .replaceAll("Relation$|Exec$", "").toLowerCase match {
        case "local" | "localrelation" => "local"
        case s => s
      }
  }

  /** Map of output column name → source column labels. */
  def columns(df: DataFrame): Map[String, Set[String]] = {
    val memo = mutable.Map[Long, Set[String]]()
    def sourcesOf(a: Attribute): Set[String] = memo.getOrElse(a.exprId.id, Set.empty)
    def walk(plan: LogicalPlan): Unit = {
      plan.children.foreach(walk)
      plan.subqueries.foreach(walk)
      plan match {
        case leaf: LeafNode =>
          val label = relationLabel(leaf)
          leaf.output.foreach(a =>
            memo(a.exprId.id) = Set(s"$label.${a.name}"))
        case g: Generate =>
          val src = g.generator.references.toSeq.flatMap(sourcesOf).toSet
          g.generatorOutput.foreach(a => memo(a.exprId.id) = src)
        case u: Union =>
          u.output.zipWithIndex.foreach { case (out, i) =>
            memo(out.exprId.id) =
              u.children.flatMap(c => sourcesOf(c.output(i))).toSet
          }
        case _ => ()
      }
      // any Alias anywhere in this node's expressions defines a new
      // attribute from its child's references (projections, aggregates,
      // window expressions, grouping aliases ...)
      plan.expressions.foreach(_.foreach {
        case al: Alias =>
          memo(al.exprId.id) =
            al.child.references.toSeq.flatMap(sourcesOf).toSet
        case _ => ()
      })
    }
    val analyzed = df.queryExecution.analyzed
    walk(analyzed)
    analyzed.output.map(a => a.name -> sourcesOf(a)).toMap
  }
}
