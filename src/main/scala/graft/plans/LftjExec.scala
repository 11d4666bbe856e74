package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

import graft.wcoj.Lftj

/**
 * The Leapfrog Trie Join as a first-class Catalyst operator — the
 * "whole-operator semantics" extension path: a custom [[LogicalPlan]]
 * node, a [[Strategy]] that plans it, and a [[SparkPlan]] whose
 * `doExecute` performs the hypercube shuffle and per-cell leapfrog
 * directly on the `InternalRow` RDD. Registered through
 * `GraftExtensions` (`injectPlannerStrategy`), so `LftjExec.enumerate`
 * returns an ordinary DataFrame that composes with any downstream
 * operators while the WCOJ shows up in `explain` as its own node.
 *
 * Semantically identical to [[graft.wcoj.Lftj.enumerate]] (they share
 * the in-cell algorithm); this form exists because a multiway
 * intersection cannot be expressed as binary joins without losing the
 * AGM bound, and a physical operator is how an engine owns that choice.
 */
case class LftjNode(
    child: LogicalPlan,
    patterns: Seq[(String, String)],
    varOrder: Seq[String],
    cubeSide: Int,
    output: Seq[Attribute]) extends UnaryNode {
  // the binding variables are NEW attributes produced by this operator
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the operator reads BOTH child columns positionally — without this,
  // ColumnPruning sees no expression references and strips the child to
  // zero columns (getLong(0) on a 0-field row segfaults the JVM)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LftjNode =
    copy(child = newChild)
}

case class LftjExecNode(
    child: SparkPlan,
    patterns: Seq[(String, String)],
    varOrder: Seq[String],
    cubeSide: Int,
    output: Seq[Attribute]) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(newChild: SparkPlan): LftjExecNode =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val n = varOrder.length
    val side = cubeSide
    val varIdx = varOrder.zipWithIndex.toMap
    val pats = patterns.zipWithIndex.map { case ((u, v), r) =>
      val (iu, iv) = (varIdx(u), varIdx(v))
      if (iu < iv) (r, iu, iv, false) else (r, iv, iu, true)
    }
    val patPos = pats.map { case (_, i, j, _) => (i, j) }.toArray
    val nRels = patterns.length
    val nCells = math.pow(side, n).toInt
    val nFree = math.pow(side, n - 2).toInt

    def coord(k: Long): Int =
      Math.floorMod((k * 0x9E3779B97F4A7C15L) >>> 17, side.toLong).toInt

    val replicated = child.execute().mapPartitions { it =>
      it.flatMap { row =>
        val x = row.getLong(0)
        val y = row.getLong(1)
        pats.iterator.flatMap { case (r, i, j, swapped) =>
          val (k1, k2) = if (swapped) (y, x) else (x, y)
          val ci = coord(k1)
          val cj = coord(k2)
          (0 until nFree).iterator.map { code =>
            var pid = 0
            var rem = code
            var d = 0
            var mul = 1
            while (d < n) {
              val c =
                if (d == i) ci
                else if (d == j) cj
                else { val cc = rem % side; rem /= side; cc }
              pid += c * mul
              mul *= side
              d += 1
            }
            (pid, (r, k1, k2))
          }
        }
      }
    }

    val outTypes = output.map(_.dataType).toArray
    replicated
      .partitionBy(new HashPartitioner(nCells))
      .mapPartitions { it =>
        // one partition may hold several cells: group, then leapfrog each
        val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(outTypes)
        val cells = scala.collection.mutable.Map[Int, Array[ArrayBuffer[(Long, Long)]]]()
        it.foreach { case (pid, (r, k1, k2)) =>
          val bufs = cells.getOrElseUpdate(pid, Array.fill(nRels)(new ArrayBuffer[(Long, Long)]()))
          bufs(r) += ((k1, k2))
        }
        cells.valuesIterator.flatMap { bufs =>
          val tries = bufs.map(_.sortInPlace().toArray)
          if (tries.exists(_.isEmpty)) Iterator.empty
          else Lftj.lftj(tries, patPos, n).map { bind =>
            // copy: the projection reuses its buffer and downstream
            // operators (hash aggregates, shuffle writers) buffer rows
            toUnsafe(new GenericInternalRow(bind.map(_.asInstanceOf[Any]))).copy(): InternalRow
          }
        }
      }
  }
}

/** Plans [[LftjNode]] to [[LftjExecNode]]. */
object LftjStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LftjNode(child, pats, order, side, out) =>
      LftjExecNode(planLater(child), pats, order, side, out) :: Nil
    case _ => Nil
  }
}

object LftjExec {
  /** DataFrame door: WCOJ-enumerate `patterns` over `edges(src,dst)`
    * through the custom physical operator (requires GraftExtensions). */
  def enumerate(
      edges: DataFrame,
      patterns: Seq[(String, String)],
      varOrder: Seq[String],
      cubeSide: Int = 0): DataFrame = {
    Lftj.validate(patterns, varOrder)
    val spark = edges.sparkSession
    val Array(c1, c2) = edges.columns
    val child = edges.select(
      org.apache.spark.sql.functions.col(c1).cast("long"),
      org.apache.spark.sql.functions.col(c2).cast("long"))
    val childPlan = child.queryExecution.analyzed
    val side = if (cubeSide > 0) cubeSide
      else Lftj.autoSide(spark,
        edges.queryExecution.optimizedPlan.stats.sizeInBytes, varOrder.length)
    val out = varOrder.map(v => AttributeReference(v, LongType, nullable = false)())
    GraftSqlBridge.dataFrame(spark,
      LftjNode(childPlan, patterns, varOrder, side, out))
  }
}
