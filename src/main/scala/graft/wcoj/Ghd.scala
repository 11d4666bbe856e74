package graft.wcoj

import org.apache.spark.sql.DataFrame

import graft.cqc.{Cmp, Hypergraph, Rel, Yannakakis}

/**
 * Generalized hypertree decomposition for cyclic conjunctive queries
 * (reference: sqlplus-core ghd/GhdAlgorithm.scala + convert/
 * CyclicHandler.scala decompose cyclic queries into bags, evaluate each
 * bag worst-case-optimally, then run Yannakakis over the now-acyclic bag
 * tree).
 *
 * Spark-first realization: planning is driver-side metadata only. We
 * repeatedly run the GYO reducer; when it stalls (the residual hypergraph
 * is cyclic), we merge the two relations sharing the most variables into
 * one bag whose DataFrame is their join — Catalyst/AQE pick the physical
 * join, and bags stay small (width-2 here, greedy rather than the
 * reference's exhaustive width minimization). Once acyclic, the standard
 * CQC pipeline (semijoin reduction + comparison annotations +
 * output-sensitive enumeration) evaluates the bag tree. Triangle-shaped
 * bags can alternatively be evaluated by [[Lftj]], the worst-case-optimal
 * mapPartitions path.
 */
object Ghd {

  /** Merge relations until the hypergraph is alpha-acyclic; returns the
    * bag relations (a valid GHD's bag set with width = merged count). */
  def decompose(rels: Seq[Rel]): Seq[Rel] = {
    var current = rels.toVector
    var guard = 0
    while (!Hypergraph.isAcyclic(current) && guard < rels.size) {
      guard += 1
      // merge the pair sharing the most variables; among equally-connected
      // pairs, the SMALLEST combined estimated size — the bag's join is
      // materialization the enumeration re-reads, so build the cheap bag
      // (same cost source as the join-tree pick: driver-side plan stats)
      val pairs = for {
        i <- current.indices; j <- current.indices if i < j
        shared = (current(i).vars intersect current(j).vars).size if shared > 0
      } yield (i, j, shared)
      val (i, j, _) = pairs.maxBy { case (i, j, s) =>
        (s, -(Hypergraph.estSize(current(i)) + Hypergraph.estSize(current(j))), -i, -j)
      }
      val a = current(i)
      val b = current(j)
      val keys = (a.vars intersect b.vars).toSeq.sorted
      val bag = Rel(s"${a.name}+${b.name}", a.df.join(b.df, keys, "inner"))
      current = current.patch(j, Nil, 1).patch(i, Seq(bag), 1)
    }
    current
  }

  /**
   * Evaluate a (possibly cyclic) conjunctive query with comparisons:
   * decompose into bags, then CQC-evaluate the acyclic bag tree.
   */
  def solve(rels: Seq[Rel], cmps: Seq[Cmp] = Nil): DataFrame =
    Yannakakis.solve(decompose(rels), cmps)
}
