package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar replay of [[Graph.pageRank]]'s exact arithmetic: same
    * rounding points, same operation order per node (sums here are
    * over exact decimals via BigDecimal, matching dsum).
    */
  private def referencePr(edges: Seq[(Long, Long)], iterations: Int,
      d: Double, scale: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    def rnd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = nodes.map(v => v -> rnd(1.0 / n, scale)).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) =>
          BigDecimal(pr(s) / deg(s))
            .setScale(scale + 3, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }.toMap
      val dm = nodes.filterNot(deg.contains).map { v =>
        BigDecimal(pr(v)).setScale(scale + 3, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      pr = nodes.map { v =>
        v -> rnd((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n), scale)
      }.toMap
    }
    pr
  }

  test("pageRank: dangling-node mass redistributes; matches the scalar replay exactly") {
    // 4 is dangling (no out-edges): without redistribution total mass
    // decays and node 4's inflow is undervalued
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L))
    val out = Graph.pageRank(edges.toDF("src", "dst"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    val ref = referencePr(edges, 3, 0.85, 12)
    assert(out == ref, s"spark=$out ref=$ref")
    // mass conserved: ranks sum to 1 within rounding slack
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // the sink of the graph (4, fed by 2 and 3) outranks its feeders' source
    assert(out(4L) > out(1L))
  }

  test("pageRank: symmetric cycle is uniform; more in-links means more rank") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val pr = Graph.pageRank(cycle.toDF("src", "dst"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr.values.toSet.size == 1, s"cycle not uniform: $pr")
    // star into 9: hub gets the lion's share
    val star = (1L to 8L).map(i => (i, 9L)) :+ ((9L, 1L))
    val ps = Graph.pageRank(star.toDF("src", "dst"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(ps(9L) > ps(1L) && ps(1L) > ps(2L))
  }
}
