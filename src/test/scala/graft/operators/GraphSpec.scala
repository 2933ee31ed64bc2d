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

  /** Scalar replay of the deterministic-HLL ball estimate for a small
    * exact in-ball: same md5 bucket/rho derivation, integer-exact
    * estimator, 4-dp rounding as [[Sketches.hllEstimate]].
    */
  private def hllEstOf(members: Set[Long]): Double = {
    val regs = members.groupMapReduce { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 3), 16)
    } { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val suffix = hex.substring(3, 15)
      val z0 = suffix.takeWhile(_ == '0').length
      val nz = if (z0 == 12) 0 else suffix(z0) match {
        case '1' => 3
        case '2' | '3' => 2
        case '4' | '5' | '6' | '7' => 1
        case _ => 0
      }
      z0 * 4 + nz + 1
    } (math.max)
    val m = 4096L
    val sp = regs.values.map(r => 1L << (49 - r)).sum +
      (m - regs.size) * (1L << 49)
    val vzero = m - regs.size
    val c = 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 * 562949953421312.0
    val raw = c / sp.toDouble
    val est = if (raw <= 2.5 * 4096 && vzero > 0)
      4096.0 * math.log(4096.0 / vzero.toDouble) else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Exact harmonic from exact balls via the operator's own arithmetic:
    * integer-lifted 4-dp estimates, lcm weights, one IEEE divide.
    */
  private def refHarmonic(balls: Seq[Set[Long]]): Double = {
    val e = balls.map(b => math.round(hllEstOf(b) * 10000.0))
    val maxT = balls.size - 1
    val lcm = (1L to maxT.toLong).reduce((a, b) => a / gcdL(a, b) * b)
    val hs = (1 to maxT).map(t => (lcm / t) * math.max(e(t) - e(t - 1), 0L)).sum
    hs.toDouble / (lcm * 10000.0)
  }
  private def gcdL(a: Long, b: Long): Long = if (b == 0) a else gcdL(b, a % b)

  test("harmonicCentrality: path graph matches the exact-ball scalar replay") {
    // 1 -> 2 -> 3 -> 4: in-balls grow along the path; node 1 is reached
    // by nobody (harmonic 0), node 4 by everyone within 3 hops
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val out = Graph.harmonicCentrality(edges.toDF("src", "dst"), maxT = 3)
    val got = out.select("node", "harmonic").as[(Long, Double)].collect().toMap
    def balls(v: Long): Seq[Set[Long]] = {
      // exact in-ball B(v, t) on the path graph
      (0 to 3).map(t => (math.max(1L, v - t) to v).toSet)
    }
    val want = (1L to 4L).map(v => v -> refHarmonic(balls(v))).toMap
    assert(got == want, s"got=$got want=$want")
    assert(got(1L) == 0.0)
    // ball_est at t=3 tracks the true in-ball size closely (HLL on tiny
    // exact sets in the linear-counting regime)
    val ests = out.select("node", "ball_est").as[(Long, Double)].collect().toMap
    for (v <- 1L to 4L) {
      val truth = balls(v).last.size.toDouble
      assert(math.abs(ests(v) - truth) < 0.01 * 4096,
        s"node $v: est ${ests(v)} vs true ball $truth")
    }
    out.unpersist()
  }

  test("harmonicCentrality: max-merge makes duplicate edges and partitioning invisible") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val base = Graph.harmonicCentrality(edges.toDF("src", "dst"), maxT = 2)
      .as[(Long, Double, Double)].collect().sorted.toSeq
    // duplicated edge list, shuffled partitioning: registers are maxima,
    // so the output must be IDENTICAL, not merely close
    val dup = (edges ++ edges ++ edges).toDF("src", "dst").repartition(7)
    val got = Graph.harmonicCentrality(dup, maxT = 2)
      .as[(Long, Double, Double)].collect().sorted.toSeq
    assert(got == base)
  }

  test("harmonicCentrality: releases every internal cache; result is the one registered frame") {
    val spark2 = spark
    val before = spark2.sparkContext.getPersistentRDDs.keySet
    val out = Graph.harmonicCentrality(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), maxT = 2)
    val after = spark2.sparkContext.getPersistentRDDs.keySet
    // exactly one new persisted RDD: the returned (node, ball_est,
    // harmonic) frame itself; all register/estimate scratch is gone
    assert((after -- before).size == 1,
      s"leaked caches: ${(after -- before).size - 1}")
    out.unpersist()
    assert(spark2.sparkContext.getPersistentRDDs.keySet == before)
  }

  test("pageRank: analyzed plan grows LINEARLY in iterations; edges resolve to one cached scan") {
    // no dangling nodes (cycle): the one-lazy-plan regime the knn gate
    // uses. A 2^iterations regression would explode these counts.
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def planSize(iters: Int): Int = {
      var n = 0
      Graph.pageRank(cycle, iterations = iters).queryExecution.analyzed
        .foreach(_ => n += 1)
      n
    }
    val sizes = (2 to 5).map(planSize)
    val diffs = sizes.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(diffs.distinct.size == 1,
      s"per-iteration plan growth is not constant: sizes=$sizes diffs=$diffs")
    // the cached edge frame substitutes as InMemoryRelation at every
    // iteration's join: edges are COMPUTED once, scanned per iteration
    val cached = Graph.pageRank(cycle, iterations = 3)
      .queryExecution.withCachedData
    var imr = 0
    cached.foreach {
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        imr += 1
      case _ => ()
    }
    assert(imr >= 4, // 3 iterations x edge scan + node list references
      s"expected the edge/node caches to substitute as InMemoryRelation, got $imr")
    graft.util.Scratch.release(spark)
  }

  test("labelPropagation: two bridged triangles resolve to two communities (hand replay)") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, one bridge 3-4; directed input —
    // the operator symmetrizes. Hand-computed synchronous rounds with
    // the min tie-break give labels {1,2,3}→1 and {4,5,6}→3 after 3.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
    graft.util.Scratch.release(spark)
  }

  test("labelPropagation: duplicate/reversed edges and partitioning are invisible") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    // duplicates + pre-reversed copies + a different partitioning must
    // not move any label: symmetrize+distinct defines the graph
    val noisy = base.unionByName(base)
      .unionByName(base.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(7)
    val a = Graph.labelPropagation(base).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(noisy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"noisy graph moved labels: $a vs $b")
    graft.util.Scratch.release(spark)
  }
}
