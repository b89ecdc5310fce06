package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same integer fixed-point recurrence. */
  private def refRanks(edges: Seq[(Long, Long)],
                       iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = 15L * Graph.RankScale / (100L * n)
    var r = nodes.map(_ -> Graph.RankScale / n).toMap
    for (_ <- 1 to iters) {
      val m = r.map { case (u, ru) => u -> ru * 85L / 100L }
      val dang = nodes.filterNot(out.contains).map(m).sum
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => m(u) / out(u) }.sum
      }
      r = nodes.map(v => v -> (base + dang / n + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private val toy: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (5L, 4L),
    (6L, 6L), (7L, 3L)) // 8 is reachable-only: dangling sink
    .++(Seq((3L, 8L)))

  test("pageRankFixedPoint equals the driver recurrence, with dangling " +
      "redistribution and self-loops") {
    val got = Graph.pageRankFixedPoint(toy.toDF("src", "dst"), "src", "dst",
        iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refRanks(toy, 10))
    // mass conservation: total rank stays within floor-loss of the scale
    val total = got.values.sum
    assert(total <= Graph.RankScale &&
      total > Graph.RankScale - 100L * got.size)
  }

  test("pageRank is partition-order independent (integer sums)") {
    val df = toy.toDF("src", "dst")
    val a = Graph.pageRankFixedPoint(df, "src", "dst", iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankFixedPoint(df.repartition(7), "src", "dst",
        iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("q138 fixture slice: ranks match the driver recurrence at sf0.001") {
    val ol = Tables.orders(spark, sf0001).join(Tables.lineitem(spark, sf0001),
      col("o_orderkey") === col("l_orderkey"))
    val fwd = ol.select(col("o_custkey").as("src"),
      (col("l_suppkey") + lit(10000000L)).as("dst"))
    val ret = ol.filter(col("l_returnflag") === "R")
      .select((col("l_suppkey") + lit(10000000L)).as("src"),
        col("o_custkey").as("dst"))
    val edges = fwd.unionByName(ret)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = refRanks(edges, 10)
    val top = SparkEntry.queries("q138_pagerank_centrality")(spark, sf0001)
      .collect()
    assert(top.length == 25)
    // the query's top-25 rows carry exactly the reference ranks, in the
    // reference's (rank desc, node) order
    val refTop = ref.toSeq.sortBy { case (node, rank) => (-rank, node) }
      .take(25)
    assert(top.map(r => (r.getLong(0), r.getLong(2))).toSeq == refTop)
    // kinds split correctly across the id offset
    assert(top.forall(r => r.getString(1) ==
      (if (r.getLong(0) >= 10000000L) "supplier" else "customer")))
  }
}
