package graft

import graft.graph.ItemSim

class ItemSimSpec extends SparkSpec {
  import spark.implicits._

  test("itemNeighbors: hand-computed cosine² ppm and deterministic " +
    "tie-break on a 4-order basket fixture") {
    // o1{1,2} o2{1,2} o3{1,3} o4{2,3,4}
    val op = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L), (4L, 2L), (4L, 3L), (4L, 4L)).toDF("ok", "p")
    val w = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L), (2L, 4L, 1L),
      (3L, 4L, 1L)).toDF("a", "b", "w")
    val got = ItemSim.itemNeighbors(w, op)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (p, xs) =>
        p -> xs.sortBy(_._2).map(r => (r._3, r._5)).toList }
    // deg: 1->3, 2->3, 3->2, 4->1
    assert(got(1L) === List((2L, 444444L), (3L, 166666L)))
    assert(got(2L) === List((1L, 444444L), (4L, 333333L),
      (3L, 166666L)))
    // items 1 and 2 tie at 166666 with equal w -> nbr ascending
    assert(got(3L) === List((4L, 500000L), (1L, 166666L),
      (2L, 166666L)))
    assert(got(4L) === List((3L, 500000L), (2L, 333333L)))
  }

  test("itemNeighbors on the fixture graph: ppm bounded by 10^6 " +
    "(w <= min degree), ranks contiguous from 1") {
    val li = graft.core.Tables(spark, SfDir, "lineitem")
    val w = graft.graph.Triangles.weightedCoPurchaseEdges(li)
    val op = li.select(
      org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
      org.apache.spark.sql.functions.col("l_partkey").as("p")).distinct()
    val rows = ItemSim.itemNeighbors(w, op)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, rank, _, w0, ppm) =>
      assert(rank >= 1 && rank <= ItemSim.TopK)
      assert(w0 >= 1L && ppm >= 0L && ppm <= 1000000L)
    }
    rows.groupBy(_._1).foreach { case (_, xs) =>
      assert(xs.map(_._2).sorted.toList === (1L to xs.length).toList)
    }
  }
}
