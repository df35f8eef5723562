package graft

import graft.operators.{Bfs, HyperBall, PortableHll}
import org.apache.spark.sql.functions._

class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  // directed: a 4-cycle 1→2→3→4→1 with a chord 1→3, plus island 8→9
  private lazy val g = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
    (8L, 9L)
  ).toDF("src", "dst")

  test("hyperball registers equal PortableHll registers of the EXACT ball") {
    // ball(v, r) computed exactly by per-node BFS; building registers
    // over that membership set must be bit-identical to the r-round
    // HyperBall merge — max-merge makes the two constructions one.
    for (r <- 1 to 3) {
      val hb = HyperBall.ballRegisters(g, rounds = r)
        .as[(Long, Int, Int)].collect().toSet
      val ids = g.select($"src").union(g.select($"dst")).distinct().as[Long].collect()
      val exact = ids.flatMap { v =>
        Bfs.hops(g, Seq(v).toDF("id"), rounds = r)
          .select(lit(v).as("node"), $"id".as("member"))
          .as[(Long, Long)].collect()
      }.toSeq.toDF("id", "member")
      val want = PortableHll.registers(exact, Seq("id"), "member", lgK = 7)
        .as[(Long, Int, Int)].collect().toSet
      assert(hb == want, s"rounds=$r")
    }
  }

  test("ball sizes: tiny balls estimate exactly; cycle saturates at its size") {
    // radius 4 covers the whole 4-cycle component from any cycle node
    val est = HyperBall.ballSizes(g, rounds = 4).as[(Long, Long)].collect().toMap
    // linear-counting regime at these sizes: estimates are exact or
    // within 1 for counts this far below m=128
    assert(est(8L) >= 1L && est(8L) <= 3L)  // {8,9}
    assert(est(9L) == 1L)                   // {9}
    for (v <- Seq(1L, 2L, 3L, 4L)) assert(est(v) >= 3L && est(v) <= 5L, s"node $v")
  }

  test("partitioning-independent and monotone in radius") {
    val edges = (1L to 400L).map(i => (i, (i * 17) % 380 + 1)).toDF("src", "dst")
    val a = HyperBall.ballSizes(edges.repartition(13), rounds = 2)
      .orderBy($"id").collect()
    val b = HyperBall.ballSizes(edges, rounds = 2).orderBy($"id").collect()
    assert(a.nonEmpty && a.sameElements(b))
    val r1 = HyperBall.ballSizes(edges, rounds = 1).as[(Long, Long)].collect().toMap
    val r2 = b.map(x => x.getLong(0) -> x.getLong(1)).toMap
    // register sets only grow, so estimates cannot shrink
    assert(r1.forall { case (id, e1) => r2(id) >= e1 })
  }

  test("NULL edge endpoints fail loud") {
    val withNull = Seq((Some(1L), Some(2L)), (Some(3L), None)).toDF("src", "dst")
    assert(intercept[IllegalArgumentException](HyperBall.ballSizes(withNull, 1))
      .getMessage.contains("NULL edge endpoint"))
  }
}
