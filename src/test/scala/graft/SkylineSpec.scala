package graft

import graft.ops.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("frontier2D keeps exactly the undominated points") {
    // (5,1) dominated by (7,1) [equal y, larger x]; (3,2) survives;
    // (7,1) survives; (1,5) survives; (2,4) dominated by (3,2)? no —
    // y 4 > 2, x 2 < 3: incomparable, survives; (2,3) dominated by (2,4)
    val pts = Seq((5L, 1L), (7L, 1L), (3L, 2L), (1L, 5L), (2L, 4L), (2L, 3L))
      .toDF("x", "y")
    val got = Skyline.frontier2D(pts, "x", "y").as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 1L), (3L, 2L), (2L, 4L), (1L, 5L)))
  }

  test("frontier2D equal points collapse to one frontier pair") {
    val pts = Seq((4L, 4L), (4L, 4L), (1L, 1L)).toDF("x", "y")
    val got = Skyline.frontier2D(pts, "x", "y").as[(Long, Long)].collect().toSeq
    assert(got == Seq((4L, 4L)))
  }

  test("frontier2D drops NULL-coordinate rows") {
    val pts = Seq((Some(5L), Some(1L)), (None, Some(9L)), (Some(9L), None))
      .toDF("x", "y")
    val got = Skyline.frontier2D(pts, "x", "y").as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, 1L)))
  }

  test("frontier2D is bucket-count invariant") {
    val pts = (1L to 500L).map(i => (i, (i * 37) % 101)).toDF("x", "y")
    val a = Skyline.frontier2D(pts, "x", "y", buckets = 1).as[(Long, Long)].collect().toSet
    val b = Skyline.frontier2D(pts, "x", "y", buckets = 7).as[(Long, Long)].collect().toSet
    val c = Skyline.frontier2D(pts, "x", "y", buckets = 64).as[(Long, Long)].collect().toSet
    assert(a == b && b == c)
    // brute-force check on the small instance
    val raw = (1L to 500L).map(i => (i, (i * 37) % 101))
    val brute = raw.filter { case (x, y) =>
      !raw.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.toSet
    assert(a == brute)
  }
}
