package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals plain join on a skewed key distribution") {
    // 90% of rows share key 1 (hot key)
    val large = (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) (i % 5).toLong + 2 else 1L))
      .toDF("row_id", "k")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"))
      .toDF("k", "label")
    val plain = large.join(small, Seq("k")).select($"row_id", $"label")
    val salted = Skew.saltedEquiJoin(large, small, "k", "row_id", salts = 8)
      .select($"row_id", $"label")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join rejects right/full outer joins (small side is exploded)") {
    val large = Seq((1L, 1L)).toDF("row_id", "k")
    val small = Seq((1L, "x")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(large, small, "k", "row_id", 4, joinType = "full")
    }
    // left outer stays allowed
    assert(Skew.saltedEquiJoin(large, small, "k", "row_id", 4, joinType = "left").count() == 1)
  }

  test("salt is deterministic and bounded") {
    val df = (1 to 100).map(_.toLong).toDF("id")
    val s1 = df.select(Skew.salt($"id", 8).as("s")).as[Long].collect()
    val s2 = df.select(Skew.salt($"id", 8).as("s")).as[Long].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
    assert(s1.distinct.length > 1)
  }
}
