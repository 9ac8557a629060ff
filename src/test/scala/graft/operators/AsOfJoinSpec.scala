package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof semantics: latest right <= left time, per key; NULL before any right") {
    val left = Seq(
      (1L, 5L, "a"), (1L, 15L, "b"), (1L, 25L, "c"),
      (2L, 10L, "d"),                 // user 2 has no prior right at t=10
      (2L, 30L, "e"))
      .toDF("user_id", "t", "name")
    val right = Seq(
      (1L, 10L, 100L), (1L, 20L, 200L),
      (2L, 20L, 300L))
      .toDF("user_id", "t", "version")

    val out = AsOfJoin.asof(left, right, "user_id", "t", "version")
      .select("name", "asof_version").as[(String, Option[Long])]
      .collect().toMap
    assert(out("a") === None)        // t=5 before any right
    assert(out("b") === Some(100L))  // t=15: latest right is t=10
    assert(out("c") === Some(200L))  // t=25: latest right is t=20
    assert(out("d") === None)
    assert(out("e") === Some(300L))
  }

  test("asof tie: right row at exactly left time wins (<= contract)") {
    val left = Seq((1L, 10L, "x")).toDF("user_id", "t", "name")
    val right = Seq((1L, 10L, 777L)).toDF("user_id", "t", "version")
    val out = AsOfJoin.asof(left, right, "user_id", "t", "version")
      .select("asof_version").as[Option[Long]].collect()
    assert(out.head === Some(777L))
  }

  test("asof preserves all left columns and row count") {
    val left = Seq((1L, 5L, "a", 3.14)).toDF("user_id", "t", "name", "score")
    val right = Seq((1L, 1L, 9L)).toDF("user_id", "t", "version")
    val out = AsOfJoin.asof(left, right, "user_id", "t", "version")
    assert(out.columns.toSet === Set("user_id", "t", "name", "score", "asof_version"))
    assert(out.count() === 1)
  }
}
