package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("asOf picks the greatest right ts <= left ts per key; inclusive; null before first") {
    val left = Seq(
      ("u1", 10L, "l1"),
      ("u1", 20L, "l2"),
      ("u1", 5L, "l0"), // before any right row
      ("u2", 10L, "l3")
    ).toDF("k", "t", "lv")
    val right = Seq(
      ("u1", 10L, "r10"), // equal ts -> inclusive match
      ("u1", 15L, "r15"),
      ("u2", 9L, "r9"),
      ("u3", 1L, "r_other")
    ).toDF("k", "t", "rv")
    val got = AsOfJoin
      .asOf(left, right, Seq("k"), "t", "t")
      .select("lv", "right_rv")
      .as[(String, Option[String])]
      .collect()
      .toMap
    assert(got === Map(
      "l0" -> None,
      "l1" -> Some("r10"), // inclusive at equal ts
      "l2" -> Some("r15"),
      "l3" -> Some("r9")
    ))
  }

  test("right-side (key, ts) ties resolve deterministically: greatest tiebreak tuple wins") {
    val left = Seq(("u1", 10L, "l1")).toDF("k", "t", "lv")
    // three right rows at the identical (key, ts): the default tiebreak
    // orders by the atomic payload columns, so (9, "z") > (9, "a") > (3, "m")
    val right = Seq(
      ("u1", 10L, 9, "a"),
      ("u1", 10L, 3, "m"),
      ("u1", 10L, 9, "z")
    ).toDF("k", "t", "prio", "rv")
    val got = AsOfJoin
      .asOf(left, right, Seq("k"), "t", "t")
      .select("right_prio", "right_rv")
      .as[(Int, String)]
      .head()
    assert(got === ((9, "z")))
    // explicit tiebreak overrides the default column order
    val got2 = AsOfJoin
      .asOf(left, right, Seq("k"), "t", "t", tieBreak = Seq("rv"))
      .select("right_rv")
      .as[String]
      .head()
    assert(got2 === "z")
  }

  test("right rows never leak keys absent from the left") {
    val left = Seq(("u1", 10L, "a")).toDF("k", "t", "lv")
    val right = Seq(("u9", 1L, "x")).toDF("k", "t", "rv")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t").collect()
    assert(got.length === 1 && got.head.getAs[String]("right_rv") === null)
  }
}
