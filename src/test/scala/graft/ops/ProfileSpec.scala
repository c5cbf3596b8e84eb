package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 1.5, "b"),
    (2L, -3.0, "a"),
    (3L, null, "c"),
    (null, 2.25, null))
    .toDF("k", "v", "s")

  test("profile computes counts, rendered min/max, and exact sums per column") {
    val out = Profile.profile(df, Seq("k", "v", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out("k") === ((4L, 1L, "1.000000", "3.000000", Some(6.0))))
    assert(out("v") === ((4L, 1L, "-3.000000", "2.250000", Some(0.75))))
    assert(out("s") === ((4L, 1L, "a", "c", None)))
  }

  test("profile of N columns is one aggregate: a single exchange in the plan") {
    val plan = Profile.profile(df, Seq("k", "v", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"expected exactly one shuffle for the whole profile, plan:\n$plan")
  }

  test("profile rejects unknown columns eagerly") {
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
  }

  test("profile handles column names with spaces, dots, and quotes") {
    val weird = df.withColumnRenamed("k", "a b")
      .withColumnRenamed("v", "it's.v")
    val out = Profile.profile(weird, Seq("a b", "it's.v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a b" -> 4L, "it's.v" -> 4L))
  }
}
