package graft.operators

import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  test("asofJoin: backward match, inclusive, ties, tolerance, no-match") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 30L),
      (4L, "u2", 5L), (5L, "u3", 50L)).toDF("id", "user", "t")
    val right = Seq(
      ("u1", 10L, "a"), // equal timestamp: inclusive match for id=1
      ("u1", 25L, "b"),
      ("u1", 25L, "c"), // tie at t=25 → lexicographically greatest wins
      ("u2", 7L, "d") // after u2's only event → no match
    ).toDF("user", "rt", "v")

    val out = Temporal.asofJoin(left, right, Seq("user"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4)))).toMap
    assert(out(1L) == ((Some(10L), Some("a")))) // inclusive at equal time
    assert(out(2L) == ((Some(10L), Some("a")))) // 25 is in the future
    assert(out(3L) == ((Some(25L), Some("c")))) // tie at 25 → max tuple "c"
    assert(out(4L) == ((None, None))) // no right row at/before t=5
    assert(out(5L) == ((None, None))) // u3 has no right rows at all

    // tolerance: id=3 matched rt=25 with gap 5; tolerance 4 nulls it out
    val tol = Temporal.asofJoin(left, right, Seq("user"), "t", "rt", Seq("v"),
        tolerance = Some(4L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(tol(3L).isEmpty)
    assert(tol(1L).contains(10L)) // gap 0 still within tolerance
  }

  test("asofJoinForward: forward match, inclusive, ties, tolerance, no-match") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 30L),
      (4L, "u2", 5L), (5L, "u3", 50L)).toDF("id", "user", "t")
    val right = Seq(
      ("u1", 10L, "a"), // equal timestamp: inclusive match for id=1
      ("u1", 25L, "b"),
      ("u1", 25L, "c"), // tie at t=25 → lexicographically greatest wins
      ("u2", 3L, "d") // before u2's only event → no forward match
    ).toDF("user", "rt", "v")

    val out = Temporal.asofJoinForward(left, right, Seq("user"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4)))).toMap
    assert(out(1L) == ((Some(10L), Some("a")))) // inclusive at equal time
    assert(out(2L) == ((Some(25L), Some("c")))) // next at 25, tie → max tuple
    assert(out(3L) == ((None, None))) // nothing at/after t=30
    assert(out(4L) == ((None, None))) // no right row at/after t=5
    assert(out(5L) == ((None, None))) // u3 has no right rows at all

    // tolerance: id=2 matched rt=25 with gap 5; tolerance 4 nulls it out
    val tol = Temporal.asofJoinForward(left, right, Seq("user"), "t", "rt",
        Seq("v"), tolerance = Some(4L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(tol(2L).isEmpty)
    assert(tol(1L).contains(10L)) // gap 0 still within tolerance
  }

  test("asofJoinForward keeps every left row and all its columns") {
    import spark.implicits._
    val left = Seq((1L, "u1", 10L, "x"), (2L, "u2", 20L, "y"))
      .toDF("id", "user", "t", "payload")
    val right = Seq(("u1", 15L, 1.5)).toDF("user", "rt", "score")
    val out = Temporal.asofJoinForward(left, right, Seq("user"), "t", "rt", Seq("score"))
    assert(out.count() == 2)
    assert(out.columns.toSeq ==
      Seq("id", "user", "t", "payload", "asof_time", "asof_score"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(3) == "x")
    assert(byId(1L).getDouble(5) == 1.5)
    assert(byId(2L).isNullAt(4) && byId(2L).isNullAt(5))
  }

  test("rangeJoin: boundary-inclusive, multi-match, cross-bucket intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, "u1", 100L), (2L, "u1", 150L), (3L, "u1", 999L),
      (4L, "u2", 100L)).toDF("id", "user", "t")
    val intervals = Seq(
      ("u1", 100L, 150L, "a"), // both endpoints inclusive: matches 1 and 2
      ("u1", 120L, 400L, "b"), // overlaps the first: point 2 matches both
      ("u2", 90L, 110L, "c") // other key: only point 4
    ).toDF("user", "s", "e", "tag")
    // bucketWidth 64 → interval (100,150) spans buckets 1-2, (120,400)
    // spans 1-6: the cross-bucket copies must not duplicate matches
    val got = Temporal.rangeJoin(points, intervals, Seq("user"), "t", "s", "e", 64L)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (4L, "c")))
  }

  test("asofJoin keeps every left row and all its columns") {
    import spark.implicits._
    val left = Seq((1L, "u1", 10L, "x"), (2L, "u2", 20L, "y"))
      .toDF("id", "user", "t", "payload")
    val right = Seq(("u1", 5L, 1.5)).toDF("user", "rt", "score")
    val out = Temporal.asofJoin(left, right, Seq("user"), "t", "rt", Seq("score"))
    assert(out.count() == 2)
    assert(out.columns.toSeq ==
      Seq("id", "user", "t", "payload", "asof_time", "asof_score"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(3) == "x")
    assert(byId(1L).getDouble(5) == 1.5)
    assert(byId(2L).isNullAt(4) && byId(2L).isNullAt(5))
  }
}
