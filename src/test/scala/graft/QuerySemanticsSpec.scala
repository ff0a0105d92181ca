package graft

import org.apache.spark.sql.functions._

/** Point semantics checks for query building blocks that the sf fixtures
  * don't exercise (e.g. q10's multi-key JSON envelopes —
  * StreamTest.cpp:229-249 iterates an UNKNOWN key set).
  */
class JsonEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("n_keys counts the actual JSON key set, not an assumed single key") {
    val df = Seq(
      (1L, """{"k": 5}"""),
      (2L, """{"k": 1, "extra": "x", "more": 2}"""),
      (3L, """{}"""),
      (4L, """{"other": true}""")
    ).toDF("event_id", "props")
    val got = df
      .select(col("event_id"),
        size(json_object_keys(col("props"))).cast("int").as("n_keys"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1, 2L -> 3, 3L -> 0, 4L -> 1))
  }

  test("re_encoded is NULL when k is absent (oracle concat semantics)") {
    val df = Seq(
      (1L, """{"k": 5}"""),
      (2L, """{"other": 1}""")
    ).toDF("event_id", "props")
    val k = get_json_object(col("props"), "$.k").cast("int")
    val got = df
      .select(col("event_id"), k.as("k"))
      .withColumn("re_encoded",
        when(col("k").isNotNull, to_json(struct(col("k"))))
          .otherwise(lit(null).cast("string")))
      .select("event_id", "re_encoded")
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("""{"k":5}"""))
    assert(got(2L) === None)
  }
}
