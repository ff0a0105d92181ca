package graft.ext

import org.apache.spark.sql.functions._

class ProfileSpec extends graft.SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), Some("x")),
    (Some(2L), Some("a"), None),
    (Some(3L), None, Some("x")),
    (Some(3L), Some("b"), Some("z"))
  ).toDF("id", "grp", "txt")

  test("null / distinct / min / max per column, one row per column") {
    val got = Profile.profile(df, Seq("id", "grp", "txt"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(got === Array(
      ("grp", 4L, 1L, 2L, "a", "b"),
      ("id", 4L, 0L, 3L, "1", "3"),
      ("txt", 4L, 1L, 2L, "x", "z")))
  }

  test("numeric min/max is numeric BEFORE the string render") {
    // 9 < 10 numerically but "9" > "10" lexicographically — the cast
    // must happen after the min/max, not before
    val d = Seq(9L, 10L, 2L).toDF("v")
    val got = Profile.profile(d, Seq("v"))
      .select("min_val", "max_val").as[(String, String)].head()
    assert(got === ("2", "10"))
  }

  test("hostile column names: quotes, spaces, dots profile safely; backticks refuse") {
    // names that would break — or inject expressions into — the stack()
    // SQL string if identifiers weren't backtick-quoted and labels
    // weren't escaped
    val hostile = df.select(
      col("id").as("id value"),          // space
      col("grp").as("grp.sub"),          // dot (must NOT parse as struct access)
      col("txt").as("it's"))             // quote (must not break the label literal)
    val got = Profile.profile(hostile, Seq("id value", "grp.sub", "it's"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(got === Array(
      ("grp.sub", 4L, 1L, 2L, "a", "b"),
      ("id value", 4L, 0L, 3L, "1", "3"),
      ("it's", 4L, 1L, 2L, "x", "z")))
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df.select(col("id").as("bad`tick")), Seq("bad`tick"))
    }
    assert(e.getMessage.contains("backtick"))
  }

  test("plan: ONE file scan — profiling never rescans per column") {
    val doc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val p = Profile.profile(doc, Seq("doc_id", "source", "text"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
  }
}

class KeySkewSpec extends graft.SparkSpec {
  import spark.implicits._

  test("hand-checked skew: hot key 6 of 10 rows over 5 keys -> skew 3e6") {
    // counts: hot=6, a..d=1 each -> n_keys=5, n_rows=10, max=6
    // skew_e6 = 6*5*1e6/10 = 3,000,000 (3x the uniform mean)
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val got = Profile.keySkew(df, col("k"), k = 3).collect()
    assert(got.length === 3)
    val top = got.head
    assert(top.getString(0) === "hot" && top.getLong(1) === 6L)
    assert(top.getLong(2) === 5L && top.getLong(3) === 10L)
    assert(got.forall(_.getLong(4) === 3000000L)) // table-wide factor on every row
    // uniform table -> skew exactly 1e6
    val uni = Seq("a", "b", "c", "d").toDF("k")
    assert(Profile.keySkew(uni, col("k"), k = 2).collect()
      .forall(_.getLong(4) === 1000000L))
  }
}

class RegionalRevenueSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("Q5 shape: local-supplier constraint prunes cross-nation pairs") {
    val dir = "/root/testdata/sf0.001"
    val full = graft.SparkEntry.queries("x106_regional_revenue")(spark, dir)
      .collect()
    // every output nation must be a EUROPE nation
    val euroNations = graft.Tables.nation(spark, dir)
      .join(graft.Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "EUROPE")
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(full.nonEmpty)
    assert(full.map(_.getString(0)).toSet.subsetOf(euroNations))
    // revenue positive and items counted
    assert(full.forall(r => r.getLong(1) > 0 && r.getDouble(2) > 0))
  }
}
