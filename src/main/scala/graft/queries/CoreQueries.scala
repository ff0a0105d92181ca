package graft.queries

import graft.Tables
import graft.ops.Batching
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named query with an optional DuckDB oracle (SURVEY.md §5.3 contract).
  * `run` is the Spark-first plan; `oracle` is semantically-identical ANSI
  * SQL the driver executes in DuckDB over the same parquet tables.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

/** Core correctness queries Q1–Q12 (SURVEY.md §5.3): each transplants a
  * reference semantic (cited) onto the driver's testdata tables.
  *
  * Float discipline for oracle hash-parity: double SUMs go through an
  * exact DECIMAL(18,x) accumulator and come back as DOUBLE (bit-identical
  * in Spark and DuckDB regardless of partition/accumulation order);
  * ratios of integers are plain double arithmetic (identical IEEE ops on
  * both engines). Every query has a total deterministic ORDER BY.
  */
object CoreQueries {

  /** sum(x) computed exactly: cast each value to DECIMAL, sum (exact,
    * order-independent), cast the total back to double. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // Q1 — filtered/projected catalog scan (S1, P1–P3; StreamTest.cpp:685-689)
  val q1 = Q(
    "q1_catalog_scan",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE o_orderstatus <> 'F' AND o_custkey >= 500
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .where(col("o_orderstatus") =!= "F" && col("o_custkey") >= 500)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // Q2 — time-range fact scan + date/time kitchen sink (S3, P4, F1;
  // StreamTest.cpp:369-374, 72-89)
  val q2 = Q(
    "q2_time_range",
    """SELECT event_id, ts, user_id, event_type,
      |       date_trunc('day', ts) AS day,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
      |FROM events
      |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
      |             AND TIMESTAMP '2024-01-20 12:00:00'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .where(col("ts").between(
        lit("2024-01-10 00:00:00").cast("timestamp"),
        lit("2024-01-20 12:00:00").cast("timestamp")))
      .select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
      .orderBy("event_id")
  }

  // Q3 — per-key rollup with order-sensitive first-non-empty (A1, A2, A8,
  // P9, W1; StreamTest.cpp:840-910: first non-empty metadata per stream,
  // with the "0x0 placeholder gets overwritten" override at 903-910).
  // Arrival order ≈ event_id order (deterministic tiebreak, SURVEY §7.4).
  val q3 = Q(
    "q3_first_nonempty",
    """SELECT user_id,
      |       COUNT(*) AS n_events,
      |       arg_min(props, event_id) FILTER (WHERE length(props) > 0)
      |         AS first_props,
      |       arg_min(props, event_id) FILTER (
      |         WHERE length(props) > 0
      |           AND CAST(json_extract_string(props, '$.k') AS INT) <> 0)
      |         AS first_real_props
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("props"), when(length(col("props")) > 0, col("event_id")))
          .as("first_props"),
        min_by(col("props"), when(length(col("props")) > 0 && k =!= 0, col("event_id")))
          .as("first_real_props"))
      .orderBy("user_id")
  }

  // Q4 — error pivot + flow score (A3, A4, A9, F4; StreamTest.cpp:912-936
  // pivot, 987-996 score = clamp0(trunc((det-err)/det*100))).
  val q4 = Q(
    "q4_error_pivot_score",
    """SELECT user_id,
      |       COUNT(*) AS n_det,
      |       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |       CAST(GREATEST(0.0, FLOOR(((COUNT(*) - SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)) * 100.0) / COUNT(*))) AS INT) AS flow_score
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    def cnt(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L))
    val agged = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_det"),
        cnt("error").as("n_error"),
        cnt("click").as("n_click"),
        cnt("view").as("n_view"),
        cnt("purchase").as("n_purchase"),
        cnt("signup").as("n_signup"))
    agged
      .withColumn("flow_score",
        greatest(lit(0.0),
          floor((col("n_det") - col("n_error")) * 100.0 / col("n_det")))
          .cast("int"))
      .orderBy("user_id")
  }

  // Q5 — vendor score histogram (P5–P7, A2, A5, A10;
  // StreamTest.cpp:441-464 CASE-classify + SUM(CASE) buckets,
  // StreamTest.h:116-118 percentages).
  val q5 = Q(
    "q5_vendor_histogram",
    """SELECT CASE WHEN c_mktsegment IN ('MACHINERY', 'AUTOMOBILE') THEN 'Industrial'
      |            WHEN c_mktsegment LIKE 'BUILD%' THEN 'Construction'
      |            ELSE 'Other' END AS vendor,
      |       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)                          AS n_low,
      |       CAST(SUM(CASE WHEN c_acctbal >= 0 AND c_acctbal <= 5000 THEN 1 ELSE 0 END) AS BIGINT)   AS n_mid,
      |       CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT)                       AS n_high,
      |       COUNT(*) AS total,
      |       SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 100.0 / COUNT(*)                       AS pct_low,
      |       SUM(CASE WHEN c_acctbal >= 0 AND c_acctbal <= 5000 THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS pct_mid,
      |       SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) * 100.0 / COUNT(*)                    AS pct_high
      |FROM customer
      |WHERE c_name LIKE 'Customer#%'
      |GROUP BY 1
      |ORDER BY vendor""".stripMargin) { (s, dir) =>
    val bal = col("c_acctbal")
    def bucket(cond: Column) = sum(when(cond, 1L).otherwise(0L))
    Tables.customer(s, dir)
      .where(col("c_name").like("Customer#%"))
      .withColumn("vendor",
        when(col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE"), "Industrial")
          .when(col("c_mktsegment").like("BUILD%"), "Construction")
          .otherwise("Other"))
      .groupBy("vendor")
      .agg(
        bucket(bal < 0).as("n_low"),
        bucket(bal >= 0 && bal <= 5000).as("n_mid"),
        bucket(bal > 5000).as("n_high"),
        count(lit(1)).as("total"))
      .select(
        col("vendor"), col("n_low"), col("n_mid"), col("n_high"), col("total"),
        (col("n_low") * 100.0 / col("total")).as("pct_low"),
        (col("n_mid") * 100.0 / col("total")).as("pct_mid"),
        (col("n_high") * 100.0 / col("total")).as("pct_high"))
      .orderBy("vendor")
  }

  // Q6 — weakest-program semi-join (J1, J2, A6, A7; StreamTest.cpp:625-638:
  // DISTINCT names of programs where every source scores <= threshold,
  // active-universe floor id >= 237).
  val q6 = Q(
    "q6_weak_programs",
    """SELECT DISTINCT c.c_name, n.n_name
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_custkey IN (
      |  SELECT o_custkey FROM orders
      |  WHERE o_custkey >= 237
      |  GROUP BY o_custkey
      |  HAVING MAX(o_totalprice) <= 250000)
      |ORDER BY c_name, n_name""".stripMargin) { (s, dir) =>
    val weak = Tables.orders(s, dir)
      .where(col("o_custkey") >= 237)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("max_price"))
      .where(col("max_price") <= 250000)
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"), "inner")
      .join(weak, Seq("c_custkey"), "left_semi")
      .select("c_name", "n_name")
      .distinct()
      .orderBy("c_name", "n_name")
  }

  // Q7 — dim rematch with derived concat key, first-match-wins fallback,
  // and lookup-dim encode (J3, J4, P7, W3, F3; StreamTest.cpp:1001-1023
  // "name + ' FHD'" else "name + ' HD'" else keep old; StreamTest.h:181-194
  // resolution classify with UNKNOWN/CUSTOM fallback).
  private val rematchDim: Seq[(String, Int)] = Seq(
    "MACHINERY FHD" -> 101, "AUTOMOBILE HD" -> 102, "BUILDING FHD" -> 103,
    "FURNITURE HD" -> 104, "BUILDING HD" -> 105)
  val q7 = Q(
    "q7_dim_rematch",
    """WITH dim(dim_name, dim_id) AS (VALUES
      |  ('MACHINERY FHD', 101), ('AUTOMOBILE HD', 102), ('BUILDING FHD', 103),
      |  ('FURNITURE HD', 104), ('BUILDING HD', 105))
      |SELECT c.c_custkey, c.c_mktsegment,
      |       CAST(COALESCE(d1.dim_id, d2.dim_id, -1) AS INT) AS matched_id,
      |       CAST(CASE WHEN c.c_acctbal < 0 THEN 1
      |                 WHEN c.c_acctbal < 2500 THEN 2
      |                 WHEN c.c_acctbal < 5000 THEN 3
      |                 WHEN c.c_acctbal < 7500 THEN 4
      |                 ELSE 5 END AS INT) AS res_type,
      |       (CASE WHEN c.c_acctbal < 0 THEN 1
      |             WHEN c.c_acctbal < 2500 THEN 2
      |             WHEN c.c_acctbal < 5000 THEN 3
      |             WHEN c.c_acctbal < 7500 THEN 4
      |             ELSE 5 END) >= 4 AS is_fhd
      |FROM customer c
      |LEFT JOIN dim d1 ON c.c_mktsegment || ' FHD' = d1.dim_name
      |LEFT JOIN dim d2 ON c.c_mktsegment || ' HD' = d2.dim_name
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    import s.implicits._
    val dim = rematchDim.toDF("dim_name", "dim_id")
    val d1 = dim.select(col("dim_name").as("fhd_name"), col("dim_id").as("fhd_id"))
    val d2 = dim.select(col("dim_name").as("hd_name"), col("dim_id").as("hd_id"))
    val resType = when(col("c_acctbal") < 0, 1)
      .when(col("c_acctbal") < 2500, 2)
      .when(col("c_acctbal") < 5000, 3)
      .when(col("c_acctbal") < 7500, 4)
      .otherwise(5)
    Tables.customer(s, dir)
      .join(broadcast(d1), concat(col("c_mktsegment"), lit(" FHD")) === col("fhd_name"), "left_outer")
      .join(broadcast(d2), concat(col("c_mktsegment"), lit(" HD")) === col("hd_name"), "left_outer")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        coalesce(col("fhd_id"), col("hd_id"), lit(-1)).cast("int").as("matched_id"),
        resType.cast("int").as("res_type"),
        (resType >= 4).as("is_fhd"))
      .orderBy("c_custkey")
  }

  // Q8 — batched report windowing (W2; StreamTest.cpp:516-531: chunk rows
  // 30 per message with batch index + per-batch count header).
  val q8 = Q(
    "q8_batching",
    """WITH r AS (
      |  SELECT c_custkey, c_name,
      |         CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS INT) AS rn
      |  FROM customer),
      |b AS (
      |  SELECT *, CAST(FLOOR((rn - 1) / 30.0) AS INT) + 1 AS batch_id FROM r)
      |SELECT rn, batch_id, c_custkey, c_name,
      |       COUNT(*) OVER (PARTITION BY batch_id) AS batch_rows
      |FROM b
      |ORDER BY rn""".stripMargin) { (s, dir) =>
    Batching.withBatches(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        Seq(col("c_custkey")), 30)
      .select("rn", "batch_id", "c_custkey", "c_name", "batch_rows")
      .orderBy("rn")
  }

  // Q9 — string kitchen sink (F2; StreamTest.cpp:1004-1005 concat,
  // HttpServer.cpp:108-129 replace + truncate-at-limit).
  val q9 = Q(
    "q9_strings",
    """SELECT doc_id,
      |       lang || ':' || source AS tag,
      |       replace(substr(text, 1, 50), ' ', '_') AS head_snake,
      |       CAST(length(text) AS INT) AS n_chars,
      |       upper(lang) AS lang_up,
      |       CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || '...'
      |            ELSE text END AS truncated
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        concat_ws(":", col("lang"), col("source")).as("tag"),
        regexp_replace(substring(col("text"), 1, 50), " ", "_").as("head_snake"),
        length(col("text")).as("n_chars"),
        upper(col("lang")).as("lang_up"),
        when(length(col("text")) > 200,
          concat(substring(col("text"), 1, 200), lit("...")))
          .otherwise(col("text")).as("truncated"))
      .orderBy("doc_id")
  }

  // Q10 — JSON envelope round-trip (F5, F6; StreamTest.cpp:283-299 build
  // flat JSON, 229-249 iterate keys).
  val q10 = Q(
    "q10_json_roundtrip",
    """SELECT event_id, user_id,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |       '{"k":' || json_extract_string(props, '$.k') || '}' AS re_encoded,
      |       CAST(len(json_keys(props)) AS INT) AS n_keys
      |FROM events
      |WHERE event_id < 2000
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(s, dir)
      .where(col("event_id") < 2000)
      .select(col("event_id"), col("user_id"), k.as("k"), col("props"))
      // Oracle builds the envelope by string concat, so a missing/null k
      // yields NULL (not "{}"); match that instead of bare to_json.
      .withColumn("re_encoded",
        when(col("k").isNotNull, to_json(struct(col("k"))))
          .otherwise(lit(null).cast("string")))
      // Genuinely iterate the (unknown) key set, as the reference does
      // (StreamTest.cpp:229-249), rather than assuming a 1-key object.
      .withColumn("n_keys", size(json_object_keys(col("props"))).cast("int"))
      .drop("props")
      .orderBy("event_id")
  }

  // Q11 — tumbling daily window aggregation (ST4, A2;
  // StreamTest.cpp:47-70/972: daily window close → aggregate the day).
  val q11 = Q(
    "q11_daily_window",
    """SELECT date_trunc('day', ts) AS day, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .orderBy("day", "event_type")
  }

  // Q12 — generic join+agg sanity (J1, A2; revenue per order status).
  val q12 = Q(
    "q12_revenue_join",
    """SELECT o_orderstatus,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val all: Seq[Q] = Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12)
}
