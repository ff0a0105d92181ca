package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Per-query fixed-cost profiler (round-16 bench-gate work): runs each
  * named query several times warm and reports the steady-state wall
  * beside the Spark job/stage/task counts one execution schedules —
  * the decomposition that says whether a toy-scale constant is
  * scheduling overhead (many tiny stages) or genuine work (few fat
  * ones). Local tooling, like ProfileX148 — NOT part of the engine.
  *
  * SPARK_GRAFT_QUERIES selects (default: a representative mid-band
  * set); SPARK_GRAFT_SF_DIR the corpus.
  */
object ConstantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("constant-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val strip = sys.env.get("SPARK_GRAFT_STRIP").contains("1")
    val selected0 = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val selected = selected0.map { case (n, f) =>
      if (strip)
        (n, (s: SparkSession, d: String) =>
          org.apache.spark.sql.GraftSqlBridge.stripTerminalSort(f(s, d)))
      else (n, f)
    }
    selected.foreach { case (name, fn) =>
      // whole query body in a Try: a `return` inside a foreach closure
      // is a Scala NON-LOCAL return that would abort main entirely —
      // skipping every remaining query and spark.stop() — instead of
      // skipping to the next query as the ERR print implies (advisor
      // find, round 16)
      scala.util.Try {
        // two warm passes, then count the third, then floor over 3 more
        (0 until 2).foreach { _ =>
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        Thread.sleep(200) // let the async listener bus drain
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val counted = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val (j, st, tk) = (jobs.get, stages.get, tasks.get)
        val floor = (0 until 3).map { _ =>
          val t1 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t1) / 1e9
        }.min
        println(f"PROBE $name%-28s floor=$floor%6.2fs one=$counted%6.2fs " +
          f"jobs=$j%3d stages=$st%3d tasks=$tk%5d")
      }.recover { case e: Throwable =>
        println(s"PROBE $name ERR ${e.getMessage}")
      }
      System.gc()
    }
    spark.stop()
  }
}
