package graft.tools

/** Prints the registered query names, one per line — lets shell tooling
  * (scripts/sf1_evidence.py) build SPARK_GRAFT_QUERIES subsets without
  * hard-coding a list that drifts from the registry. No SparkSession:
  * the registry is a plain Map. */
object ListQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
