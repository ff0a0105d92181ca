package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for hot-key joins (100 TB posture; SURVEY §7.5).
  *
  * A shuffle join on a skewed key funnels the hot key's rows into one
  * task. Salting splits each hot key into `factor` sub-keys: the large
  * side gets a deterministic salt from a unique column (hash, not rand()
  * — reproducible runs), the small side is replicated `factor` times so
  * every sub-key finds its match. AQE's skew-join handles moderate skew
  * automatically; salting is the explicit tool for pathological keys.
  */
object Salting {

  /** Equi-join `large ⋈ small` on `key`, salted `factor` ways.
    * `uniqueCol` is any unique large-side column used to derive the
    * deterministic salt. Produces exactly the same rows as
    * `large.join(small, key)`. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, factor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(factor.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until factor).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
