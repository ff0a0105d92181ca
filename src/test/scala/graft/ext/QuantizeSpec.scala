package graft.ext

import org.apache.spark.sql.functions._

/** Pins [[Similarity.quantizeInt8]]'s contract: symmetric per-vector
  * scale, HALF_UP codes clamped to [-127, 127], the zero-vector path,
  * and the half-step reconstruction bound for unclamped components. */
class QuantizeSpec extends graft.SparkSpec {
  import spark.implicits._

  test("codes, clamp, zero vector, and the half-scale error bound") {
    val embs = Similarity.withNorm(
      Seq((1L, Seq(1.0, -2.0, 0.5)), (2L, Seq(0.0, 0.0, 0.0)))
        .toDF("vec_id", "emb"),
      col("vec_id"), col("emb"))
    val got = Similarity.quantizeInt8(embs).orderBy("vec_id")
      .as[(Long, Double, Seq[Int], Double)].collect()
    val (id1, scale1, q1, err1) = got(0)
    assert(id1 === 1L && scale1 === 2.0 / 127.0)
    // round(63.5) HALF_UP = 64; the max component hits exactly -127
    assert(q1 === Seq(64, -127, 32))
    // reconstruction of an unclamped component is within half a step
    assert(err1 <= scale1 / 2 + 1e-9)
    assert(got(1) === ((2L, 0.0, Seq(0, 0, 0), 0.0)))
  }
}
