package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * group), MinHash+LSH near-dup, SimHash, exact n-gram Jaccard.
  *
  * 100 TB posture: exact dedup is one hash-shuffle on a 16-byte digest;
  * MinHash is explode → ONE groupBy (map-side-combinable mins) → band
  * self-join that only shuffles (doc_id, band) pairs — candidate
  * verification touches candidate pairs, never the N² cross product.
  * The brute-force `jaccardPairs` exists as the small-data oracle twin.
  */
object Dedup {

  // ---- exact ----

  /** Per-content groups: digest, surviving (minimum) id, copy count. */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct content (first by id). */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(md5(text)).orderBy(id)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  // ---- shingling ----

  /** Distinct word n-gram shingles of `text`; docs shorter than n words
    * contribute the whole text as one shingle. Native expression — the
    * composed `transform(sequence(...))` form evaluates its lambdas
    * interpreted and measured ~9 s for one explode at sf0.1. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordShingles.word_shingles(text, n)

  /** Exact pairwise n-gram Jaccard via an inverted shingle index:
    * explode distinct shingles, self-join on the shingle to count common
    * shingles per pair, then `jaccard = common / (|a| + |b| - common)`.
    * Only pairs sharing at least one shingle are ever materialized —
    * the scalable exact algorithm (an N² cross join with per-pair
    * `array_intersect` measured 67 s where this runs in seconds). */
  def jaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
      threshold: Double): DataFrame = {
    val sh = df.select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.select(col("sh"), col("doc_id").as("a"))
      .join(sh.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // ---- MinHash + LSH ----

  /** MinHash signatures: one row per doc with `numHashes` min-hash
    * columns `mh_0..mh_{k-1}`, computed with a single explode + groupBy
    * (each min is map-side combinable). The k hash functions are
    * `xxhash64(i, xxhash64(shingle))` — seeded re-hashing avoids the
    * 64-bit affine transform that ANSI mode rejects on overflow, and
    * stays inside whole-stage codegen. */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
      n: Int, numHashes: Int): DataFrame = {
    val exploded = df
      .select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
    val mins = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("h"))).as(s"mh_$i")
    }
    exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Near-duplicate pairs via banded LSH over MinHash signatures, then
    * exact-Jaccard verification of the candidates only.
    *
    * With `numHashes = bands * rowsPerBand`, a pair with Jaccard j is a
    * candidate with probability 1-(1-j^rows)^bands (e.g. 32 bands × 2
    * rows ⇒ ~99.99% at j=0.5).
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, id, text, n, numHashes)
    // band hash = xxhash64 over the band's signature slice
    val bandCols = (0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64((0 until rows).map(r => col(s"mh_${bIdx * rows + r}")): _*)
          .as("bh"))
    }
    val banded = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val l = banded.select(col("band"), col("bh"), col("doc_id").as("a"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("b"))
    val candidates = l.join(r, Seq("band", "bh")).where(col("a") < col("b"))
      .select("a", "b").distinct()
    // verify candidates with exact shingle Jaccard
    val sh = df.select(id.as("doc_id"), shingles(text, n).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash per doc: tokens hashed with xxhash64; each bit of the
    * fingerprint is the sign of the per-bit vote sum. One explode + one
    * groupBy (64 map-side-combinable sums). */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val exploded = df
      .select(id.as("doc_id"), explode(split(trim(text), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { j =>
      sum(when(getbit(col("h"), lit(j)) === 1, 1).otherwise(-1)).as(s"v_$j")
    }
    val bits: Seq[Column] = (0 until 64).map { j =>
      when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }
    exploded.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** Pairs within `maxHamming` of each other, found by 4×16-bit block
    * LSH (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 blocks equal). */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val blocks = (0 until 4).map { blk =>
      struct(lit(blk).as("blk"),
        (shiftright(col("simhash"), blk * 16).bitwiseAND(lit(0xFFFFL))).as("key"))
    }
    val banded = sigs
      .select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.key").as("key"))
    val l = banded.select(col("blk"), col("key"), col("doc_id").as("a"), col("simhash").as("sa"))
    val r = banded.select(col("blk"), col("key"), col("doc_id").as("b"), col("simhash").as("sb"))
    l.join(r, Seq("blk", "key")).where(col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
