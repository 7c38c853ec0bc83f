package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication operators for LLM training-data pipelines (builder
  * prompt north star; the reference computes sizes only). Three
  * families:
  *
  *   - exact: content-digest grouping (`sha2` — portable, so the
  *     DuckDB oracle reproduces digests bit-for-bit);
  *   - near-duplicate text: word-shingle MinHash + LSH banding to
  *     generate candidates WITHOUT the O(n²) cross join, then exact
  *     Jaccard verification of candidates only — the standard
  *     100 TB-scale shape (the oracle brute-forces all pairs, valid
  *     at verification scale; with 16 bands × 4 rows the probability
  *     of LSH missing a Jaccard ≥ 0.8 pair is < 1e-3 per pair and
  *     < 1e-14 for the ≥ 0.97 pairs present in the data);
  *   - near-duplicate embeddings: cosine threshold over vector pairs
  *     (brute force here; the LSH-bucketed scale path lives in
  *     [[Similarity]]).
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // ----------------------------------------------------------------
  // Exact dedup: SHA-256 content digest
  // ----------------------------------------------------------------

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(sha2(col("text"), 256).as("digest"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("copies"))
      .orderBy("digest")

  val dedupExactSql: String =
    """SELECT sha256(text) AS digest, min(doc_id) AS keep_id,
      |       count(*) AS copies
      |FROM documents GROUP BY sha256(text) ORDER BY digest""".stripMargin

  // ----------------------------------------------------------------
  // Near-dup text: MinHash + LSH banding + exact verify
  // ----------------------------------------------------------------

  private val NumHashes = 64
  private val Bands = 16 // 16 bands x 4 rows
  private val RowsPerBand = NumHashes / Bands
  private val JaccardThreshold = 0.8

  /** Word 3-gram shingle set as distinct strings (single whole-text
    * shingle for docs under 3 words).
    */
  private def shingleCol: Column = {
    val w = split(col("text"), " +")
    array_distinct(
      when(size(w) >= 3,
        transform(sequence(lit(0), size(w) - 3),
          i => concat_ws(" ", slice(w, i + 1, lit(3)))))
        .otherwise(array(col("text"))))
  }

  /** Candidate pairs via MinHash signatures + banding, verified with
    * exact Jaccard on the shingle sets. Output: every pair with
    * Jaccard ≥ 0.8 (doc_a < doc_b).
    *
    * Plan shape: explode shingle hashes -> 64 min-aggs per doc (one
    * shuffle on doc_id) -> explode 16 band keys -> self-join on
    * (band, band_hash) buckets (shuffle on the band key, bucket sizes
    * are tiny) -> distinct pairs -> two broadcast-able joins back to
    * shingle sets -> exact Jaccard filter. No all-pairs product
    * anywhere.
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), shingleCol.as("shingles"))

    // (doc_id, shingle-hash) exploded; xxhash64 is the base hash.
    val hashed = d.select(col("doc_id"),
      explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))

    // 64 permuted min-hashes in ONE aggregation pass. Permutation i is
    // the seeded re-hash xxhash64(h, i) — overflow-free under ANSI
    // mode (Spark 4 default), unlike the classic (a·h+b) mod p form.
    val minhashAggs = (0 until NumHashes).map { i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i")
    }
    val signatures = hashed.groupBy(col("doc_id")).agg(minhashAggs.head, minhashAggs.tail: _*)

    // 16 band keys per doc: hash of the band's 4 signature values.
    val bandCols = (0 until Bands).map { b =>
      val slice = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("bh"))
    }
    val banded = signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))

    // Bucket self-join -> unique candidate pairs.
    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    // Exact-verify candidates only.
    val sa = d.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
    val sb = d.select(col("doc_id").as("doc_b"), col("shingles").as("sb"))
    candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Oracle: brute-force all-pairs exact Jaccard (valid at sf0.01;
    * the Spark side must find the same pairs via LSH).
    */
  val dedupMinhashSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(w) >= 3
       |      THEN [concat_ws(' ', w[i], w[i+1], w[i+2])
       |            for i in generate_series(1, len(w)-2)]
       |      ELSE [text] END) AS s
       |  FROM (SELECT doc_id, text, string_split_regex(text, ' +') AS w
       |        FROM documents)
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |WHERE jaccard >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ----------------------------------------------------------------
  // Near-dup embeddings: cosine threshold
  // ----------------------------------------------------------------

  private val CosineThreshold = 0.45

  /** Embedding-cosine near-dup pairs. Brute-force all-pairs here
    * (correctness surface); the bucketed scale path is
    * [[Similarity.simLsh]]. Cosine rounded to 6dp at the output
    * boundary so cross-engine FP agreement is exact.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim",
        round(VectorOps.cosineWithNorms(col("ea"), col("eb"), col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbeddingSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
       |      i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) AS nrm
       |  FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_sum(list_transform(generate_series(1, len(a.embedding)),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
       |    / (a.nrm * b.nrm), 6) AS cos_sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE round(list_sum(list_transform(generate_series(1, len(a.embedding)),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
       |    / (a.nrm * b.nrm), 6) >= $CosineThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ----------------------------------------------------------------
  // SimHash: 64-bit signatures + banded Hamming candidates
  // ----------------------------------------------------------------

  /** 64-bit SimHash per doc over word-3-gram shingle xxhash64s (bit i
    * of the signature = sign of Σ ±1 over that bit across shingle
    * hashes), plus the 4×16-bit bands used for Hamming-candidate
    * joins. Shingles (not bare words) carry the word-order signal: on
    * the testdata, near-dup pairs land at Hamming ≤ 10 vs a ~32
    * background. xxhash64 is Spark-specific -> rows-only driver
    * check; fidelity is covered by `DedupSpec`.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val hashed = docs(spark, dir)
      .select(col("doc_id"), explode(shingleCol).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    // bit contributions: +1 where bit set, -1 otherwise; 64 sums.
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1).otherwise(-1)).as(s"b$i")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    sigs.select(col("doc_id"), simhash.as("simhash"))
      .withColumn("band0", col("simhash").bitwiseAND(lit(0xFFFFL)))
      .withColumn("band1", shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band2", shiftright(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band3", shiftright(col("simhash"), 48).bitwiseAND(lit(0xFFFFL)))
      .orderBy("doc_id")
  }
}
