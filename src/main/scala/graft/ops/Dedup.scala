package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextFunctions._

/** Deduplication operators for training-data pipelines, all shaped for
  * scale: hash-partitioned group-bys and shingle/band bucket joins — never
  * a raw O(n²) cross join on the full corpus. The quadratic work only
  * happens inside candidate buckets.
  */
object Dedup {

  /** Exact dedup: one survivor (minimal `orderCol`) per distinct key, with
    * the duplicate count. A single hash-partitioned aggregate — the 100 TB
    * path is one shuffle on the (hashed) key. Dedup on hashKey(text) rather
    * than raw text to keep shuffle rows narrow when keys are long. */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(orderCol)).as(orderCol),
        count(lit(1)).as("n_copies"))

  /** Exact dedup keeping full rows: survivor = first row per key ordered by
    * `orderCol` (window, one shuffle). */
  def exactRows(df: DataFrame, keyCols: Seq[String], orderCol: String)
      : DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Near-duplicate pairs by k-shingle Jaccard similarity.
    *
    * Plan shape: explode distinct shingles → (optional) drop
    * too-frequent shingles (stop-shingles blow up the self-join at scale) →
    * self-join on shingle (shuffle co-partitioned on the shingle hash) →
    * per-pair intersection counts → Jaccard from per-doc set sizes.
    * Output: (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b.
    *
    * @param maxShingleFreq drop shingles occurring in more than this many
    *        docs (0 = keep all; set at scale, e.g. 1000).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, maxShingleFreq: Long = 0): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), k))).as("sh"))
    val filtered = (
      if (maxShingleFreq > 0) {
        val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxShingleFreq).select("sh")
        sh.join(freq, "sh")
      } else sh
    ).persist() // reused by sizes + both self-join sides: 3 consumers
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sz", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sz", "size_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signatures: for permutation i, h_i(doc) = min over shingles of
    * ((a_i * (H mod M) + b_i) mod M) with deterministic constants
    * a_i = 2i+3, b_i = i²+1, M = 2^31-1 (products stay < 2^40, no
    * overflow). One explode + one aggregate with numPerms min() columns. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, numPerms: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(shingles(col(textCol), k))).as("sh"))
      .withColumn("h", tokenHash(col("sh")))
    val mins = (0 until numPerms).map { i =>
      min((col("h") * lit(2L * i + 3) + lit(1L * i * i + 1)) % lit(HashMod))
        .as(s"mh$i")
    }
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH candidate pairs: signatures are split into `bands`
    * bands of numPerms/bands rows; docs sharing any band signature become
    * candidates. The band join is a shuffle on the band key — the classic
    * sub-quadratic near-dup plan for 100 TB corpora.
    *
    * Plan shape matters: signatures are persisted (computing them costs an
    * explode + wide aggregate; without the persist the band self-join
    * recomputes that subplan once per side — 8× at 4 bands) and all bands
    * come from ONE pass via a struct explode rather than a per-band union.
    * Output: distinct (id_a, id_b), id_a < id_b. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numPerms: Int = 12, bands: Int = 4): DataFrame = {
    require(numPerms % bands == 0, "numPerms must be divisible by bands")
    val rows = numPerms / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, numPerms).persist()
    val bandStructs = (0 until bands).map { b =>
      val sigCols = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      struct(lit(b).as("band"),
        concat_ws(",", sigCols.map(_.cast("string")): _*).as("sig"))
    }
    val banded = sigs.select(col("id"),
      explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** SimHash near-duplicate pairs within `maxHamming` bit flips, using the
    * band trick: split the fingerprint into maxHamming+1 chunks — any pair
    * within the radius must agree exactly on at least one chunk (pigeonhole)
    * — join per chunk, then verify the true Hamming distance. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val fp = TextFunctions.simhash(df, idCol, textCol, bits)
      .withColumnRenamed(idCol, "id")
    val chunks = maxHamming + 1
    val width = math.max(bits / chunks, 1)
    val chunked = (0 until chunks).map { c =>
      val lo = c * width
      val w = if (c == chunks - 1) bits - lo else width
      fp.select(col("id"), col("simhash"), lit(c).as("chunk"),
        expr(s"shiftright(simhash, $lo) & ${(1L << w) - 1}").as("key"))
    }.reduce(_ unionByName _)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-duplicates. Brute-force within-block pairs:
    * at scale pass a `blockCol` (e.g. an LSH bucket from
    * [[Similarity.hyperplaneBucket]]) so the quadratic join stays inside
    * blocks; with no block column the right side is broadcast and the left
    * streams partition-parallel (still O(n²) work — only for bounded n or
    * per-bucket verification). Norms are computed once per row; the dot
    * product is the native codegen'd expression.
    * Output: (id_a, id_b), cosine >= threshold. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCol: Option[String] = None): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"))
      .withColumn("nsq", vec_dot(col("v"), col("v")))
    val a = base.toDF("id_a", "va", "blk", "na").repartition(par)
    val b = base.toDF("id_b", "vb", "blk", "nb")
    val joined =
      if (blockCol.isDefined)
        a.join(b, Seq("blk")).where(col("id_a") < col("id_b"))
      else a.drop("blk").join(broadcast(b.drop("blk")),
        col("id_a") < col("id_b"))
    joined
      .withColumn("cos", {
        val denom = sqrt(col("na")) * sqrt(col("nb"))
        when(denom === 0.0, lit(0.0))
          .otherwise(vec_dot(col("va"), col("vb")) / denom)
      })
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
