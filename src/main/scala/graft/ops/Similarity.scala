package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k via a block-nested-loop join —
  *    the baseline, O(|queries| · |corpus|). Fine when |queries| is small
  *    or the corpus fits a broadcast; the 100 TB path broadcasts the query
  *    set so the corpus is streamed exactly once, partition-parallel, with
  *    no shuffle of the corpus itself.
  *  - [[lshTopK]]: approximate top-k via deterministic random-hyperplane
  *    LSH — corpus and queries bucket by sign pattern, the join happens
  *    per bucket (sub-linear candidates), then exact cosine re-ranks.
  *
  * All vector math is `Column` expressions (zip_with/aggregate fuse into
  * codegen) — no UDFs, no driver-side loops.
  */
object Similarity {

  /** Dot product of two float-array columns in double precision,
    * accumulated in index order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(d / denom)
  }

  /** Exact cosine top-k: for every query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). The query side is
    * broadcast; ranking is a window per query id with deterministic
    * id tie-break. Output: (query_id, neighbor_id, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane component: plane `j`,
    * dimension `i` → integer in [-1000, 1000], derived from md5 so any
    * engine can reproduce it. */
  private def planeComponent(j: Int, i: Column): Column =
    TextFunctions.hash60(concat(lit(s"plane$j-"), i.cast("string")))
      .%(lit(2001L)) - lit(1000L)

  /** Sign-pattern LSH bucket id from `nPlanes` hyperplanes (table `table`,
    * so several independent hash tables can be built): bit j set when
    * dot(v, plane_{table,j}) >= 0. */
  def hyperplaneBucket(vec: Column, nPlanes: Int, table: Int = 0): Column =
    (0 until nPlanes).map { j =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) =>
            x.cast("double") * planeComponent(table * 1000 + j, i).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k via multi-table hyperplane LSH: `tables`
    * independent hash tables of `nPlanes` bits each; candidates share the
    * query's bucket in ANY table (union ∪ distinct), then exact cosine
    * re-ranks the candidates. More tables → higher recall, linearly more
    * candidate rows; each table's join is a bucket-key equi-join — no
    * cross join anywhere, so the plan scales with bucket occupancy, not
    * |corpus|·|queries|. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8, tables: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val candidates = (0 until tables).map { t =>
      c.withColumn("bkt", hyperplaneBucket(col("cv"), nPlanes, t))
        .join(broadcast(q.withColumn("bkt",
          hyperplaneBucket(col("qv"), nPlanes, t))), Seq("bkt"))
        .where(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
    }.reduce(_ unionByName _).distinct()
    val scored = candidates
      .join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `centroids` (id, vec) — search then probes only the closest cells.
    * Centroids are expected to be few (broadcast). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col(idCol).as("centroid_id"),
      col(vecCol).as("centv"))
    val w = Window.partitionBy(idCol).orderBy(col("cos").desc,
      col("centroid_id").asc)
    df.join(broadcast(cents))
      .withColumn("cos", cosine(col(vecCol), col("centv")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("centv", "cos", "rn")
  }
}
