package graft.ops

import org.apache.spark.sql.functions._

class ClassifierSpec extends graft.SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good clean prose here", true),
    (2L, "good solid prose again", true),
    (3L, "spam junk garbage noise", false),
    (4L, "junk noise spam words", false),
    (5L, "good prose junk mixture", true)
  ).toDF("id", "text", "label")

  test("trainLogOdds: counts per class, add-k smoothing, minCount prune") {
    val m = Classifier.trainLogOdds(docs, "text", col("label"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("good") == ((3L, 0L, math.log(4.0 / 1.0))))
    assert(m("spam") == ((0L, 2L, math.log(1.0 / 3.0))))
    // mixture tokens count on both sides
    assert(m("junk")._1 == 1L && m("junk")._2 == 2L)
    val pruned = Classifier.trainLogOdds(docs, "text", col("label"),
      minCount = 2L).collect().map(_.getString(0)).toSet
    assert(!pruned.contains("here") && pruned.contains("good"))
  }

  test("priorFrame: empty labeled frame degrades to prior 0, not null") {
    val prior = Classifier.priorFrame(docs.where(col("id") < 0),
      col("label")).collect()
    assert(prior.length == 1 && !prior(0).isNullAt(0))
    assert(prior(0).getDouble(0) == 0.0) // ln((0+1)/(0+1))
  }

  test("naiveBayes: positive-token docs score high, prior-only for OOV") {
    val scored = Classifier.naiveBayes(docs, "id", "text", col("label"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(scored(1L)._3 && scored(2L)._3)       // clean docs predicted pos
    assert(!scored(3L)._3 && !scored(4L)._3)     // spam docs predicted neg
    assert(scored(1L)._1 == 4L)                  // token count
    // a fully out-of-vocabulary doc scores exactly the class prior
    val oov = Seq((9L, "zzz yyy xxx")).toDF("id", "text")
    val s = Classifier.naiveBayesScore(oov, "id", "text",
      docs, "text", col("label")).head()
    val prior = math.log(4.0 / 3.0)              // (3+1)/(2+1)
    assert(math.abs(s.getDouble(2) - prior) < 1e-9)
  }

  test("scoring plan: token equi-join + hash agg, no cartesian on data") {
    val plan = Classifier.naiveBayes(docs, "id", "text", col("label"))
      .queryExecution.executedPlan.toString
    // the only nested-loop join is the 1-row broadcast prior
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashAggregate"))
  }
}
