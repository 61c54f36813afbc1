package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the interpreted HOF fold bit-for-bit") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(200)
    val hof = aggregate(
      zip_with($"embedding", $"embedding",
        (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val diff = e.select(
      (VectorExpressions.vecDot($"embedding", $"embedding") - hof).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0, s"max |native - hof| = $diff")
  }

  test("mixed float/double arrays and SQL registration") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d")
      .head().getDouble(0)
    assert(math.abs(r - 11.0) < 1e-12)
    // null-safe: null array → null result
    val n = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS d").head()
    assert(n.isNullAt(0))
    // dimension mismatch → null (matching the HOF twin's null-padded
    // fold), never a silently truncated partial dot product
    val m = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F)) AS d").head()
    assert(m.isNullAt(0), "mismatched dims must yield NULL, not a partial sum")
  }

  test("codegen path executes (no fallback errors) on a join-shaped plan") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(50)
    val topk = graft.pipeline.Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0), 5)
    assert(topk.count() == 5)
  }
}

class SimHashExpressionSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("native SimHash64 expression matches the UDF twin bit-for-bit") {
    val docs = Seq(
      "the quick brown fox", "the quick brown fox", "completely different",
      "", "single"
    ).toDF("text")
    val toks = graft.pipeline.TextAnalysis.tokens($"text")
    val rows = docs.select(
      $"text",
      graft.functions.SimHashExpression.simhash64(toks).as("native"),
      graft.pipeline.Dedup.simhashUdf(toks).as("udf")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"null-ness diverged for ${r.getString(0)}")
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2))
    }
    // r18: a token-less document has NO signature — both twins NULL
    // (the old constant 0L co-bucketed every empty doc at hamming 0)
    assert(rows.find(_.getString(0) == "").exists(_.isNullAt(1)))
  }

  test("SimHash64 is SQL-registered and codegen survives wholestage") {
    graft.functions.SimHashExpression.register(spark)
    Seq("a b c").toDF("text").createOrReplaceTempView("sh_t")
    val v = spark.sql(
      "SELECT simhash64(filter(split(text, '\\s+'), t -> t != '')) AS s FROM sh_t")
      .head().getLong(0)
    assert(v != 0L)
  }
}
