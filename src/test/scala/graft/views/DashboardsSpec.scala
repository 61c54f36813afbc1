package graft.views

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DashboardsSpec extends SparkSpec {
  import spark.implicits._

  test("genotype stats + constraint validators") {
    val g = graft.vcf.VcfReader.genotypes(spark, fixture("with_annotations.vcf"))
    val stats = Dashboards.genotypeStats(g).head()
    assert(stats.getAs[Long]("n_genotypes") == 12)
    assert(stats.getAs[Long]("n_samples") == 3)
    assert(stats.getAs[Long]("n_variants") == 4) // reference unique_variants
    assert(stats.getAs[Long]("n_called") == 12)
    assert(Dashboards.dosageViolations(g).count() == 0)
  }

  test("constraint validators cover the reference's full CHECK list") {
    import org.apache.spark.sql.functions.lit
    val v = graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf"))
      .withColumn("call_rate", lit(0.99)).withColumn("maf", lit(0.1))
      .withColumn("hwe_p", lit(0.5)).withColumn("aaf", lit(0.3))
      .withColumn("mac", lit(4)).withColumn("n_het", lit(2))
      .withColumn("n_hom_ref", lit(1)).withColumn("n_hom_alt", lit(1))
      .withColumn("imputation_r2", lit(0.9))
    assert(Dashboards.constraintViolations(v).count() == 0)
    val bad = v.withColumn("aaf", lit(1.2)).withColumn("mac", lit(-1))
      .withColumn("n_het", lit(-3)).withColumn("imputation_r2", lit(2.0))
    val byName = Dashboards.constraintViolations(bad)
      .groupBy($"constraint").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = v.count()
    assert(byName.get("aaf_range").contains(n))
    assert(byName.get("mac_nonneg").contains(n))
    assert(byName.get("n_het_nonneg").contains(n))
    assert(byName.get("imputation_r2_range").contains(n))
    assert(!byName.contains("maf_range"))
  }

  test("partition stats and variant constraint checks") {
    val v = graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf"))
      .withColumn("call_rate", lit(0.99))
      .withColumn("maf", lit(0.1))
      .withColumn("hwe_p", lit(0.5))
    val ps = Dashboards.partitionStats(v).collect()
    assert(ps.map(_.getAs[String]("chrom")).toSet == Set("chr1", "chr10"))
    assert(Dashboards.constraintViolations(v).count() == 0)
    val bad = v.withColumn("maf", lit(0.7))
    assert(Dashboards.constraintViolations(bad)
      .filter($"constraint" === "maf_range").count() == v.count())
  }

  test("pgs score listing join") {
    val scores = Seq(("PGS000001", "T2D")).toDF("pgs_id", "trait")
    val weights = Seq(("PGS000001", 0.1, Some(1L)), ("PGS000001", 0.2, None))
      .toDF("pgs_id", "effect_weight", "variant_id")
    val r = Dashboards.pgsScoreListing(scores, weights).head()
    assert(r.getAs[Long]("n_weights") == 2)
    assert(r.getAs[Long]("n_matched") == 1)
  }
}

class GraftConfigSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("TOML-subset parse with sections, quotes, comments") {
    val cfg = graft.config.GraftConfig.parse(Seq(
      "# comment",
      "top = 1",
      "[database]",
      "url = \"jdbc:x\"  # trailing comment",
      "batch_size = 10000",
      "[load]",
      "normalize = true",
      "min_info_score = 0.6"))
    assert(cfg.getInt("top").contains(1))
    assert(cfg.get("database.url").contains("jdbc:x"))
    assert(cfg.getInt("database.batch_size").contains(10000))
    assert(cfg.getBoolean("load.normalize").contains(true))
    assert(cfg.getDouble("load.min_info_score").contains(0.6))
  }
}
