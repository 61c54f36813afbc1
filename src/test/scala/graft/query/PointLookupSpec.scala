package graft.query

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PointLookupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (store, rsidIdx) = {
    val base = Files.createTempDirectory("ptlookup").toString
    val vcf = s"$base/v.vcf"
    graft.vcf.SyntheticVcf.write(vcf, 5000, seed = 7L)
    val v = graft.ingest.VariantMatching.withVariantId(
      graft.vcf.VcfReader.variants(spark, vcf))
    graft.sinks.Writers.writeVariants(v, s"$base/variants")
    graft.sinks.Writers.writeRsidIndex(
      spark.read.parquet(s"$base/variants"), s"$base/rsid_idx")
    (s"$base/variants", s"$base/rsid_idx")
  }

  test("byPosition returns exactly the Spark filter's rows, no Spark job") {
    val df = spark.read.parquet(store)
    val probes = df.select($"chrom", $"pos").distinct()
      .orderBy($"chrom", $"pos").limit(50).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(probes.nonEmpty)
    probes.foreach { case (chrom, pos) =>
      val direct = PointLookup.byPosition(spark, store, chrom, pos)
      val viaSpark = df.filter($"chrom" === chrom && $"pos" === pos).collect()
      assert(direct.length == viaSpark.length,
        s"count mismatch at $chrom:$pos — direct=${direct.length} spark=${viaSpark.length}")
      // field-level parity on the scalar identity columns
      val dKeys = direct.map(m => (m("ref"), m("alt"))).sorted
      val sKeys = viaSpark.map(r =>
        (r.getAs[String]("ref"), r.getAs[String]("alt"))).toSeq.sorted
      assert(dKeys == sKeys, s"rows differ at $chrom:$pos")
    }
  }

  test("byPosition on absent keys and absent partitions returns empty") {
    assert(PointLookup.byPosition(spark, store, "chr1", 1L).isEmpty)
    assert(PointLookup.byPosition(spark, store, "chrNO", 1L).isEmpty)
  }

  test("byRsid goes through the secondary projection and matches Spark") {
    val df = spark.read.parquet(store)
    val someRs = df.filter($"rs_id".isNotNull).select($"rs_id")
      .orderBy($"rs_id").limit(20).collect().map(_.getString(0))
    assert(someRs.nonEmpty)
    someRs.foreach { rs =>
      val direct = PointLookup.byRsid(spark, rsidIdx, store, rs)
      val n = df.filter($"rs_id" === rs).count()
      assert(direct.length == n, s"rsid $rs: direct=${direct.length} spark=$n")
      assert(direct.forall(_("rs_id") == rs))
    }
    assert(PointLookup.byRsid(spark, rsidIdx, store, "rs0").isEmpty)
  }

  test("byRegion returns exactly the Spark range filter's rows, pos-ordered") {
    val df = spark.read.parquet(store)
    val bounds = df.filter($"chrom" === "chr1")
      .agg(min($"pos"), max($"pos")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // a window covering ~a third of chr1, plus edge and empty windows
    val mid = lo + (hi - lo) / 3
    Seq((lo, mid), (lo, lo), (hi + 1, hi + 100), (lo, hi)).foreach {
      case (a, b) =>
        val direct = PointLookup.byRegion(spark, store, "chr1", a, b)
        val viaSpark = df.filter($"chrom" === "chr1" && $"pos".between(a, b))
        assert(direct.length == viaSpark.count(), s"range [$a,$b]")
        // pos-sorted store ⇒ results come back in position order
        val ps = direct.map(_("pos").toLong)
        assert(ps == ps.sorted, s"range [$a,$b] not pos-ordered")
    }
  }

  test("byRegion keeps pos order across a multi-file chrom directory") {
    // the range-partitioned layout's whole point is several pos-disjoint
    // files per chrom dir; cross-file result order must not depend on
    // listStatus order (not contractual on any filesystem). Shrink the
    // AQE size floors so test-scale data fans out to multiple files.
    val base = Files.createTempDirectory("multifile").toString
    val vcf = s"$base/v.vcf"
    graft.vcf.SyntheticVcf.write(vcf, 20000, seed = 41L)
    val sized = Map(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16384",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")
    val prev = sized.keys.map(k => k -> spark.conf.getOption(k)).toMap
    sized.foreach { case (k, v) => spark.conf.set(k, v) }
    try graft.sinks.Writers.writeVariants(
      graft.vcf.VcfReader.variants(spark, vcf), s"$base/variants")
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val nFiles = new java.io.File(s"$base/variants/chrom=chr1").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles > 1, s"need a multi-file chrom dir, got $nFiles file(s)")
    val df = spark.read.parquet(s"$base/variants")
    val bounds = df.filter($"chrom" === "chr1").agg(min($"pos"), max($"pos")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // the full-span window necessarily crosses every file in the dir
    val rows = PointLookup.byRegion(spark, s"$base/variants", "chr1", lo, hi)
    assert(rows.length == df.filter($"chrom" === "chr1").count())
    val ps = rows.map(_("pos").toLong)
    assert(ps == ps.sorted, "cross-file results not pos-ordered")
  }

  test("a stale cached listing with dead file paths relists instead of failing") {
    // coarse directory-mtime granularity (or synthetic object-store
    // mtimes) can leave the listing cache holding paths a swap deleted;
    // the reader must invalidate + relist once, not throw. Simulate by
    // pinning the directory mtime across a rewrite.
    val base = Files.createTempDirectory("stalelist").toString
    val v1 = Seq(("chr1", 100L, "A", "G"), ("chr1", 200L, "C", "T"))
      .toDF("chrom", "pos", "ref", "alt")
    graft.sinks.Writers.writeVariants(v1, s"$base/variants")
    val dir = new java.io.File(s"$base/variants/chrom=chr1")
    assert(PointLookup.byPosition(spark, s"$base/variants", "chr1", 100L).nonEmpty)
    val mtime = dir.lastModified()
    // rewrite: new part files (new names), old paths now dead
    val v2 = Seq(("chr1", 100L, "A", "G"), ("chr1", 300L, "G", "A"))
      .toDF("chrom", "pos", "ref", "alt")
    graft.sinks.Writers.writeVariants(v2, s"$base/variants")
    assert(dir.setLastModified(mtime)) // cached listing now LOOKS fresh
    // path 1 — all-pruned staleness: pos=300 is OUTSIDE the dead files'
    // cached footer range [100,200], so every dead file prunes and no
    // open ever throws; the empty-result existence check must detect the
    // dead path and relist rather than silently answering "no rows"
    val rows = PointLookup.byPosition(spark, s"$base/variants", "chr1", 300L)
    assert(rows.nonEmpty, "all-pruned stale listing served a silent empty")
    assert(rows.head("pos") == "300")
    // path 2 — open-throws staleness: make the listing stale again, then
    // probe a key the dead footers ADMIT, so the open hits the missing
    // path and the FileNotFoundException retry recovers
    val mtime2 = dir.lastModified()
    val v3 = Seq(("chr1", 100L, "A", "G"), ("chr1", 400L, "T", "A"))
      .toDF("chrom", "pos", "ref", "alt")
    graft.sinks.Writers.writeVariants(v3, s"$base/variants")
    assert(dir.setLastModified(mtime2))
    val rows2 = PointLookup.byPosition(spark, s"$base/variants", "chr1", 100L)
    assert(rows2.nonEmpty, "stale listing was not recovered by a relist")
    assert(rows2.head("pos") == "100")
  }

  test("byRsid falls back to two probes over a legacy slim index") {
    val base = Files.createTempDirectory("slimidx").toString
    val df = spark.read.parquet(store)
    // the pre-covering layout: 6 join-back columns only
    df.filter($"rs_id".isNotNull)
      .select($"rs_id", $"chrom", $"pos", $"ref", $"alt", $"variant_id")
      .repartitionByRange($"rs_id")
      .sortWithinPartitions($"rs_id")
      .write.parquet(s"$base/rsid_idx")
    val someRs = df.filter($"rs_id".isNotNull).select($"rs_id")
      .orderBy($"rs_id").limit(5).collect().map(_.getString(0))
    someRs.foreach { rs =>
      val direct = PointLookup.byRsid(spark, s"$base/rsid_idx", store, rs)
      assert(direct.length == df.filter($"rs_id" === rs).count())
      // the fallback serves FULL rows from the main store, not index rows
      assert(direct.forall(_.contains("variant_type")))
    }
  }

  test("byGene serves from the covering gene projection alone") {
    val base = Files.createTempDirectory("geneidx").toString
    val vcf = s"$base/ann.vcf"
    graft.vcf.SyntheticVcf.write(vcf, 5000, seed = 13L, annFrac = 0.5)
    val v = graft.ingest.VariantMatching.withVariantId(
      graft.vcf.VcfReader.variants(spark, vcf))
    graft.sinks.Writers.writeVariants(v, s"$base/variants")
    graft.sinks.Writers.writeGeneIndex(
      spark.read.parquet(s"$base/variants"), s"$base/gene_idx")
    val df = spark.read.parquet(s"$base/variants")
    val genes = df.filter($"gene".isNotNull).select($"gene")
      .distinct().orderBy($"gene").limit(20).collect().map(_.getString(0))
    assert(genes.nonEmpty)
    genes.foreach { g =>
      val direct = PointLookup.byGene(spark, s"$base/gene_idx", g)
      val viaSpark = df.filter($"gene" === g)
        .select($"chrom", $"pos", $"ref", $"alt", $"impact").collect()
      assert(direct.length == viaSpark.length,
        s"gene $g: direct=${direct.length} spark=${viaSpark.length}")
      val dKeys = direct.map(m =>
        (m("chrom"), m("pos").toLong, m("ref"), m("alt"), m.getOrElse("impact", ""))).sorted
      val sKeys = viaSpark.map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3),
        Option(r.getString(4)).getOrElse(""))).toSeq.sorted
      assert(dKeys == sKeys, s"rows differ for gene $g")
    }
    assert(PointLookup.byGene(spark, s"$base/gene_idx", "NO_SUCH_GENE").isEmpty)
  }

  test("nested columns render: info map entries and filter arrays surface") {
    val df = spark.read.parquet(store)
    val probe = df.filter(element_at($"info", "DP").isNotNull)
      .select($"chrom", $"pos").head()
    val rows = PointLookup.byPosition(spark, store,
      probe.getString(0), probe.getLong(1))
    assert(rows.nonEmpty)
    assert(rows.head.get("info").exists(_.contains("DP=")))
  }
}
