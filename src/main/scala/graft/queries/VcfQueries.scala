package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.vcf.VcfReader
import graft.qc.{SampleQc, VariantQc}

/** VCF-domain operator queries (SURVEY §2.1/§2.3/§2.6) over the reference
  * repo's public test fixtures. These are not SQL-expressible for the
  * DuckDB oracle (custom parsing + UDFs), so the driver records rows-only
  * checks; exact semantics are covered by the ScalaTest differential
  * specs. The sfDir parameter is unused — inputs are VCF files.
  */
object VcfQueries {

  private val fixtures = "/root/reference/tests/fixtures"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+T1-T4: scan + multi-allelic decomposition + per-ALT INFO slicing
    "vcf_scan_decompose" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/multiallelic.vcf")
        .select($"chrom", $"pos", $"ref", $"alt", $"alt_idx", $"n_alts",
          $"info"("AF").as("af_sliced"), $"variant_type")
    },

    // T6: ANN worst-consequence annotation extraction
    "vcf_worst_consequence" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/snpeff/cancer.ann.vcf")
        .select($"chrom", $"pos", $"ref", $"alt", $"gene", $"impact",
          $"consequence", $"hgvs_c", $"hgvs_p", $"transcript")
        .filter($"gene".isNotNull)
    },

    // T5: vt normalization over an indel corpus
    "vcf_normalize" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/multiallelic.vcf",
        VcfReader.Options(normalize = true))
        .select($"chrom", $"pos", $"ref", $"alt", $"normalized",
          $"original_pos", $"original_ref", $"original_alt")
    },

    // T12-T14 + F3: genotype long table
    "vcf_genotypes" -> { (s, _) =>
      VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
    },

    // A1-A3: per-variant QC with HWE
    "vcf_variant_qc" -> { (s, _) =>
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      VariantQc.fromGenotypes(g)
    },

    // A4: per-sample QC
    "vcf_sample_qc" -> { (s, _) =>
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      SampleQc.compute(g, VariantQc.fromGenotypes(g))
    },

    // J9: de novo anti-join — child carries the alt, neither parent does
    "vcf_denovo_antijoin" -> { (s, _) =>
      import s.implicits._
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      val carriers = g
        .withColumn("_cls", VariantQc.genotypeClass($"gt", $"a1", $"a2"))
        .filter($"_cls".isin("het", "hom_alt"))
        .select($"chrom", $"pos", $"ref", $"alt_raw", $"sample_id")
      val key = Seq("chrom", "pos", "ref", "alt_raw")
      carriers.filter($"sample_id" === "HG002")
        .join(carriers.filter($"sample_id" === "HG003").select(key.map(col): _*),
          key, "left_anti")
        .join(carriers.filter($"sample_id" === "HG004").select(key.map(col): _*),
          key, "left_anti")
    },

    // S1 over bgzip: compressed scan end-to-end
    "vcf_gz_scan" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/gnomad_subset.vcf.gz")
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id", $"qual", $"variant_type")
    }
  )
}
