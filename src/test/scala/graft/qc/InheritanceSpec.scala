package graft.qc

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trio inheritance patterns over a synthesized trio mirroring the
  * reference's acceptance fixture: a de novo site, an autosomal-recessive
  * site (child hom_alt, parents het), and a compound-het gene pair with
  * one variant from each parent. */
class InheritanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trioVcf: String = {
    val f = Files.createTempFile("trio", ".vcf")
    Files.writeString(f,
      """##fileformat=VCFv4.2
        |##INFO=<ID=SYMBOL,Number=1,Type=String,Description="gene">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	CHILD	FATHER	MOTHER
        |chr1	1000	.	A	G	50	PASS	SYMBOL=GENE0	GT	0/1	0/0	0/0
        |chr2	2000	.	C	T	50	PASS	SYMBOL=GENE2	GT	1/1	0/1	0/1
        |chr3	3000	.	G	A	50	PASS	SYMBOL=GENE1	GT	0/1	0/1	0/0
        |chr3	3100	.	T	C	50	PASS	SYMBOL=GENE1	GT	0/1	0/0	0/1
        |chr4	4000	.	A	C	50	PASS	SYMBOL=GENE3	GT	0/1	0/1	0/0
        |""".stripMargin)
    f.toString
  }

  private lazy val genotypes = graft.vcf.VcfReader.genotypes(spark, trioVcf).cache()
  private lazy val variants = graft.vcf.VcfReader.variants(spark, trioVcf).cache()

  test("de novo: only the chr1 site qualifies") {
    val dn = Inheritance.deNovo(genotypes, "CHILD", "FATHER", "MOTHER").collect()
    assert(dn.length == 1)
    assert(dn(0).getAs[Long]("pos") == 1000L)
  }

  test("autosomal recessive: child hom_alt with both parents het") {
    val ar = Inheritance.autosomalRecessive(genotypes, "CHILD", "FATHER", "MOTHER")
      .collect()
    assert(ar.length == 1)
    assert(ar(0).getAs[String]("chrom") == "chr2")
    assert(ar(0).getAs[Long]("pos") == 2000L)
  }

  test("compound het joins genes on the full (chrom,pos,ref,alt) key — " +
    "multi-ALT sites keep per-ALT gene attribution") {
    // chr5:5000 A→G carries GENE5, A→T carries GENE6 (per-ALT CSQ); the
    // child is het only for G. With a (chrom,pos,ref)-keyed gene join the
    // site nondeterministically attributed GENE6 and the pair vanished.
    val f = Files.createTempFile("trio_ma", ".vcf")
    Files.writeString(f,
      """##fileformat=VCFv4.2
        |##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations from Ensembl VEP. Format: Allele|SYMBOL|IMPACT">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	CHILD	FATHER	MOTHER
        |chr5	5000	.	A	G,T	50	PASS	CSQ=G|GENE5|MODERATE,T|GENE6|MODERATE	GT	0/1	0/1	0/0
        |chr5	5100	.	C	T	50	PASS	CSQ=T|GENE5|MODERATE	GT	0/1	0/0	0/1
        |""".stripMargin)
    val g = graft.vcf.VcfReader.genotypes(spark, f.toString)
    val v = graft.vcf.VcfReader.variants(spark, f.toString)
    val ch = Inheritance.compoundHet(g, v, "CHILD", "FATHER", "MOTHER").cache()
    assert(ch.select($"gene").distinct().collect().map(_.getString(0)).toSet
      == Set("GENE5"))
    val byPos = ch.collect().map(r =>
      r.getAs[Long]("pos") -> (r.getAs[Boolean]("from_father"), r.getAs[Boolean]("from_mother"))).toMap
    assert(byPos(5000L) == (true, false))
    assert(byPos(5100L) == (false, true))
  }

  test("compound het: GENE1 pair with one variant from each parent") {
    val ch = Inheritance.compoundHet(genotypes, variants, "CHILD", "FATHER", "MOTHER")
      .cache()
    val genes = ch.select($"gene").distinct().collect().map(_.getString(0)).toSet
    assert(genes == Set("GENE1")) // GENE3 has only one variant; GENE0 de novo
    assert(ch.count() == 2)
    val byPos = ch.collect().map(r =>
      r.getAs[Long]("pos") -> (r.getAs[Boolean]("from_father"), r.getAs[Boolean]("from_mother"))).toMap
    assert(byPos(3000L) == (true, false))
    assert(byPos(3100L) == (false, true))
  }
}
