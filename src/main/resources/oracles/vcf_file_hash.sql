SELECT '/root/reference/tests/fixtures/multiallelic.vcf' AS path,
  sha256(decode(content)) AS sha256
FROM read_blob('/root/reference/tests/fixtures/multiallelic.vcf')
