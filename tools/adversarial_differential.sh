#!/bin/bash
# Adversarial-unicode END-TO-END differential gate (r18).
#
# tools/casing_parity_probe.py pins the oracle EXPRESSIONS against
# Java-equivalent semantics, but only for divergence classes someone
# has already found. This gate closes the discovery loop: it rebuilds
# documents.parquet as a seeded adversarial-unicode corpus
# (tools/adversarial_corpus.py — İ/Σ/VT, NBSP/Zs spaces, emoji,
# supplementary plane, RTL + bidi controls, combining marks,
# empty/whitespace-only/NULL texts, kilotoken docs), runs graft.Verify
# over it, and replays ALL 84 oracle queries in DuckDB on the same
# corpus. Any engine<->oracle divergence in ANY text-stack operator —
# tokenization, quality, langId, fingerprint, jaccard,
# minhash/simhash/LSH chains, cluster/keep, media hashing — fails the
# compare instead of waiting for real-world text to find it.
#
# First run (r18) found four real classes on a corpus every shared-data
# round had silently passed: legacy size(NULL)=-1 leaking into token
# counts, empty-document shingle {""} forming a quadratic near-dup
# bucket across minhash/simhash/jaccard, DuckDB 1-arg trim stripping
# Unicode Zs (class #4), and NULL-payload media rows hashing like
# 0-byte payloads. The embeddings side (zero/NaN/Inf/NULL vectors)
# then forced the explicit similarity domain: Spark ranks NaN ABOVE
# every finite cosine while DuckDB's list_cosine_similarity hard-errors
# — every similarity operator now filters to finite positive-norm
# vectors at entry, mirrored by the oracles' dom CTE.
#
# Usage: tools/adversarial_differential.sh <round> [seed]
# (seed defaults to 18; the r18 fixes were confirmed seed-independent
# with an 18/19/42 sweep — 84/84 at each)
set -u
round="${1:?usage: tools/adversarial_differential.sh <round> [seed]}"
seed="${2:-18}"
cd "$(dirname "$0")/.."
corpus=$(mktemp -d /tmp/graft_adv_sf.XXXXXX)
out=$(mktemp -d /tmp/graft_adv_verify.XXXXXX)
trap 'rm -rf "$corpus" "$out"' EXIT
start=$(date +%s)
python3 tools/adversarial_corpus.py "$corpus" --seed "$seed" || exit 2
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $corpus $out" \
  > /tmp/graft_adv_verify_r${round}.log 2>&1
vrc=$?
compare=$(python3 tools/check_correctness.py "$out" "$corpus" 2>&1)
crc=$?
wall=$(( $(date +%s) - start ))
{
  echo "# ADVERSARIAL_r${round} — engine vs DuckDB oracles on the adversarial-unicode corpus"
  echo "date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "commit: $(git rev-parse HEAD)"
  echo "verify_rc: ${vrc}  compare_rc: ${crc}  wall_seconds: ${wall}"
  echo "corpus: tools/adversarial_corpus.py --seed ${seed} (500 docs, 2 NULL texts,"
  echo "  chain window doc_id<200 carries the near-dup clusters + nasty singles;"
  echo "  500 embeddings incl. zero/NaN/Inf/NULL/1e30/1e-30 vectors, a zero-vector"
  echo "  QUERY at vec_id 2, and duplicate/opposite/scaled-parallel structure)"
  echo
  echo "$compare" | tail -20
} > "ADVERSARIAL_r${round}.txt"
cat "ADVERSARIAL_r${round}.txt"
[ $vrc -ne 0 ] && exit $vrc
exit $crc
