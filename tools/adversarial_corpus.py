#!/usr/bin/env python3
"""Adversarial-unicode differential corpus for the full engine↔oracle gate.

The r17 casing hunt proved the shared corpus is too polite: three
engine↔oracle divergence classes (full-vs-simple LOWER, Final_Sigma,
Java-\\s vertical tab) sat invisible for sixteen rounds because the
testdata contains no İ, Σ, or VT. tools/casing_parity_probe.py pins the
EXPRESSIONS, but only for the classes we already know about. This tool
closes the discovery gap: it rebuilds documents.parquet as a seeded
adversarial-unicode corpus — dotted İ, capital/final/pre-lowered sigma,
vertical tabs and every Java \\s member, emoji + supplementary-plane
letters, RTL text with bidi controls, combining marks, case-ignorables,
NBSP/NEL/U+2028 (NOT \\s in either engine), title-case digraphs, ß/ẞ,
empty/whitespace-only/NULL texts, kilotoken documents — symlinks the
other nine tables from an existing sf dir, and leaves a directory on
which graft.Verify + tools/check_correctness.py run the ENTIRE 84-key
gate. Any engine↔oracle divergence class in ANY text operator (quality,
langId, fingerprint, n-gram jaccard, minhash/simhash/LSH chains,
cluster/keep) surfaces as a hash mismatch here instead of waiting for
real-world text to find it.

Usage:
  python3 tools/adversarial_corpus.py <out_dir> [--base /root/testdata/sf0.001] [--seed 18]
then:
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <out_dir> <verify_out>"
  python3 tools/check_correctness.py <verify_out> <out_dir>
(tools/adversarial_differential.sh runs the whole chain.)
"""
import argparse
import random
from pathlib import Path

import pandas as pd

# Word pools: heavy in stopwords from the 11 langId families so votes,
# margins and tie-breaks are exercised, not just script detection.
EN = "the quick brown fox jumps over a lazy dog and that is for on with".split()
DE = "der die das und oder von zu ist sind für auf mit ein eine schnelle".split()
FR = "le la les et ou de du est sont il que ce pour sur avec un une vite".split()
TR = ["ve", "bir", "bu", "çok", "için", "ile", "ama", "gibi", "sonra",
      "İçin", "İle", "İstanbul", "İZMİR", "değil"]
EL = ["ΟΔΟΣ", "ΚΑΙ", "ΣΑ", "ΜΕΓΑΣ", "Σ", "ΟΣΣ", "οδος", "οδοσ", "ς",
      "σοφία", "Α'Σ", "ΟΣ:", "ΟΣ.", "ΑΣ̈", "ΑΣ᾿"]
RU = "и в не на я быть он с что это".split()
AR = "في من على أن هذا إلى كان لا ما هو".split()
ZH = list("的一是不了人我在有他这中大来上国")
JA = list("のにはをたがでてとしれさある")
KO = "이 그 저 것 수 들 및 에서 하다 있다".split()
NASTY_TOKENS = [
    "İ", "ß", "ẞ", "Ǆ", "ǅ", "ǆ", "ﬁﬂ",            # casing oddballs
    "𝕏𝖞", "😀🎉", "👩‍👩‍👧‍👦", "𐍈𐍉",                    # supplementary plane / ZWJ
    "עִבְרִית", "‏العربية‎",                 # RTL + bidi controls (Cf)
    "étude", "ño", "́̇",       # combining marks, lone marks
    "a b", "x y", "pq", "o m",  # NOT \s in either engine
    "don’t", "l'idée", "a.b.c", "x·y", "ΟΣ״",   # case-ignorable punctuation
    "word" * 1250,                                   # 5000-char token
]
WS = [" ", "\t", "\x0b", "\n", "\r", "\x0c", "  ", " \x0b "]
LANGS = ["en", "de", "fr", "es", "pt", "it", "nl", "sv", "pl", "tr",
         "ro", "ru", "ar", "zh", "ja", "ko", "unknown"]


def sentence(rng, pool, n, ws_prob=0.15):
    """Join n tokens from pool with adversarial whitespace sometimes."""
    toks = [rng.choice(pool) for _ in range(n)]
    out = []
    for i, t in enumerate(toks):
        out.append(t)
        if i < n - 1:
            out.append(rng.choice(WS) if rng.random() < ws_prob else " ")
    return "".join(out)


def near_dup(rng, text):
    """A near-duplicate: one token swapped, or a whitespace/casing twist."""
    kind = rng.randrange(4)
    if kind == 0:
        parts = text.split(" ")
        if len(parts) > 2:
            parts[rng.randrange(len(parts))] = rng.choice(EN + TR + EL)
        return " ".join(parts)
    if kind == 1:
        return text.replace(" ", "\x0b", 1)          # VT-for-space
    if kind == 2:
        return text.replace("i", "İ", 1)             # dotted-İ casing twist
    return text + " " + rng.choice(EL)               # sigma tail


def build_texts(seed):
    rng = random.Random(seed)
    texts = []
    # ids 0..199 feed the dedup/minhash/simhash/jaccard chains: clusters
    # of adversarial near-dups plus nasty singles.
    pools = [EN, DE, FR, TR, EL, EN + TR + EL + NASTY_TOKENS]
    i = 0
    while i < 170:
        base = sentence(rng, rng.choice(pools), rng.randint(4, 40))
        k = rng.randint(1, 4)                        # cluster size 1..4
        texts.append(base)
        for _ in range(min(k - 1, 170 - len(texts))):
            texts.append(near_dup(rng, base))
        i = len(texts)
    singles = [
        "", " ", "\x0b", "\t\n \x0b\x0c\r", " ", " ",
        "İ", "Σ", "ς", "σ", "ΟΔΟΣ ΚΑΙ ΣΑ", "οδοσ οδος ς σ xσ",
        "Α'Σ κάτι", "ΟΔΟΣ’ και", "的Σ ΟΣ的", "ⅠΣ ªΣ ⓐΣ!",
        "İçin İle bu çok güzel", "a\x0bΟΣ\x0bΟΣ",
        "😀 " * 30, "𝕏 " * 25, sentence(random.Random(seed + 1), ZH, 60, 0),
        " ".join(NASTY_TOKENS),
        sentence(random.Random(seed + 2), EN, 1000),  # kilotoken doc
        None, "",                                     # NULL + empty in-chain
    ]
    head = 200 - len(singles)
    while len(texts) < head:                         # pad the chain window
        texts.append(sentence(rng, rng.choice(pools), rng.randint(4, 40)))
    texts = texts[:head] + singles
    assert len(texts) == 200
    # ids 200..499: scripts + mixed prose for p01/p02/p03/p09/p10 breadth
    script_pools = [RU, AR, ZH, JA, KO, EN, DE, FR, TR, EL]
    for j in range(295):
        pool = script_pools[j % len(script_pools)]
        texts.append(sentence(rng, pool, rng.randint(3, 80)))
    texts += [None, "", " \x0b ", "Σ", "İstanbul"]    # tail nasties
    assert len(texts) == 500
    return texts


def build_embeddings(seed, n=500, dim=64):
    """Adversarial embeddings: mostly well-behaved seeded vectors, plus
    the degenerate rows a 100 TB corpus actually contains — zero
    vectors (no direction), NaN/Inf components (failed encoder
    batches), magnitude extremes, exact/opposite/scaled duplicates,
    and a NULL vector. vec_id 2 sits in the p06/p13/p14 QUERY window
    so a degenerate query is exercised, not just degenerate corpus
    rows."""
    rng = random.Random(seed + 7)
    def vec():
        return [rng.gauss(0.0, 0.125) for _ in range(dim)]
    vecs = [vec() for _ in range(n)]
    vecs[2] = [0.0] * dim                        # zero-vector QUERY
    # duplicate structure among normal ids for near-dup signal
    vecs[30] = list(vecs[10])                    # exact dup
    vecs[31] = [-x for x in vecs[10]]            # opposite (cos -1)
    vecs[32] = [x * 1e-20 for x in vecs[10]]     # same direction, tiny norm
    vecs[33] = [x + rng.gauss(0, 1e-4) for x in vecs[10]]  # near dup
    nasty = {
        480: [0.0] * dim,                        # zero vector
        481: [0.0] * dim,                        # second zero (pairable?)
        482: vecs[482][:1] + [float("nan")] + vecs[482][2:],
        483: [float("nan")] * dim,
        484: vecs[484][:5] + [float("inf")] + vecs[484][6:],
        485: vecs[485][:5] + [float("-inf")] + vecs[485][6:],
        486: [1e30] * dim,                       # norm overflows double dot
        487: [1e-30] * dim,                      # denormal-range norm
        488: list(vecs[10]),                     # far-id exact dup
        489: [0.5] * dim,
        490: None,                               # NULL embedding row
    }
    for i, v in nasty.items():
        vecs[i] = v
    return vecs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--seed", type=int, default=18)
    args = ap.parse_args()
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    base = Path(args.base)
    for p in base.glob("*.parquet"):
        if p.stem in ("documents", "embeddings"):
            continue
        dst = out / p.name
        if not dst.exists():
            dst.symlink_to(p)
    import pyarrow as pa
    import pyarrow.parquet as pq
    vecs = build_embeddings(args.seed)
    erng = random.Random(args.seed + 9)
    etab = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(
            [None if v is None else [float(x) for x in v] for v in vecs],
            pa.list_(pa.float32())),
        "label": pa.array([erng.randrange(8) for _ in vecs], pa.int32()),
    })
    pq.write_table(etab, out / "embeddings.parquet")
    texts = build_texts(args.seed)
    rng = random.Random(args.seed + 3)
    df = pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": [rng.choice(LANGS) for _ in texts],
        "source": [f"src{rng.randrange(4)}" for _ in texts],
        "n_chars": [len(t) if t is not None else None for t in texts],
    })
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("Int64")
    df.to_parquet(out / "documents.parquet", index=False)
    n_null = sum(t is None for t in texts)
    print(f"wrote {len(texts)} docs ({n_null} NULL texts) and "
          f"{len(vecs)} embeddings (zero/NaN/Inf/NULL rows included) to "
          f"{out}; {args.base} tables symlinked")


if __name__ == "__main__":
    main()
