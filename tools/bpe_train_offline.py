#!/usr/bin/env python3
"""Offline, independent BPE trainer — produces the frozen fixture in
graft.ext.text.TextAnalysis.BpeFixtureMerges500.

Procedure (must stay in lockstep with TextAnalysis.bpeTrainOnVocab, which
the spec cross-checks against this artifact): textbook Sennrich-2016 BPE
over a word-frequency table — each step merges the corpus-frequency-
maximal adjacent symbol pair (all occurrences, left-to-right
non-overlapping), lexicographic (left, right) tie-break.

The word stream is the AUGMENTED one the x_text_bpe gate tokenizes:
whitespace words of documents.text plus every adjacent-word
concatenation (w[i] || w[i+1]). The raw corpus has only 31 distinct
words — exhaustion at 89 merges — so the augmentation is what makes a
realism-sized vocabulary trainable (962 distinct augmented words,
exhaustion at 1045; we freeze the first 500).

Usage: python3 tools/bpe_train_offline.py /root/testdata/sf0.1 500
Prints the Scala Seq literal to paste into BpeFixture500.scala.
"""
import sys
import collections
import duckdb

sf_dir, n_merges = sys.argv[1], int(sys.argv[2])
con = duckdb.connect()
rows = con.execute(f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS a
  FROM '{sf_dir}/documents.parquet'
  WHERE text IS NOT NULL AND trim(text) <> ''),
aug AS (
  SELECT unnest(a) AS w FROM t
  UNION ALL
  SELECT unnest(list_transform(range(1, len(a)), i -> a[i] || a[i+1])) AS w
  FROM t)
SELECT w, count(*) AS freq FROM aug WHERE w <> '' GROUP BY w
""").fetchall()

vocab = {tuple(w): f for w, f in rows}
merges = []
while len(merges) < n_merges:
    pc = collections.Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += f
    if not pc:
        break
    m = max(pc.values())
    best = sorted(p for p, c in pc.items() if c == m)[0]
    merges.append(best)
    new = {}
    for syms, f in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        new[tuple(out)] = new.get(tuple(out), 0) + f
    vocab = new

print(f"// {len(merges)} merges")
line = "  "
for l, r in merges:
    tok = f'"{l}" -> "{r}", '
    if len(line) + len(tok) > 78:
        print(line.rstrip())
        line = "  "
    line += tok
print(line.rstrip().rstrip(","))
