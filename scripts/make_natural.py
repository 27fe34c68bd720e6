#!/usr/bin/env python3
"""Generate NATURAL-vocabulary document corpora for the near-dup scale-curve
check (SURVEY §11.1; test tooling only — the engine never uses Python).

The driver testdata's documents table draws from a closed 31-word vocabulary,
which is pathological for similarity ops: ~30% of ALL doc pairs share ≥ 0.2
Jaccard, so candidate-bound operators go superlinear for corpus reasons, not
algorithmic ones. This synthesizes zipf-distributed text over a 10k-word
vocabulary (the natural-text regime these operators are built for) at two
scale points — 5k and 50k docs — with the sf0.1 doc-length range and dup
rate, so the same query can be cost-curved on realistic data.

Writes scale_rich_small/ (5k) and scale_rich_big/ (50k), both gitignored.
NOT oracle data — cost curves only. Deterministic, seed 777.
"""
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent.parent
rng = np.random.default_rng(777)

# character-realistic pseudo-words: random lowercase letters, natural-ish
# length distribution (3-10 chars), de-duplicated. A synthetic "word%05d"
# vocabulary is token-realistic but character-PATHOLOGICAL — every token
# shares the 4-char "word" prefix plus digits, so char-level operators
# (segment-blocked edit distance) see near-zero segment entropy and
# collapse toward all-pairs, which real text does not do.
_letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
_seen, _words = set(), []
while len(_words) < 10_000:
    L = int(rng.integers(3, 11))
    w = "".join(rng.choice(_letters, L))
    if w not in _seen:
        _seen.add(w)
        _words.append(w)
VOCAB = np.array(_words)
# zipf-ish rank weights (s=1.1), the shape of natural-language unigrams
w = 1.0 / np.arange(1, len(VOCAB) + 1) ** 1.1
w /= w.sum()

for name, n_doc in [("scale_rich_small", 5_000), ("scale_rich_big", 50_000)]:
    out = ROOT / name
    out.mkdir(exist_ok=True)
    n_words = rng.integers(10, 101, n_doc)
    texts = [" ".join(rng.choice(VOCAB, k, p=w)) for k in n_words]
    # exact duplicates at the sf0.1 rate (8/5000)
    for i in rng.choice(n_doc, max(1, int(n_doc * 8 / 5000)), replace=False):
        texts[i] = texts[int(rng.integers(0, n_doc))]
    # plus near-dups at the same rate: 1-2 token flips on a clone
    for i in rng.choice(n_doc, max(1, int(n_doc * 8 / 5000)), replace=False):
        src = texts[int(rng.integers(0, n_doc))].split(" ")
        for _ in range(int(rng.integers(1, 3))):
            src[int(rng.integers(0, len(src)))] = str(
                rng.choice(VOCAB, 1, p=w)[0])
        texts[i] = " ".join(src)
    langs = rng.choice(["en", "de", "zh", "fr", "es"], n_doc,
                       p=[0.412, 0.147, 0.147, 0.147, 0.147])
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, n_doc)])
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), out / "documents.parquet")
    print(f"{name}: {n_doc} docs")
