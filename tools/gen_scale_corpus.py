#!/usr/bin/env python3
"""Generate a scaled documents/embeddings corpus for LOCAL scale tests.

The driver ships sf0.001/sf0.01/sf0.1 (documents 5k rows at sf0.1,
embeddings 2k). This tool emits the same two tables at an arbitrary
multiple with the same statistical structure, so the d01-d09 / s01-s04
blocks can be measured at 10x+ the bench scale:

  - documents: 30-word uniform vocabulary, 5 languages (en-heavy),
    20 uniform sources, 44..577 chars, ~5%% near-duplicates (a base doc
    plus trailing " dup" marker words), a small exact-duplicate mass;
  - embeddings: unit-norm float32[64], 10 labels contributing a weak
    cluster component, ~2.5%% injected near-duplicate pairs (vector +
    small noise, re-normalized).

Usage: gen_scale_corpus.py OUTDIR DOCS_ROWS EMB_ROWS [SEED]
Never writes to /root/testdata (that tree is read-only by contract).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


VOCAB = ("spark query table join filter group agg sort hash scan row column "
         "value key window stream batch merge data line part order customer "
         "vector small big fast slow the a").split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
SOURCES = [f"src{i}" for i in range(20)]


def gen_documents(n, rng):
    texts = []
    for _ in range(n):
        nwords = rng.integers(10, 100)
        texts.append(" ".join(rng.choice(VOCAB, nwords)))
    # ~5% near-dups: copy an earlier doc, append 1..3 " dup" markers
    n_near = n // 20
    for i in rng.choice(np.arange(n // 2, n), n_near, replace=False):
        base = int(rng.integers(0, n // 2))
        texts[i] = texts[base] + " dup" * int(rng.integers(1, 4))
    # small exact-duplicate mass (~0.2%)
    for i in rng.choice(np.arange(n // 2, n), max(2, n // 500), replace=False):
        texts[i] = texts[int(rng.integers(0, n // 2))]
    lang = rng.choice(LANGS, n, p=LANG_W)
    source = np.array(SOURCES)[np.arange(n) % len(SOURCES)]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n, rng, dim=64, labels=10):
    lab = rng.integers(0, labels, n)
    centers = rng.standard_normal((labels, dim)).astype(np.float32) * 0.1
    v = rng.standard_normal((n, dim)).astype(np.float32) + centers[lab]
    # ~2.5% near-dup pairs: late vector := earlier vector + small noise
    n_near = n // 40
    for i in rng.choice(np.arange(n // 2, n), n_near, replace=False):
        j = int(rng.integers(0, n // 2))
        v[i] = v[j] + rng.standard_normal(dim).astype(np.float32) * 0.15
        lab[i] = lab[j]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.array([row.tolist() for row in v],
                   pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": emb,
        "label": pa.array(lab, pa.int32()),
    })


def main():
    out, docs_n, emb_n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    assert not out.startswith("/root/testdata"), "testdata is read-only"
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    pq.write_table(gen_documents(docs_n, rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(emb_n, rng), f"{out}/embeddings.parquet")
    print(f"wrote {out}: documents={docs_n} embeddings={emb_n} seed={seed}")


if __name__ == "__main__":
    main()
