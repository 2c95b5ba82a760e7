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

A second MODE, `heavytail`, models a realistic web-scale corpus instead
of the uniform generator: the uniform mode's FIXED 10-label cluster
component makes a constant fraction of ALL pairs genuinely
near-duplicate, so candidate mass in any correct similarity plan grows
~n^2 with corpus size — a generator artifact, not a plan property
(adjudicated in SCALE_r7.md). heavytail keeps the same schemas but:

  - documents: ~1000-word Zipf(1.2) vocabulary (real text is heavy-
    tailed), same FIXED per-doc near/exact-dup rates — duplicate pair
    mass grows linearly in n;
  - embeddings: label count GROWS with n (one label per ~200 vectors),
    so per-cluster population — and with it the near-pair mass — stays
    constant per vector; the injected near-dup rate stays fixed.

Usage: gen_scale_corpus.py OUTDIR DOCS_ROWS EMB_ROWS [SEED] [MODE]
MODE = uniform (default) | heavytail.
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


def zipf_vocab_probs(v, a=1.2):
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = ranks ** -a
    return p / p.sum()


def gen_documents(n, rng, mode="uniform"):
    if mode == "heavytail":
        vocab = np.array([f"w{i}" for i in range(1000)])
        probs = zipf_vocab_probs(len(vocab))
    else:
        vocab, probs = np.array(VOCAB), None
    texts = []
    for _ in range(n):
        nwords = rng.integers(10, 100)
        texts.append(" ".join(rng.choice(vocab, nwords, p=probs)))
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


def gen_embeddings(n, rng, dim=64, labels=10, mode="uniform"):
    if mode == "heavytail":
        # cluster count scales with n: per-cluster population (and the
        # within-cluster near-pair mass per vector) stays constant
        labels = max(10, n // 200)
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
    mode = sys.argv[5] if len(sys.argv) > 5 else "uniform"
    # SCALE_r8 §10/§12 caveat fix: a single one-row-group parquet FILE is
    # ONE Spark task at every scale (these corpora are far below
    # maxPartitionBytes), so map-only (media decode) rows measured
    # single-core. n_files > 1 writes each table as a DIRECTORY of that
    # many part files — Spark schedules one task per file, like a real
    # multi-file corpus; n_files = 1 keeps the legacy single-file layout.
    n_files = int(sys.argv[6]) if len(sys.argv) > 6 else 8
    assert mode in ("uniform", "heavytail"), f"unknown mode {mode}"
    assert not out.startswith("/root/testdata"), "testdata is read-only"
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    docs = gen_documents(docs_n, rng, mode)
    embs = gen_embeddings(emb_n, rng, mode=mode)
    for name, tbl in (("documents", docs), ("embeddings", embs)):
        path = f"{out}/{name}.parquet"
        if n_files <= 1:
            pq.write_table(tbl, path)
        else:
            os.makedirs(path, exist_ok=True)
            n = tbl.num_rows
            step = (n + n_files - 1) // n_files
            for i in range(n_files):
                part = tbl.slice(i * step, step)
                if part.num_rows:
                    pq.write_table(part, f"{path}/part-{i:03d}.parquet")
    print(f"wrote {out}: documents={docs_n} embeddings={emb_n} "
          f"seed={seed} mode={mode} n_files={n_files}")


if __name__ == "__main__":
    main()
