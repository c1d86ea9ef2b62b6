#!/usr/bin/env python3
"""Synthesize an sf1+-sized documents/embeddings fixture — the extra
points of the SURVEY §6.3 scaling table (sf0.001 → sf0.01 → sf0.1 →
sf1 → sf2 → sf5; r10 adds sf5 = --docs 250000 --embeddings 100000).

The driver's generator stops at sf0.1 (5,000 docs / 2,000 embeddings);
this reproduces its observed generative process at 10× so the data-heavy
dedup/ANN queries can be timed across a fourth decade:

  - documents: 30-word vocab (uniform), 10-100 words/doc (uniform),
    source = src{doc_id % 20}, lang ~ {en:0.41, zh/es/fr/de:~0.15},
    n_chars = len(text); 5% of docs are PLANTED NEAR-COPIES of a random
    earlier doc with 1-2 words replaced by the rare token "dup"
    (observed pair Jaccard 0.9-0.99 at sf0.1 — the structure the
    x21/x22/x23 pair kernels must keep bounded as buckets grow);
  - embeddings: 64-dim float32 ~ centroid[label] + N(0, 0.124), labels
    uniform 0..9, centroid norm ~0.063 (the weak cluster structure
    observed at sf0.1).

Deterministic (seed 421). Output dir gets documents.parquet and
embeddings.parquet; every OTHER table is symlinked from --base so the
bench harness can load its full view set. Measurement tooling only —
never an engine input (testdata stays driver-owned).

Usage: python3 tools/gen_scaling_fixture.py /root/repo/tmp/sf1 \
         --docs 50000 --embeddings 20000 --base /root/testdata/sf0.1
"""
import argparse
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("the a spark join stream small order merge column group customer "
         "part value window big scan table vector row filter sort batch "
         "hash key query data line slow fast agg").split()

def gen_documents(n, rng, vocab=None):
    vocab = vocab or VOCAB
    langs = ["en", "zh", "es", "fr", "de"]
    lang_w = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
    texts = []
    out_lang = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            # planted near-copy of a random earlier doc: 1-2 word slots
            # overwritten with the rare "dup" token
            w = texts[rng.randrange(i)].split()
            for _ in range(rng.randint(1, 2)):
                w[rng.randrange(len(w))] = "dup"
            texts.append(" ".join(w))
        else:
            nw = rng.randint(10, 100)
            texts.append(" ".join(rng.choice(vocab) for _ in range(nw)))
        out_lang.append(rng.choices(langs, weights=lang_w)[0])
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

def gen_events(n, rng):
    """The driver's observed events process at NxSF: n rows over the SAME
    30-day window (Jan 2024, sorted ascending, uniform arrivals), users =
    n * 15e3/1e6 (the sf0.1/sf0.01 ratio: 1,500 users per 100k events),
    event_type uniform over 5, value ~ Exp(mean 50) rounded to 2dp,
    props = {"k": 0..99}. Denser arrivals in a fixed window is the
    realistic scale-up for the time operators (x75/x78/x79): more events
    per (user, hour) bucket, not a longer history."""
    np_rng = np.random.default_rng(rng.randrange(2**63))
    span_us = 30 * 24 * 3600 * 1000000
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(np_rng.integers(0, span_us, size=n))
    users = np_rng.integers(0, max(1, n * 15 // 1000), size=n)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    vals = np.round(np_rng.exponential(50.0, size=n), 2)
    ks = np_rng.integers(0, 100, size=n)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(t0 + offs, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types[np_rng.integers(0, 5, size=n)]),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
    })

def gen_embeddings(n, rng):
    np_rng = np.random.default_rng(rng.randrange(2**63))
    cents = np_rng.normal(0.0, 0.008, size=(10, 64))
    labels = np_rng.integers(0, 10, size=n)
    vecs = (cents[labels] + np_rng.normal(0.0, 0.124, size=(n, 64))
            ).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--embeddings", type=int, default=20000)
    ap.add_argument("--vocab-size", type=int, default=0,
                    help="documents vocab size (0 = the driver's 30-word "
                         "vocab; >0 = wNNN synthetic words, the "
                         "realistic-gram-density variant for inverted-"
                         "index kernels whose bucket sizes are "
                         "density-bound)")
    ap.add_argument("--events", type=int, default=0,
                    help="synthesize a scaled events table too (0 = symlink "
                         "from --base as before)")
    ap.add_argument("--base", default="/root/testdata/sf0.1",
                    help="dir whose remaining tables are symlinked in")
    args = ap.parse_args()
    rng = random.Random(421)
    os.makedirs(args.out, exist_ok=True)
    vocab = ([f"w{i}" for i in range(args.vocab_size)]
             if args.vocab_size > 0 else None)
    pq.write_table(gen_documents(args.docs, rng, vocab),
                   os.path.join(args.out, "documents.parquet"))
    pq.write_table(gen_embeddings(args.embeddings, rng),
                   os.path.join(args.out, "embeddings.parquet"))
    if args.events > 0:
        pq.write_table(gen_events(args.events, rng),
                       os.path.join(args.out, "events.parquet"))
    # absolute target: a relative --base would be stored verbatim and
    # resolve relative to the OUTPUT dir — dangling links
    base = os.path.abspath(args.base)
    for f in sorted(os.listdir(base)):
        if not f.endswith(".parquet"):
            continue
        dst = os.path.join(args.out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base, f), dst)
    print(f"wrote {args.out}: docs={args.docs} embeddings={args.embeddings}")

if __name__ == "__main__":
    main()
