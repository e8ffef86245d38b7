"""Offline data preparation tools.

Covers the reference's ``preprocessing/`` script battery (SURVEY.md §2.9) as
one CLI with subcommands:

- ``training-triples``: sample (query, pos, neg) triples from a first-stage
  candidate file + qrels + text collections
  (reference generate_training_input_from_candidate_set.py).
- ``validation-tuples``: build re-ranking eval tuples ``qid did qtext dtext``
  from a candidate set (generate_validation_input_from_candidate_set.py:1-135).
- ``vocab``: build a vocabulary file from collection+queries
  (generate_vocab.py).
- ``idf``: compute idf values over the collection (generate_idf.py).
- ``split-queries``: deterministic query-file split (query splitting scripts).
- ``intersect-qrels``: keep only queries present in both qrels and query file.

Usage: python -m matchmaker_tpu.preprocessing <subcommand> --help
"""

from __future__ import annotations

import argparse
import math
import random
import sys
from collections import Counter
from typing import Dict

from matchmaker_tpu.data.tokenization import WhitespaceTokenizer
from matchmaker_tpu.experiment import parse_candidate_set
from matchmaker_tpu.metrics import load_qrels


def _read_tsv(path: str) -> Dict[str, str]:
    out = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                out[parts[0]] = parts[1]
    return out


def cmd_training_triples(args) -> int:
    qrels = load_qrels(args.qrels)
    candidates = parse_candidate_set(args.candidates, args.depth)
    queries = _read_tsv(args.queries)
    collection = _read_tsv(args.collection)
    rng = random.Random(args.seed)
    n = 0
    with open(args.out, "w", encoding="utf-8") as out:
        for qid, cands in candidates.items():
            if qid not in qrels or qid not in queries:
                continue
            positives = [d for d in qrels[qid] if d in collection]
            negatives = [d for d in cands if d not in qrels[qid] and d in collection]
            if not positives or not negatives:
                continue
            for _ in range(args.triples_per_query):
                pos = rng.choice(positives)
                neg = rng.choice(negatives)
                out.write(f"{queries[qid]}\t{collection[pos]}\t{collection[neg]}\n")
                n += 1
    print(f"wrote {n} triples -> {args.out}")
    return 0


def cmd_validation_tuples(args) -> int:
    candidates = parse_candidate_set(args.candidates, args.depth)
    queries = _read_tsv(args.queries)
    collection = _read_tsv(args.collection)
    n = 0
    with open(args.out, "w", encoding="utf-8") as out:
        for qid, cands in candidates.items():
            if qid not in queries:
                continue
            for did, _rank in sorted(cands.items(), key=lambda kv: kv[1]):
                if did in collection:
                    out.write(f"{qid}\t{did}\t{queries[qid]}\t{collection[did]}\n")
                    n += 1
    print(f"wrote {n} tuples -> {args.out}")
    return 0


def cmd_vocab(args) -> int:
    tok = WhitespaceTokenizer()
    counts: Counter = Counter()
    for path in args.inputs:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                text = parts[1] if len(parts) >= 2 else parts[0]
                counts.update(tok.tokenize(text))
    with open(args.out, "w", encoding="utf-8") as out:
        for token, c in counts.most_common():
            if c >= args.min_count:
                out.write(token + "\n")
    print(f"wrote vocab ({sum(1 for c in counts.values() if c >= args.min_count)} tokens) -> {args.out}")
    return 0


def cmd_idf(args) -> int:
    tok = WhitespaceTokenizer()
    doc_freq: Counter = Counter()
    n_docs = 0
    with open(args.collection, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            n_docs += 1
            doc_freq.update(set(tok.tokenize(parts[1])))
    with open(args.out, "w", encoding="utf-8") as out:
        for token, df in doc_freq.most_common():
            idf = math.log((n_docs + 1) / (df + 1))
            out.write(f"{token} {idf}\n")
    print(f"wrote idf for {len(doc_freq)} tokens over {n_docs} docs -> {args.out}")
    return 0


def cmd_split_queries(args) -> int:
    queries = list(_read_tsv(args.queries).items())
    rng = random.Random(args.seed)
    rng.shuffle(queries)
    cut = int(len(queries) * args.fraction)
    for path, part in ((args.out_a, queries[:cut]), (args.out_b, queries[cut:])):
        with open(path, "w", encoding="utf-8") as out:
            for qid, text in part:
                out.write(f"{qid}\t{text}\n")
    print(f"split {len(queries)} queries -> {cut} / {len(queries) - cut}")
    return 0


def cmd_intersect_qrels(args) -> int:
    qrels = load_qrels(args.qrels)
    queries = _read_tsv(args.queries)
    keep = set(qrels) & set(queries)
    with open(args.out_queries, "w", encoding="utf-8") as out:
        for qid in keep:
            out.write(f"{qid}\t{queries[qid]}\n")
    print(f"kept {len(keep)} of {len(queries)} queries")
    return 0


def main() -> int:
    parser = argparse.ArgumentParser(prog="matchmaker_tpu.preprocessing")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("training-triples")
    p.add_argument("--candidates", required=True)
    p.add_argument("--qrels", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--collection", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--depth", type=int, default=100)
    p.add_argument("--triples-per-query", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_training_triples)

    p = sub.add_parser("validation-tuples")
    p.add_argument("--candidates", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--collection", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--depth", type=int, default=100)
    p.set_defaults(fn=cmd_validation_tuples)

    p = sub.add_parser("vocab")
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-count", type=int, default=5)
    p.set_defaults(fn=cmd_vocab)

    p = sub.add_parser("idf")
    p.add_argument("--collection", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_idf)

    p = sub.add_parser("split-queries")
    p.add_argument("--queries", required=True)
    p.add_argument("--out-a", required=True)
    p.add_argument("--out-b", required=True)
    p.add_argument("--fraction", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_split_queries)

    p = sub.add_parser("intersect-qrels")
    p.add_argument("--qrels", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--out-queries", required=True)
    p.set_defaults(fn=cmd_intersect_qrels)

    args = parser.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
