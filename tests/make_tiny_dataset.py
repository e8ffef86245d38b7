"""Synthetic planted-relevance IR dataset for end-to-end tests.

Relevant documents share vocabulary with their query; irrelevant documents are
drawn from a disjoint vocabulary half. Any lexical-matching model must reach
MRR close to 1.0 after a few steps, which gives e2e train/eval tests a sharp
success criterion (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List


def make_tiny_dataset(
    out_dir: str,
    n_queries: int = 40,
    n_val_queries: int = 12,
    docs_per_query: int = 10,
    seed: int = 7,
) -> Dict[str, str]:
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    topic_words = [f"topic{i}" for i in range(60)]
    noise_words = [f"noise{i}" for i in range(60)]

    def make_query(qi: int) -> str:
        rng_q = random.Random(seed * 1000 + qi)
        return " ".join(rng_q.sample(topic_words, 3))

    def rel_doc(query: str) -> str:
        words = query.split() * 3 + rng.sample(topic_words, 4)
        rng.shuffle(words)
        return " ".join(words)

    def irrel_doc() -> str:
        return " ".join(rng.sample(noise_words, 12))

    paths = {
        "train_tsv": os.path.join(out_dir, "train.tsv"),
        "val_tsv": os.path.join(out_dir, "val.tsv"),
        "qrels": os.path.join(out_dir, "qrels.txt"),
        "vocab": os.path.join(out_dir, "vocab.txt"),
        "collection": os.path.join(out_dir, "collection.tsv"),
        "queries": os.path.join(out_dir, "queries.tsv"),
    }

    with open(paths["vocab"], "w") as f:
        for w in topic_words + noise_words:
            f.write(w + "\n")

    with open(paths["train_tsv"], "w") as f:
        for qi in range(n_queries):
            q = make_query(qi)
            for _ in range(3):
                f.write(f"{q}\t{rel_doc(q)}\t{irrel_doc()}\n")

    doc_id = 0
    collection: List[str] = []
    with open(paths["val_tsv"], "w") as fv, open(paths["qrels"], "w") as fq, open(
        paths["queries"], "w"
    ) as fqs:
        for qi in range(n_val_queries):
            q = make_query(1000 + qi)
            qid = f"q{qi}"
            fqs.write(f"{qid}\t{q}\n")
            rel_position = rng.randrange(docs_per_query)
            for d in range(docs_per_query):
                did = f"d{doc_id}"
                doc_id += 1
                text = rel_doc(q) if d == rel_position else irrel_doc()
                collection.append(f"{did}\t{text}")
                fv.write(f"{qid}\t{did}\t{q}\t{text}\n")
                if d == rel_position:
                    fq.write(f"{qid} 0 {did} 1\n")

    with open(paths["collection"], "w") as f:
        f.write("\n".join(collection) + "\n")

    return paths


if __name__ == "__main__":
    import sys

    out = make_tiny_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_ir_dataset")
    for k, v in out.items():
        print(k, v)
