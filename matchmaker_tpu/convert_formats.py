"""Dataset format converters → the framework's canonical TSV formats.

Covers the reference's ``preprocessing/convert_formats/*`` battery
(SURVEY.md §2.9) for the common public datasets:

- ``msmarco-doc``: MS MARCO document corpus (`docid \t url \t title \t body`)
  → `id \t title body` collection.
- ``trec-sgml``: TREC SGML document collections (Robust04-style
  <DOC><DOCNO><TEXT> markup) → `id \t text`.
- ``squad``: SQuAD v1/v2 JSON → QA training triples
  (`qa_spans \t question \t context_pos \t context_neg`) and/or QA eval tuples
  with gold answers.
- ``cord19``: CORD-19 metadata.csv → `id \t title abstract`.
- ``openwebtext``: directory of .txt files → `id \t text` (MLM pre-training).
- ``trec-qrels``: pass/normalize qrel variants into 4-col TREC format.

Usage: python -m matchmaker_tpu.convert_formats <subcommand> --help
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random
import re
import sys


def cmd_msmarco_doc(args) -> int:
    n = 0
    with open(args.inp, "r", encoding="utf-8") as f, open(args.out, "w", encoding="utf-8") as out:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4:
                continue
            doc_id, _url, title, body = parts[0], parts[1], parts[2], parts[3]
            text = f"{title} {body}".strip().replace("\t", " ")
            out.write(f"{doc_id}\t{text}\n")
            n += 1
    print(f"converted {n} docs -> {args.out}")
    return 0


_DOC_RE = re.compile(r"<DOC>(.*?)</DOC>", re.S)
_DOCNO_RE = re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", re.S)
_TEXT_RE = re.compile(r"<TEXT>(.*?)</TEXT>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def cmd_trec_sgml(args) -> int:
    n = 0
    with open(args.out, "w", encoding="utf-8") as out:
        for path in args.inputs:
            with open(path, "r", encoding="utf-8", errors="replace") as f:
                content = f.read()
            for doc in _DOC_RE.finditer(content):
                block = doc.group(1)
                docno = _DOCNO_RE.search(block)
                if not docno:
                    continue
                texts = _TEXT_RE.findall(block)
                text = " ".join(_TAG_RE.sub(" ", t) for t in texts)
                text = " ".join(text.split()).replace("\t", " ")
                if text:
                    out.write(f"{docno.group(1)}\t{text}\n")
                    n += 1
    print(f"converted {n} docs -> {args.out}")
    return 0


def cmd_squad(args) -> int:
    with open(args.inp, "r", encoding="utf-8") as f:
        data = json.load(f)["data"]
    contexts = []  # (id, text)
    qas = []  # (qa_id, question, context_idx, [(start, end)], [answer texts])
    for article in data:
        for para in article["paragraphs"]:
            ctx_idx = len(contexts)
            contexts.append((f"ctx{ctx_idx}", para["context"].replace("\t", " ").replace("\n", " ")))
            for qa in para["qas"]:
                spans = []
                answers = []
                for ans in qa.get("answers", []):
                    start = ans["answer_start"]
                    spans.append((start, start + len(ans["text"])))
                    answers.append(ans["text"])
                qas.append((qa["id"], qa["question"].replace("\t", " "), ctx_idx, spans, answers))

    rng = random.Random(args.seed)
    n = 0
    if args.triples_out:
        with open(args.triples_out, "w", encoding="utf-8") as out:
            for qa_id, question, ctx_idx, spans, _ in qas:
                neg_idx = rng.randrange(len(contexts))
                while neg_idx == ctx_idx and len(contexts) > 1:
                    neg_idx = rng.randrange(len(contexts))
                span_str = " ".join(f"{s},{e}" for s, e in spans[: args.max_spans])
                out.write(f"{span_str}\t{question}\t{contexts[ctx_idx][1]}\t{contexts[neg_idx][1]}\n")
                n += 1
        print(f"wrote {n} qa triples -> {args.triples_out}")
    if args.tuples_out:
        with open(args.tuples_out, "w", encoding="utf-8") as out, open(
            args.answers_out or args.tuples_out + ".answers.json", "w", encoding="utf-8"
        ) as ans_out:
            gold = {}
            for qa_id, question, ctx_idx, _, answers in qas:
                out.write(f"{qa_id}\t{contexts[ctx_idx][0]}\t{question}\t{contexts[ctx_idx][1]}\n")
                gold[qa_id] = answers
            json.dump(gold, ans_out)
        print(f"wrote {len(qas)} qa tuples -> {args.tuples_out}")
    return 0


def cmd_cord19(args) -> int:
    n = 0
    with open(args.inp, newline="", encoding="utf-8") as f, open(args.out, "w", encoding="utf-8") as out:
        for row in csv.DictReader(f):
            doc_id = row.get("cord_uid") or row.get("sha") or ""
            title = (row.get("title") or "").replace("\t", " ")
            abstract = (row.get("abstract") or "").replace("\t", " ")
            if doc_id and (title or abstract):
                out.write(f"{doc_id}\t{title} {abstract}\n".replace("\n ", " ").rstrip() + "\n")
                n += 1
    print(f"converted {n} docs -> {args.out}")
    return 0


def cmd_openwebtext(args) -> int:
    n = 0
    with open(args.out, "w", encoding="utf-8") as out:
        for root, _dirs, files in os.walk(args.inp):
            for fname in sorted(files):
                if not fname.endswith(".txt"):
                    continue
                with open(os.path.join(root, fname), "r", encoding="utf-8", errors="replace") as f:
                    text = " ".join(f.read().split()).replace("\t", " ")
                if text:
                    out.write(f"owt{n}\t{text[: args.max_chars]}\n")
                    n += 1
    print(f"converted {n} documents -> {args.out}")
    return 0


def cmd_trec_qrels(args) -> int:
    """Normalize qrel variants (comma/tab/space separated) to 4-col TREC."""
    n = 0
    with open(args.inp, "r", encoding="utf-8") as f, open(args.out, "w", encoding="utf-8") as out:
        for line in f:
            parts = re.split(r"[,\t ]+", line.strip())
            if len(parts) == 4:
                qid, it, did, grade = parts
            elif len(parts) == 3:
                qid, did, grade = parts
                it = "0"
            else:
                continue
            out.write(f"{qid} {it} {did} {grade}\n")
            n += 1
    print(f"normalized {n} qrels -> {args.out}")
    return 0


def main() -> int:
    parser = argparse.ArgumentParser(prog="matchmaker_tpu.convert_formats")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("msmarco-doc")
    p.add_argument("--inp", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_msmarco_doc)

    p = sub.add_parser("trec-sgml")
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_trec_sgml)

    p = sub.add_parser("squad")
    p.add_argument("--inp", required=True)
    p.add_argument("--triples-out")
    p.add_argument("--tuples-out")
    p.add_argument("--answers-out")
    p.add_argument("--max-spans", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_squad)

    p = sub.add_parser("cord19")
    p.add_argument("--inp", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_cord19)

    p = sub.add_parser("openwebtext")
    p.add_argument("--inp", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max-chars", type=int, default=100000)
    p.set_defaults(fn=cmd_openwebtext)

    p = sub.add_parser("trec-qrels")
    p.add_argument("--inp", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_trec_qrels)

    args = parser.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
