"""Dataset format converter tests (driven through the CLI surface)."""

import json
import os
import subprocess
import sys


def _run(args):
    r = subprocess.run(
        [sys.executable, "-m", "matchmaker_tpu.convert_formats"] + args,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_msmarco_doc(tmp_path):
    inp = tmp_path / "docs.tsv"
    inp.write_text("D1\thttp://x\tSome Title\tbody text here\nD2\thttp://y\tOther\tmore body\n")
    out = tmp_path / "collection.tsv"
    _run(["msmarco-doc", "--inp", str(inp), "--out", str(out)])
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "D1\tSome Title body text here"


def test_trec_sgml(tmp_path):
    inp = tmp_path / "robust.sgml"
    inp.write_text(
        "<DOC>\n<DOCNO> FBIS3-1 </DOCNO>\n<TEXT>\nParagraph one.\n<P>inner tag</P>\n</TEXT>\n</DOC>\n"
        "<DOC>\n<DOCNO>FBIS3-2</DOCNO>\n<TEXT>Second doc text</TEXT>\n</DOC>\n"
    )
    out = tmp_path / "collection.tsv"
    _run(["trec-sgml", "--inputs", str(inp), "--out", str(out)])
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("FBIS3-1\tParagraph one.")
    assert "inner tag" in lines[0]
    assert lines[1] == "FBIS3-2\tSecond doc text"


def test_squad(tmp_path):
    data = {
        "data": [{
            "title": "t",
            "paragraphs": [
                {"context": "Paris is the capital of France.",
                 "qas": [{"id": "q1", "question": "What is the capital of France?",
                          "answers": [{"text": "Paris", "answer_start": 0}]}]},
                {"context": "Berlin is in Germany.",
                 "qas": [{"id": "q2", "question": "Where is Berlin?",
                          "answers": [{"text": "Germany", "answer_start": 13}]}]},
            ],
        }]
    }
    inp = tmp_path / "squad.json"
    inp.write_text(json.dumps(data))
    triples = tmp_path / "triples.tsv"
    tuples = tmp_path / "tuples.tsv"
    answers = tmp_path / "answers.json"
    _run(["squad", "--inp", str(inp), "--triples-out", str(triples),
          "--tuples-out", str(tuples), "--answers-out", str(answers)])
    t0 = triples.read_text().strip().split("\n")[0].split("\t")
    assert t0[0] == "0,5"  # char span of "Paris"
    assert t0[1] == "What is the capital of France?"
    gold = json.loads(answers.read_text())
    assert gold["q1"] == ["Paris"]


def test_cord19_and_qrels(tmp_path):
    inp = tmp_path / "metadata.csv"
    inp.write_text('cord_uid,title,abstract\nug7v899j,"A study","We did things."\n')
    out = tmp_path / "collection.tsv"
    _run(["cord19", "--inp", str(inp), "--out", str(out)])
    assert out.read_text().startswith("ug7v899j\tA study We did things.")

    q = tmp_path / "raw_qrels.txt"
    q.write_text("q1,d1,1\nq2 0 d2 2\n")
    qo = tmp_path / "qrels.txt"
    _run(["trec-qrels", "--inp", str(q), "--out", str(qo)])
    assert qo.read_text() == "q1 0 d1 1\nq2 0 d2 2\n"
