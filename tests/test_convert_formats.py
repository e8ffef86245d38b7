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


def _cbor_bytes(b: bytes) -> bytes:
    assert len(b) < 24
    return bytes([0x40 | len(b)]) + b


def _cbor_text(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) < 24:
        return bytes([0x60 | len(b)]) + b
    return bytes([0x78, len(b)]) + b


def _cbor_int(n: int) -> bytes:
    assert 0 <= n < 24
    return bytes([n])


def _cbor_array(items) -> bytes:
    assert len(items) < 24
    return bytes([0x80 | len(items)]) + b"".join(items)


def test_trec_car_cbor_collection(tmp_path):
    """Paragraph = [0, id, [bodies]]; ParaText [1, text], ParaLink's anchor
    text is its last string (trec-car-tools get_text semantics)."""
    para1 = _cbor_array([
        _cbor_int(0),
        _cbor_bytes(b"caf3b2x9"),
        _cbor_array([
            _cbor_array([_cbor_int(1), _cbor_text("Anthropology studies ")]),
            _cbor_array([_cbor_int(2), _cbor_text("Human"), _cbor_text("humans")]),
            _cbor_array([_cbor_int(1), _cbor_text(" in societies.")]),
        ]),
    ])
    para2 = _cbor_array([
        _cbor_int(0),
        _cbor_bytes(b"deadbeef"),
        _cbor_array([_cbor_array([_cbor_int(1), _cbor_text("Second paragraph")])]),
    ])
    inp = tmp_path / "paragraphs.cbor"
    inp.write_bytes(para1 + para2)
    out = tmp_path / "collection.tsv"
    _run(["trec-car", "--inp", str(inp), "--out", str(out)])
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "caf3b2x9\tAnthropology studies humans in societies."
    assert lines[1] == "deadbeef\tSecond paragraph"


def test_trec_car_queries(tmp_path):
    inp = tmp_path / "topics.txt"
    inp.write_text(
        "enwiki:Antibiotics/Medical%20uses/Administration\n"
        "enwiki:Antibiotics/Side-effects 0 someid 1\n"
        "enwiki:Antibiotics/Side-effects 0 otherid 1\n"
    )
    out = tmp_path / "queries.tsv"
    _run(["trec-car-queries", "--inp", str(inp), "--out", str(out)])
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "enwiki:Antibiotics/Medical%20uses/Administration\tAntibiotics Medical uses Administration"
    assert len(lines) == 2  # deduped


def test_antique_qrels_normalization(tmp_path):
    inp = tmp_path / "qrels_in.txt"
    inp.write_text("q1 0 d1 4\nq1 0 d2 2\nq1 0 d3 1\n")
    out = tmp_path / "qrels.txt"
    _run(["antique-qrels", "--inp", str(inp), "--out", str(out)])
    assert out.read_text() == "q1 0 d1 2\nq1 0 d2 0\nq1 0 d3 0\n"


def _write_ir_fixture(tmp_path):
    (tmp_path / "collection.tsv").write_text(
        "d1\talpha text\nd2\tbeta text\nd3\tgamma text\nd4\tdelta text\n"
    )
    (tmp_path / "queries.tsv").write_text("q1\twhat alpha\nq2\twhat beta\n")
    (tmp_path / "qrels.txt").write_text("q1 0 d1 3\nq1 0 d3 1\nq2 0 d2 3\n")
    (tmp_path / "cands.txt").write_text(
        "q1 Q0 d3 1 9.1 run\nq1 Q0 d4 2 8.0 run\nq2 Q0 d4 1 7.7 run\nq2 Q0 d1 2 7.0 run\n"
    )


def test_antique_train_triples(tmp_path):
    _write_ir_fixture(tmp_path)
    out = tmp_path / "train.tsv"
    out_ids = tmp_path / "train_ids.tsv"
    _run(["antique-train", "--candidates", str(tmp_path / "cands.txt"),
          "--collection", str(tmp_path / "collection.tsv"),
          "--queries", str(tmp_path / "queries.tsv"),
          "--qrels", str(tmp_path / "qrels.txt"),
          "--out", str(out), "--out-ids", str(out_ids)])
    id_lines = [l.split("\t") for l in out_ids.read_text().strip().split("\n")]
    grades = {"q1": {"d1": 3, "d3": 1}, "q2": {"d2": 3}}
    for qid, pos, neg in id_lines:
        # the sampled positive always has a strictly higher grade than the neg
        assert grades[qid].get(pos, 0) > grades[qid].get(neg, 0), (qid, pos, neg)
    text_lines = out.read_text().strip().split("\n")
    assert all(len(l.split("\t")) == 3 for l in text_lines)


def test_tripclick_train_triples(tmp_path):
    _write_ir_fixture(tmp_path)
    out = tmp_path / "train.tsv"
    out_ids = tmp_path / "train_ids.tsv"
    _run(["tripclick-train", "--candidates", str(tmp_path / "cands.txt"),
          "--collection", str(tmp_path / "collection.tsv"),
          "--queries", str(tmp_path / "queries.tsv"),
          "--qrels", str(tmp_path / "qrels.txt"),
          "--out", str(out), "--out-ids", str(out_ids), "--negatives", "5"])
    id_lines = [l.split("\t") for l in out_ids.read_text().strip().split("\n")]
    assert id_lines, "no triples"
    qrels = {"q1": {"d1", "d3"}, "q2": {"d2"}}
    cands = {"q1": {"d3", "d4"}, "q2": {"d4", "d1"}}
    for qid, pos, neg in id_lines:
        assert pos in qrels[qid]  # every positive is a judged doc
        assert neg in cands[qid] and neg not in qrels[qid]  # negatives: unjudged candidates
