"""Distributed BPE trainer vs a line-for-line reference implementation
(Sennrich et al. 2016 pseudo-code) — the correctness gate for an operator
that is iterative and therefore has no SQL oracle."""

from collections import Counter

import pytest

from pandas_db_spark.operators import bpe


def ref_bpe(texts: list[str], n: int) -> list[tuple[str, str]]:
    words: Counter = Counter()
    for t in texts:
        words.update(t.split())
    segs = {w: tuple(list(w) + ["</w>"]) for w in words}
    merges = []
    for _ in range(n):
        pc: Counter = Counter()
        for w, f in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        m = max(pc.values())
        best = sorted(p for p, c in pc.items() if c == m)[0]
        if pc[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w in segs:
            out = []
            for sym in segs[w]:
                if out and out[-1] == a and sym == b:
                    out[-1] = a + b
                else:
                    out.append(sym)
            segs[w] = tuple(out)
    return merges


SENNRICH = ("low low low low low lower lower newest newest newest "
            "newest newest newest widest widest widest")


def test_bpe_matches_reference_incl_ties(spark):
    docs = spark.createDataFrame(
        [(1, SENNRICH), (2, "low lower banana banana band band band")],
        "doc_id long, text string")
    texts = [r["text"] for r in docs.collect()]
    assert bpe.bpe_train(docs, "text", 12) == ref_bpe(texts, 12)


def test_bpe_stops_when_dry(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")],
                                 "doc_id long, text string")
    # every pair occurs once -> below the count-2 floor, no merges
    assert bpe.bpe_train(docs, "text", 5) == []
    with pytest.raises(ValueError, match="positive"):
        bpe.bpe_train(docs, "text", 0)


def test_bpe_segment_reconstructs_text(spark, db):
    docs = db.documents.df.limit(20)
    merges = bpe.bpe_train(docs, "text", 6)
    assert merges  # real corpus learns something
    seg = bpe.bpe_segment(docs, "text", merges, "doc_id")
    joined = {r["doc_id"]: "".join(r["tokens"]).replace("</w>", " ").strip()
              for r in seg.collect()}
    for r in docs.collect():
        norm = " ".join(r["text"].split())
        assert joined[r["doc_id"]] == norm  # lossless segmentation


def test_bpe_loop_stays_jvm_side(spark):
    """No Python evaluation inside the per-round plans (the iterative
    hot path must be whole-stage JVM)."""
    docs = spark.createDataFrame([(1, SENNRICH)], "doc_id long, text string")
    seg = bpe._initial_symbols(bpe.word_freqs(docs, "text"))
    plan = (bpe._pair_counts(seg)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan2 = (bpe._merge_pair(seg, "e", "s")
             ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2
