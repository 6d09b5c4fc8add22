"""Measured quality curve for semantic_decontaminate (r11 VERDICT
directive 4): turn the docstring's calibration claim ("near-verbatim
~0.9+, topical ~0.3-0.6, unrelated < 0.5") into a table.

Three deterministic eval strata are derived from the REAL documents
corpus at the chosen SF (no synthetic corpus -- the fixture is the
actual hashed-BoW geometry the operator runs in):

- paraphrase: the first chunk of every Nth doc, reworded -- word order
  reversed (a true rewording; BoW must be order-proof BY DESIGN, this
  stratum proves the claim on real text), every 7th word dropped,
  every 11th surviving word replaced. ~80-90% token overlap with the
  source chunk: the paraphrase-grade leak the exact n-gram family
  cannot see. Ground truth: contaminated, source = the doc itself.
- topical: half the source chunk's words + half of ANOTHER doc's
  chunk -- on-topic vocabulary overlap without a lifted passage.
  Gray zone by construction; the curve shows where the threshold
  stops flagging it.
- unrelated: fully out-of-vocabulary synthetic tokens. Ground truth:
  clean. (With 64 hashed dims, unrelated text still lands nonzero
  cosine by collision -- the curve shows the collision noise floor.)

The search runs ONCE per n_probes at threshold 0 and k large; every
threshold row is then derived from the same hit set, so the sweep
costs probes-many searches, not probes x thresholds.

eval_id encoding: doc_id * 10 + {1 paraphrase, 2 topical, 3 unrelated}.

Usage: python tools/probe_semdecon_quality.py [--sf /root/testdata/sf0.01]
Prints one table row per (n_probes, threshold); paste into SCALE.md.
Floor pins live in tests/test_semdecon_quality.py (same builders).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = [0.5, 0.6, 0.7, 0.8, 0.85, 0.9, 0.95]


def _words(text: str, chunk_words: int) -> list[str]:
    return (text or "").split(" ")[:chunk_words]


def _paraphrase(ws: list[str]) -> str:
    # reorder + drop every 7th + substitute every 11th with an
    # IN-VOCABULARY word (another word of the same doc). Substituting
    # an out-of-vocabulary token instead would hand the replacement
    # the maximum default IDF (ln(n+1)+1, ~6x a common word on this
    # corpus) and let a handful of insertions dominate the vector
    # norm -- measured: cosine 0.38 vs 0.9+, a fixture artifact, not
    # an operator property.
    kept = [w for i, w in enumerate(ws) if i % 7 != 6]
    kept = [
        (kept[(i + 3) % len(kept)] if i % 11 == 10 else w)
        for i, w in enumerate(kept)
    ]
    return " ".join(reversed(kept))


def _topical(ws: list[str], other: list[str]) -> str:
    # every other source word (50% token overlap, no contiguous lifted
    # passage) interleaved with half of an unrelated doc's words:
    # on-topic vocabulary without a lift
    half = [w for i, w in enumerate(ws) if i % 2 == 0]
    return " ".join(half + other[: max(1, len(other) // 2)])


def _unrelated(doc_id: int, n: int = 40) -> str:
    return " ".join(f"zx{doc_id}q{i}vk" for i in range(n))


def strata_evals(spark, docs, every: int = 10, chunk_words: int = 64):
    """(eval frame (eval_id, text), truth) from the corpus: one
    paraphrase + one topical + one unrelated eval per selected doc.
    truth = {eval_id: source_doc_id or None}. Driver-side over the
    SELECTED docs only (corpus_size / every rows -- probe-sized)."""
    rows = (
        docs.where(f"doc_id % {every} = 0")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    texts = {r["doc_id"]: _words(r["text"], chunk_words) for r in rows}
    ids = sorted(texts)
    evals, truth = [], {}
    for i, d in enumerate(ids):
        ws = texts[d]
        other = texts[ids[(i + 1) % len(ids)]]
        evals.append((d * 10 + 1, _paraphrase(ws)))
        truth[d * 10 + 1] = d
        evals.append((d * 10 + 2, _topical(ws, other)))
        truth[d * 10 + 2] = None  # gray zone: reported, not scored
        evals.append((d * 10 + 3, _unrelated(d)))
        truth[d * 10 + 3] = None
    return (
        spark.createDataFrame(evals, "eval_id bigint, text string"),
        truth,
    )


def curve(hits_rows, truth, n_para: int, n_top: int, n_unrel: int):
    """Per-threshold metrics from one collected hit set (threshold-0
    search). Returns {threshold: dict}."""
    out = {}
    for t in THRESHOLDS:
        flagged: dict[int, set] = {}
        for r in hits_rows:
            if r["cosine"] >= t:
                flagged.setdefault(r["eval_id"], set()).add(r["doc_id"])
        para_hit = sum(
            1
            for e, src in truth.items()
            if e % 10 == 1 and src in flagged.get(e, ())
        )
        f_para = sum(1 for e in flagged if e % 10 == 1)
        f_top = sum(1 for e in flagged if e % 10 == 2)
        f_unrel = sum(1 for e in flagged if e % 10 == 3)
        n_flagged = len(flagged)
        out[t] = {
            "recall": para_hit / n_para if n_para else 0.0,
            "precision": (f_para / n_flagged) if n_flagged else 1.0,
            "topical_rate": f_top / n_top if n_top else 0.0,
            "unrelated_rate": f_unrel / n_unrel if n_unrel else 0.0,
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--probes", default="1,2,4,1000000")
    args = ap.parse_args()

    import tempfile
    import time

    from pg_auto_dw_spark.functions.semsearch import (
        build_chunk_search_index,
        semantic_decontaminate,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark()
    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="semdecon_q_"))
    t0 = time.perf_counter()
    stats = build_chunk_search_index(wh, docs, "dcq")
    print(
        f"# index: {stats['vectors']} chunks, {stats['cells']} cells, "
        f"built {time.perf_counter() - t0:.1f}s @ {args.sf}"
    )
    evals, truth = strata_evals(spark, docs, every=args.every)
    n_para = sum(1 for e in truth if e % 10 == 1)
    n_top = sum(1 for e in truth if e % 10 == 2)
    n_unrel = sum(1 for e in truth if e % 10 == 3)
    print(f"# evals: {n_para} paraphrase / {n_top} topical / {n_unrel} unrelated")
    print("| probes | threshold | recall | precision | topical rate | unrelated rate | search s |")
    print("|---|---|---|---|---|---|---|")
    for p in [int(x) for x in args.probes.split(",")]:
        t0 = time.perf_counter()
        rows = semantic_decontaminate(
            wh, "dcq", evals, threshold=0.0, k=500, n_probes=p
        ).collect()
        dt = time.perf_counter() - t0
        label = "all" if p >= 10**6 else str(p)
        for t, m in curve(rows, truth, n_para, n_top, n_unrel).items():
            print(
                f"| {label} | {t} | {m['recall']:.3f} | {m['precision']:.3f} "
                f"| {m['topical_rate']:.3f} | {m['unrelated_rate']:.3f} "
                f"| {dt:.2f} |"
            )


if __name__ == "__main__":
    main()
