"""Semantic-decontamination quality floors (r11 VERDICT directive 4):
the measured curve from tools/probe_semdecon_quality.py, pinned so
regressions in the embed geometry / IVF probe / threshold semantics
fail loudly -- the decontamination twin of test_retrieval_quality.py.

Fixture: the REAL sf0.001 documents corpus; eval strata are
deterministic paraphrase / topical / unrelated derivations of its own
chunks (see the probe module). Full sweep table in SCALE.md round 12.
Measured reference points (sf0.001, every=5, 100 evals/stratum):

  probes=all @ 0.85: recall 1.00, topical 0.84, unrelated 0.00
  probes=all @ 0.90: recall 0.97, topical 0.29
  probes=all @ 0.95: recall 0.48, precision 0.98, topical 0.01
  probes=4   @ 0.85: recall 0.94;  probes=1 @ 0.85: recall 0.61
"""

import pytest

from pg_auto_dw_spark.functions.semsearch import (
    build_chunk_search_index,
    semantic_decontaminate,
)
from pg_auto_dw_spark.sources import load_table
from pg_auto_dw_spark.warehouse import Warehouse
from tests.conftest import SF_DIR
from tools.probe_semdecon_quality import curve, strata_evals


@pytest.fixture(scope="module")
def decon(spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("semdecon_wh")))
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    build_chunk_search_index(wh, docs, "dcq")
    evals, truth = strata_evals(spark, docs, every=5)
    counts = {
        s: sum(1 for e in truth if e % 10 == s) for s in (1, 2, 3)
    }

    def hits(n_probes):
        rows = semantic_decontaminate(
            wh, "dcq", evals, threshold=0.0, k=500, n_probes=n_probes
        ).collect()
        return curve(rows, truth, counts[1], counts[2], counts[3])

    return hits


def test_exact_search_floors(decon):
    """Every-cell-probed search (= brute force): paraphrase-grade
    leaks flag completely at the default threshold, unrelated text
    never flags, and 0.95 is the near-verbatim-only operating point."""
    c = decon(10**6)
    assert c[0.85]["recall"] >= 0.98
    assert c[0.85]["unrelated_rate"] == 0.0
    assert c[0.9]["recall"] >= 0.9
    assert c[0.9]["topical_rate"] <= 0.4
    assert c[0.95]["precision"] >= 0.95
    assert c[0.95]["topical_rate"] <= 0.05


def test_probe_knob_buys_recall(decon):
    """The documented recall contract: n_probes is the knob. Floors at
    the measured points minus slack; the knob must actually move."""
    r1 = decon(1)[0.85]["recall"]
    r4 = decon(4)[0.85]["recall"]
    assert r4 >= 0.85
    assert r1 >= 0.45
    assert r4 > r1
