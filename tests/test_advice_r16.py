"""r16 ADVICE items pinned as tests.

- classifier_train_contract aggregates its contract integers from the
  labeled feature matrix (lang == 'en' plus lang != 'en'), which would
  silently drop NULL-lang docs that the oracle's full-corpus token
  stream includes; the correctness of the r15 one-pass rewrite rests
  on the fixture invariant "documents.lang is non-NULL". Assert it
  loudly here (pure parquet scan, no Spark) so a fixture change fails
  this test instead of silently shifting the oracle population.
- _video_frame_index must share _fake_decode's frame-count formula
  (one definition, _video_n_frames) so the batched path cannot desync
  from the scalar decoder.
"""

import glob
import os

import duckdb
import numpy as np
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS or ["missing"])
def test_documents_lang_non_null(sf_dir):
    if not SF_DIRS:
        pytest.skip("no testdata fixtures present")
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    n_null, n_total = duckdb.sql(
        f"SELECT COUNT(*) FILTER (lang IS NULL), COUNT(*) "
        f"FROM read_parquet('{path}')"
    ).fetchone()
    assert n_total > 0
    assert n_null == 0, (
        f"{path}: {n_null} NULL-lang documents -- classifier_train_contract's "
        "labeled population (lang == 'en' UNION lang != 'en') would drop them "
        "while the DuckDB oracle's token stream keeps them; restore the "
        "invariant or rework the contract aggregation (see queries_catalog)."
    )


def test_video_frame_formula_single_definition():
    from pg_auto_dw_spark.functions import multimodal as mm

    # the scalar decoder and the batched index must flow through the
    # same helper, for scalars and arrays alike
    for n in (0, 1, 119, 120, 121, 10**6):
        assert mm._fake_decode("video", b"x" * min(n, 4096) if n else b"")[
            "n_frames"
        ] == mm._video_n_frames(min(n, 4096) if n else 0)
    arr = np.array([0, 1, 119, 120, 121, 999999], dtype=np.int64)
    expect = np.array([mm._video_n_frames(int(v)) for v in arr], dtype=np.int64)
    assert np.array_equal(mm._video_n_frames(arr), expect)


def test_batched_kernel_chunking(monkeypatch):
    """The transient-memory chunking of the batched kernels must be
    bit-identical to the whole-batch path: force a tiny budget so
    every span splits, and compare against the unchunked results."""
    import random

    from pg_auto_dw_spark.functions import multimodal as mm

    rng = random.Random(1612)
    payloads = [
        bytes(rng.randrange(256) for _ in range(n))
        for n in (3, 7, 64, 0, 1, 2, 128, 33, 5)
    ]
    nonempty = [p for p in payloads if len(p) >= 3]
    buf, starts, lengths = mm._concat_payloads(nonempty)

    whole_grids = mm._seg_avg_grids(buf, starts, lengths, 12)
    whole_tri = mm._trigram_embeddings(nonempty, 16)
    whole_hist = mm._byte_histograms(payloads)

    monkeypatch.setattr(mm, "_KERNEL_TRANSIENT_BUDGET", 1)  # 1-row spans
    assert np.array_equal(mm._seg_avg_grids(buf, starts, lengths, 12), whole_grids)
    assert mm._trigram_embeddings(nonempty, 16) == whole_tri
    assert mm._byte_histograms(payloads) == whole_hist
    # spans respect the byte cap and always make progress
    spans = list(mm._chunk_spans(np.array([5, 5, 5, 9, 1], dtype=np.int64), 10))
    assert spans == [(0, 2), (2, 3), (3, 5)]
