"""Cross-modal hard-negative mining (functions/multimodal.py
mine_cross_modal_negatives): captions query the media IVF index and
the close-but-wrong media come back as training negatives. Pins the
three exclusion layers -- exact positives (anti-join), near-positives
(the sentence-transformers margin guard), and byte-level near-copies
of a positive (dup-cluster exclusion, the cross-modal twist the
margin guard cannot be trusted to catch) -- plus index reuse against
a prebuilt media index and the max_negatives rank cap."""

from pg_auto_dw_spark.functions.multimodal import (
    embed_media,
    mine_cross_modal_negatives,
)
from pg_auto_dw_spark.functions.similarity import build_ivf_index
from pg_auto_dw_spark.warehouse import Warehouse

_SENTS = [
    "a red fox jumps over the lazy dog in the morning sun",
    "sails fill the harbor at dawn as fishermen haul their nets",
    "the committee approved the annual budget after long debate",
    "glaciers carve deep valleys through the ancient mountain range",
    "a violinist tunes her strings before the evening concert",
    "fresh bread cools on the rack behind the village bakery",
    "satellites trace bright arcs across the clear winter sky",
    "the librarian catalogues donated maps from the estate sale",
    "storm clouds gather slowly above the wheat fields at dusk",
    "children chase soap bubbles across the sunlit courtyard",
]


def _corpus(spark, with_copy=False):
    """10 planted pairs (media i <-> doc 100+i, caption text == media
    payload text, cosine 1 under the byte-trigram seam); optionally
    media 20 = a byte-identical copy of media 0 with NO pair row (an
    unlabeled duplicate of doc 100's positive)."""
    rows = [(i, "image", bytearray(s.encode())) for i, s in enumerate(_SENTS)]
    if with_copy:
        rows.append((20, "image", bytearray(_SENTS[0].encode())))
    media = spark.createDataFrame(
        rows, "media_id bigint, media_type string, payload binary"
    )
    pairs = spark.createDataFrame(
        [(i, 100 + i, s) for i, s in enumerate(_SENTS)],
        "media_id bigint, doc_id bigint, text string",
    )
    return media, pairs


def test_positives_excluded_and_ranked(spark, tmp_path):
    """Exact search (n_probes >= cells): every caption's own media is
    the global top hit (cosine 1) and must NOT appear as a negative;
    the mined rows are the other media, rank 1..n by cosine desc."""
    media, pairs = _corpus(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = mine_cross_modal_negatives(
        wh, pairs, media, k=5, dims=32, stride=3, n_probes=100,
        margin=None,
    ).collect()
    assert out, "exact search over 10 media must mine some negatives"
    pos = {100 + i: i for i in range(10)}
    by_doc = {}
    for r in out:
        assert r["negative_media_id"] != pos[r["doc_id"]], r
        assert r["cosine"] < 1.0
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["neg_rank"])
        assert [r["neg_rank"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True), doc


def test_margin_guard_drops_unlabeled_copy(spark, tmp_path):
    """Media 20 (byte copy of doc 100's positive, no pair row) scores
    cosine 1.0 == the reference positive score: margin=0.95 drops it
    as a probable unlabeled positive; margin=None lets it through at
    rank 1 -- the false-negative guard working end to end."""
    media, pairs = _corpus(spark, with_copy=True)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    guarded = mine_cross_modal_negatives(
        wh, pairs, media, k=5, dims=32, stride=3, n_probes=100,
        margin=0.95, index_prefix="xg",
    ).collect()
    assert all(
        not (r["doc_id"] == 100 and r["negative_media_id"] == 20)
        for r in guarded
    )
    unguarded = mine_cross_modal_negatives(
        wh, pairs, media, k=5, dims=32, stride=3, n_probes=100,
        margin=None, index_prefix="xu",
    ).collect()
    hit = [r for r in unguarded
           if r["doc_id"] == 100 and r["negative_media_id"] == 20]
    assert len(hit) == 1 and hit[0]["neg_rank"] == 1
    assert abs(hit[0]["cosine"] - 1.0) < 1e-9


def test_cluster_exclusion_beats_margin_off(spark, tmp_path):
    """With media_clusters assigning the copy to its positive's dup
    cluster, the copy is excluded even with margin=None (the layer
    for crops/transcodes that score BELOW margin x positive); media
    without an assignment row default to singleton clusters and
    survive as ordinary negatives."""
    media, pairs = _corpus(spark, with_copy=True)
    clusters = spark.createDataFrame(
        [(0, 0), (20, 0)], "media_id bigint, cluster_id bigint"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = mine_cross_modal_negatives(
        wh, pairs, media, k=5, dims=32, stride=3, n_probes=100,
        margin=None, media_clusters=clusters, index_prefix="xc",
    ).collect()
    doc100 = [r["negative_media_id"] for r in out if r["doc_id"] == 100]
    assert 20 not in doc100 and 0 not in doc100
    assert doc100, "unclustered distractors must survive for doc 100"
    # the cluster filter is scoped per query: other docs may still
    # mine media 0/20 (they are not THEIR positives' cluster mates)
    others = [r for r in out if r["doc_id"] != 100
              and r["negative_media_id"] in (0, 20)]
    assert others, "cluster exclusion must not leak to other queries"


def test_prebuilt_media_index_reuse(spark, tmp_path):
    """media_index= skips the build and mines against the existing
    index (the media_ingest_apply(embed_index=...) composition);
    results equal the fresh-build path row for row."""
    media, pairs = _corpus(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    m_emb = embed_media(media, dims=32).filter(
        "embedding is not null"
    ).selectExpr("media_id as vec_id", "embedding")
    build_ivf_index(wh, m_emb, "pre_idx", stride=3, dims=32)
    reused = mine_cross_modal_negatives(
        wh, pairs, media, k=5, dims=32, stride=3, n_probes=100,
        margin=None, media_index="pre_idx",
    ).collect()
    fresh = mine_cross_modal_negatives(
        wh, pairs, media, k=5, dims=32, stride=3, n_probes=100,
        margin=None, index_prefix="xf",
    ).collect()
    key = lambda r: (r["doc_id"], r["negative_media_id"])
    assert sorted(map(key, reused)) == sorted(map(key, fresh))


def test_max_negatives_cap(spark, tmp_path):
    """max_negatives keeps the hardest n per caption, ranks 1..n."""
    media, pairs = _corpus(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = mine_cross_modal_negatives(
        wh, pairs, media, k=6, dims=32, stride=3, n_probes=100,
        margin=None, max_negatives=2, index_prefix="xm",
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["neg_rank"])
    for doc, ranks in by_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2, doc


def test_build_contrastive_set_end_to_end(spark, tmp_path):
    """The one-call composition: curation and mining share ONE cluster
    computation -- the byte copy of media 0 collapses during curation
    AND never appears as a negative; val rows carry NULL negatives;
    train negatives are hardest-first, capped, and never the row's own
    positive."""
    from pg_auto_dw_spark.functions.multimodal import (
        build_contrastive_media_text_set,
    )

    media, pairs = _corpus(spark, with_copy=True)
    docs = pairs.selectExpr("doc_id", "text")
    links = pairs.select("media_id", "doc_id")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = build_contrastive_media_text_set(
        wh, media, docs, links,
        media_types=("image",), semantic_threshold=None,
        dims=32, stride=3, n_probes=100, k=6, n_negatives=3,
        neg_margin=None, val_fraction=0.2,
    ).collect()
    assert out
    # the copy (media 20) collapsed to canonical 0 during curation:
    # no surviving pair points at it
    assert all(r["media_id"] != 20 for r in out)
    for r in out:
        if r["split"] == "val":
            assert r["negative_media_ids"] is None
            continue
        negs = r["negative_media_ids"]
        if negs is None:
            continue
        assert len(negs) <= 3
        assert r["media_id"] not in negs
        # cluster-mates of the positive are excluded: doc 100's
        # positive is cluster {0, 20} -- neither may be mined
        if r["media_id"] == 0:
            assert 0 not in negs and 20 not in negs
    train_with_negs = [r for r in out
                       if r["split"] == "train"
                       and r["negative_media_ids"]]
    assert train_with_negs, "train rows must mine some negatives"
