"""Image/audio/video-text pair assembly (functions/multimodal.py
assemble_media_text_pairs + media_dup_clusters, r13 VERDICT directive
5): deduped media canonicals joined to caption documents with both
sides' dup-cluster ids propagated for leakage-safe splitting."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.multimodal import (
    assemble_media_text_pairs,
    media_dup_clusters,
)


def _payload(seed: int, n: int = 720) -> bytes:
    return bytes((seed * 37 + i * 11 + (i * i) % 31) % 256 for i in range(n))


def _noise(seed: int, n: int = 720) -> bytes:
    # hash-stream noise: decorrelated from _payload under BOTH the
    # positional dHash grid and the trigram-histogram embedding
    import hashlib

    out = b""
    c = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{c}".encode()).digest()
        c += 1
    return out[:n]


def _edited(b: bytes, at: int = 100, span: int = 8) -> bytes:
    return b[:at] + bytes((x + 40) % 256 for x in b[at : at + span]) + b[at + span :]


def _block_swap(b: bytes) -> bytes:
    # reorders content: defeats positional dHash, caught by SemDeDup
    half = len(b) // 2
    return b[half:] + b[:half]


IMG = _payload(1)


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, t, p, None) for i, t, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )


def test_caption_follows_canonical_end_to_end(spark):
    """The composed pipeline: perceptual + semantic dedup collapses
    three copies of one image (a local re-tone AND a block-swap that
    only SemDeDup catches); captions crawled against EVERY copy attach
    to the single canonical."""
    media = _media(spark, [
        (1, "image", IMG),
        (5, "image", _edited(IMG)),        # perceptual near-dup of 1
        (7, "image", _block_swap(IMG)),    # semantic near-dup of 1
        (9, "image", _noise(50)),          # unrelated
    ])
    clusters = media_dup_clusters(media)
    assign = {r["media_id"]: r["cluster_id"] for r in clusters.collect()}
    assert assign[1] == 1 and assign[5] == 1 and assign[9] == 9
    assert assign[7] == 1  # the block swap: dHash misses it, cosine catches it

    docs = spark.createDataFrame(
        [(101, "a red fox", 9), (102, "a red fox photo", 15),
         (103, "a fox, re-cut", 13), (104, "a harbor at dawn", 16)],
        "doc_id bigint, text string, n_chars int",
    )
    links = spark.createDataFrame(
        [(1, 101), (5, 102), (7, 103), (9, 104)],
        "media_id bigint, doc_id bigint",
    )
    pairs = assemble_media_text_pairs(
        docs, links, clusters, quality_col="n_chars"
    ).collect()
    by_doc = {r["doc_id"]: r for r in pairs}
    # every caption of every copy follows canonical 1
    assert {by_doc[d]["media_id"] for d in (101, 102, 103)} == {1}
    assert by_doc[104]["media_id"] == 9
    assert by_doc[101]["quality"] == 9.0 or by_doc[101]["quality"] == 9
    # both cluster ids propagate; captions of one media share pair_group
    assert len({by_doc[d]["pair_group"] for d in (101, 102, 103)}) == 1
    assert by_doc[104]["pair_group"] != by_doc[101]["pair_group"]


def test_duplicate_caption_collapses_to_one_pair(spark):
    """Two copies of one image crawled with the SAME caption doc must
    emit ONE pair after the canonical re-point, not two."""
    media = _media(spark, [(1, "image", IMG), (5, "image", _edited(IMG))])
    clusters = media_dup_clusters(media, semantic_threshold=None)
    docs = spark.createDataFrame([(101, "a red fox", 9)],
                                 "doc_id bigint, text string, n_chars int")
    links = spark.createDataFrame([(1, 101), (5, 101)],
                                  "media_id bigint, doc_id bigint")
    pairs = assemble_media_text_pairs(docs, links, clusters).collect()
    assert len(pairs) == 1
    assert pairs[0]["media_id"] == 1 and pairs[0]["quality"] is None


def test_pair_group_spans_both_modalities(spark):
    """Split hygiene through EITHER side: media A and B are unrelated,
    but their captions are text near-dups (same text cluster) -- the
    bipartite pair_group must unite them so leakage_safe_split keeps
    every copy of the caption single-sided."""
    media = _media(spark, [(1, "image", IMG), (9, "image", _noise(50))])
    clusters = media_dup_clusters(media, semantic_threshold=None)
    docs = spark.createDataFrame(
        [(101, "a red fox jumps", 15), (102, "a red fox jumped", 16),
         (103, "a harbor at dawn", 16)],
        "doc_id bigint, text string, n_chars int",
    )
    links = spark.createDataFrame(
        [(1, 101), (9, 102), (9, 103)], "media_id bigint, doc_id bigint"
    )
    text_clusters = spark.createDataFrame(
        [(101, 101), (102, 101), (103, 103)], "doc_id bigint, cluster_id bigint"
    )
    pairs = assemble_media_text_pairs(
        docs, links, clusters, text_clusters=text_clusters
    ).collect()
    by_doc = {r["doc_id"]: r for r in pairs}
    # near-dup captions pull the two unrelated media into ONE group
    assert by_doc[101]["pair_group"] == by_doc[102]["pair_group"]
    assert by_doc[103]["pair_group"] == by_doc[102]["pair_group"]  # via media 9
    assert by_doc[101]["text_cluster"] == by_doc[102]["text_cluster"] == 101


def test_leakage_safe_split_composition(spark):
    """The downstream contract: leakage_safe_split(group_col=
    'pair_group') never separates pairs sharing a cluster on either
    side."""
    from pg_auto_dw_spark.functions.corpus import leakage_safe_split

    media = _media(spark, [
        (1, "image", IMG), (5, "image", _edited(IMG)),
        (9, "image", _noise(50)), (11, "audio", _payload(2, 650)),
    ])
    clusters = media_dup_clusters(media, semantic_threshold=None)
    docs = spark.createDataFrame(
        [(101, "caption one", 11), (102, "caption two", 11),
         (103, "caption three", 13), (104, "caption four", 12)],
        "doc_id bigint, text string, n_chars int",
    )
    links = spark.createDataFrame(
        [(1, 101), (5, 102), (9, 103), (11, 104)],
        "media_id bigint, doc_id bigint",
    )
    pairs = assemble_media_text_pairs(docs, links, clusters)
    split = leakage_safe_split(
        pairs, val_fraction=0.5, id_col="doc_id", text_col="text",
        group_col="pair_group",
    )
    joined = pairs.join(split.select("doc_id", "split"), "doc_id").collect()
    sides = {}
    for r in joined:
        sides.setdefault(r["pair_group"], set()).add(r["split"])
    assert all(len(s) == 1 for s in sides.values()), sides


def test_alignment_scoring_and_filter(spark):
    """CLIP-style alignment over assembled pairs: a caption that IS
    the media's content scores 1.0 (shared encoder seam, identical
    trigram vectors); an unrelated caption scores lower; the filter
    keeps only aligned pairs and drops unscorable ones."""
    from pg_auto_dw_spark.functions.multimodal import (
        score_media_text_alignment,
    )

    fox = "a red fox jumps over the lazy dog in the morning sun"
    market = "quarterly earnings at the exchange beat analyst forecasts"
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(fox.encode()), None),
            (2, "image", bytearray(market.encode()), None),
            (3, "image", bytearray(b"ab"), None),  # sub-trigram: NULL embed
        ],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    pairs = spark.createDataFrame(
        [
            (1, 101, fox),        # caption == content -> alignment 1.0
            (1, 102, market),     # mismatched caption
            (2, 103, market),     # aligned
            (3, 104, fox),        # unscorable media
        ],
        "media_id bigint, doc_id bigint, text string",
    )
    scored = {
        r["doc_id"]: r["alignment"]
        for r in score_media_text_alignment(pairs, media).collect()
    }
    assert abs(scored[101] - 1.0) < 1e-12
    assert abs(scored[103] - 1.0) < 1e-12
    assert scored[102] < 0.9
    assert scored[104] is None
    kept = {
        r["doc_id"]
        for r in score_media_text_alignment(
            pairs, media, min_alignment=0.95
        ).collect()
    }
    assert kept == {101, 103}


def test_assembly_invariants_vs_union_find_reference(spark):
    """Randomized scenario (seeded) checked against a pure-Python
    union-find model: (1) every link's media re-points to its
    cluster's canonical, (2) pair_group partitions pairs exactly like
    the bipartite components of the (media_cluster, text_cluster)
    graph -- two pairs land in one group iff connected through any
    chain of shared clusters."""
    import random

    rng = random.Random(20260816)
    n_media, n_docs = 40, 60
    # random media clustering: each media points at a uniformly chosen
    # smaller-or-equal id's cluster (generates chains the CC must fold)
    parent = {}
    for m in range(n_media):
        parent[m] = m if m == 0 or rng.random() < 0.6 else rng.randrange(m)

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    clusters = [(m, find(m)) for m in range(n_media)]
    text_clusters = [(d, d - d % 3 + 100) for d in range(100, 100 + n_docs)]
    # sparse LOCAL links so the bipartite graph has several components
    # (dense uniform links collapse to one group and the
    # distinct-groups half of the assertion goes vacuous -- measured:
    # this seed yields 9 components over 31 re-pointed pairs)
    links = []
    for _ in range(35):
        m = rng.randrange(n_media)
        d = 100 + min(n_docs - 1, (m * 3 // 2) + rng.randrange(4))
        links.append((m, d))
    docs = [(100 + d, f"caption {d}", d) for d in range(n_docs)]

    from pg_auto_dw_spark.functions.multimodal import assemble_media_text_pairs

    out = assemble_media_text_pairs(
        spark.createDataFrame(docs, "doc_id bigint, text string, n_chars int"),
        spark.createDataFrame(links, "media_id bigint, doc_id bigint"),
        spark.createDataFrame(clusters, "media_id bigint, cluster_id bigint"),
        text_clusters=spark.createDataFrame(
            text_clusters, "doc_id bigint, cluster_id bigint"
        ),
        quality_col="n_chars",
    ).collect()

    # reference: re-point + bipartite union-find over cluster nodes
    canon = dict(clusters)
    tcl = dict(text_clusters)
    expect_pairs = {(canon[m], d) for m, d in links}
    got_pairs = {(r["media_id"], r["doc_id"]) for r in out}
    assert got_pairs == expect_pairs

    uf = {}

    def ufind(x):
        uf.setdefault(x, x)
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = uf[x]
        return x

    def union(a, b):
        ra, rb = ufind(a), ufind(b)
        if ra != rb:
            uf[max(ra, rb)] = min(ra, rb)

    for m, d in expect_pairs:
        union(("m", m), ("t", tcl[d]))
    by_pair_group = {}
    for r in out:
        by_pair_group.setdefault(r["pair_group"], set()).add(
            ufind(("m", r["media_cluster"]))
        )
    # each Spark group maps to exactly one reference component...
    assert all(len(roots) == 1 for roots in by_pair_group.values())
    # ...and distinct Spark groups map to distinct components
    flat = [next(iter(roots)) for roots in by_pair_group.values()]
    assert len(flat) == len(set(flat))


def test_media_dup_clusters_empty_types_all_singletons(spark):
    """r14 review: media_types=() with semantic off must yield all
    singleton clusters (the docstring contract), not IndexError; with
    semantic ON it is the SemDeDup-only assignment."""
    media = _media(spark, [
        (1, "image", IMG), (5, "image", _edited(IMG)),
    ])
    singles = {
        r["media_id"]: r["cluster_id"]
        for r in media_dup_clusters(
            media, media_types=(), semantic_threshold=None
        ).collect()
    }
    assert singles == {1: 1, 5: 5}
    semantic_only = {
        r["media_id"]: r["cluster_id"]
        for r in media_dup_clusters(
            media, media_types=(), semantic_threshold=0.95
        ).collect()
    }
    assert semantic_only == {1: 1, 5: 1}  # the re-tone is cosine-close


def test_curation_facade_end_to_end(spark):
    """The one-call chain: dedup collapses copies, captions follow the
    canonical, the misaligned pair drops at the CLIP gate, and every
    pair group lands single-sided."""
    from pg_auto_dw_spark.functions.multimodal import (
        curate_media_text_corpus,
    )

    fox = "a red fox jumps over the lazy dog in the morning sun"
    harbor = "sails fill the harbor at dawn as fishermen haul their nets"
    media = _media(spark, [
        (1, "image", fox.encode()),
        (5, "image", _edited(fox.encode())),   # near-dup of 1
        (9, "image", harbor.encode()),
    ])
    docs = spark.createDataFrame(
        [(101, fox, 9), (102, fox, 9), (103, harbor, 9), (104, fox, 9)],
        "doc_id bigint, text string, n_chars int",
    )
    links = spark.createDataFrame(
        [(1, 101), (5, 102), (9, 103), (9, 104)],  # 104: misaligned caption
        "media_id bigint, doc_id bigint",
    )
    out = curate_media_text_corpus(
        media, docs, links, quality_col="n_chars", min_alignment=0.95,
    ).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # 104 (fox caption on the harbor image) fails the alignment gate
    assert set(by_doc) == {101, 102, 103}
    # captions of both fox copies follow canonical 1
    assert by_doc[101]["media_id"] == 1 and by_doc[102]["media_id"] == 1
    assert abs(by_doc[101]["alignment"] - 1.0) < 1e-12
    # split: one side per pair group
    sides = {}
    for r in out:
        sides.setdefault(r["pair_group"], set()).add(r["split"])
    assert all(len(s) == 1 for s in sides.values())


def test_facade_text_clusters_passthrough(spark):
    """r14 ADVICE: without text_clusters, near-dup captions under
    different doc_ids on UNRELATED media default to per-doc text
    clusters and can split apart; supplying text_clusters through the
    facade fuses their pair groups so the split keeps them one-sided."""
    from pg_auto_dw_spark.functions.multimodal import (
        curate_media_text_corpus,
    )

    fox = "a red fox jumps over the lazy dog in the morning sun"
    harbor = "sails fill the harbor at dawn as fishermen haul their nets"
    media = _media(spark, [
        (1, "image", fox.encode()),
        (9, "image", harbor.encode()),  # unrelated to 1
    ])
    # two docs, SAME caption text, one per unrelated media
    docs = spark.createDataFrame(
        [(201, fox, 9), (202, fox, 9)],
        "doc_id bigint, text string, n_chars int",
    )
    links = spark.createDataFrame(
        [(1, 201), (9, 202)], "media_id bigint, doc_id bigint",
    )

    def groups(tc):
        out = curate_media_text_corpus(
            media, docs, links, min_alignment=None, text_clusters=tc,
        ).collect()
        return {r["doc_id"]: r["pair_group"] for r in out}

    # default: per-doc text clusters -> the identical captions sit in
    # DIFFERENT pair groups (the documented leakage channel)
    g = groups(None)
    assert g[201] != g[202]
    # with the text side's dup clusters supplied, the channel closes
    tc = spark.createDataFrame(
        [(201, 201), (202, 201)], "doc_id bigint, cluster_id bigint",
    )
    g = groups(tc)
    assert g[201] == g[202]


def test_text_zone_clusters_feed_assembly(spark, tmp_path):
    """r15: the MinHash text zone's lineage serves text_clusters the
    same way the media zone serves media_clusters -- near-dup captions
    under different doc_ids on UNRELATED media land in one pair_group
    without a corpus-scale re-cluster (the r14 ADVICE channel, closed
    from zone state)."""
    from pg_auto_dw_spark.functions.multimodal import (
        assemble_media_text_pairs,
    )
    from pg_auto_dw_spark.streaming.jobs import (
        neardup_ingest_apply,
        text_zone_cluster_assignments,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    base = (
        "the quick brown fox jumps over the lazy dog while the river "
        "runs quietly past the old mill and the miller watches the "
        "wheel turn slowly in the afternoon sun as travelers pass"
    )
    near = base.replace("afternoon sun", "evening light")
    other = (
        "stock markets rallied sharply today as investors cheered "
        "strong quarterly earnings reports from the largest technology "
        "companies and central banks signalled steady policy ahead"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id bigint, text string"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(wh, "c.docs", docs, dupes_table="c.dupes")
    tc = text_zone_cluster_assignments(wh, "c.docs", "c.dupes")
    got = {r["doc_id"]: r["cluster_id"] for r in tc.collect()}
    assert got == {1: 1, 2: 1, 3: 3}  # near-dup 2 points at survivor 1
    # two UNRELATED media, each captioned by one of the near-dup docs
    clusters = spark.createDataFrame(
        [(10, 10), (20, 20)], "media_id bigint, cluster_id bigint"
    )
    links = spark.createDataFrame(
        [(10, 1), (20, 2)], "media_id bigint, doc_id bigint"
    )
    pairs = assemble_media_text_pairs(docs, links, clusters, text_clusters=tc)
    groups = {r["doc_id"]: r["pair_group"] for r in pairs.collect()}
    assert groups[1] == groups[2]  # one group through the text side
