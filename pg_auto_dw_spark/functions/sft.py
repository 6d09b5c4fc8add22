"""SFT conversation assembly: turn a turn-grain table into rendered
training documents with per-turn LOSS-MASK spans -- the
instruction-tuning twin of ``corpus.pack_sequences`` (packing places
documents into sequences; this renders conversations into documents,
and the spans say which characters the loss applies to).

Everything is built-ins over one groupBy(conversation): sorted struct
collect, template concat, cumulative offsets -- pure string/integer
math, cross-engine exact (r12 oracle candidate), no Python in the
plan. Reference analog: none; additive LLM-pipeline surface.

Scale shape: ONE shuffle on the conversation key; per-group state is
the conversation's turns (conversations are KB-scale by nature -- a
pathological million-turn conversation is a data bug, and the
``max_turns`` guard fails loudly instead of silently materializing
it). Offsets are computed from the SAME rendered pieces as the text,
so text and spans cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the pinned minimal chat template: <|role|>\ncontent\n per turn.
# Deliberately simple and FROZEN -- the span math depends only on
# rendered piece lengths, so swapping templates is a rendering change,
# not a logic change.
_PREFIX = "<|{role}|>\n"
_SUFFIX = "\n"


def _piece(role_col, content_col):
    """Rendered text of one turn under the pinned template."""
    return F.concat(
        F.lit("<|"), role_col, F.lit("|>\n"),
        F.coalesce(content_col, F.lit("")),
        F.lit(_SUFFIX),
    )


def render_chat(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    loss_roles: tuple[str, ...] = ("assistant",),
    max_turns: int = 4096,
) -> DataFrame:
    """One row per conversation: (conv_id, text, n_turns, n_chars,
    spans) where ``spans`` is an array of structs (turn_idx, role,
    start, end, trainable) -- 0-based character offsets of each turn's
    CONTENT (template markers excluded) in the rendered ``text``, and
    ``trainable`` marks the roles the loss applies to (``loss_roles``,
    default assistant-only -- the standard SFT masking).

    Turns render in ``idx_col`` order (ties broken by role then
    content so the output is total-order deterministic); NULL content
    renders empty but keeps its span (zero-width). A NULL ROLE fails
    loudly (same posture as ``max_turns``): array_join would silently
    drop the turn's text while the running-offset aggregate went NULL,
    corrupting every later span with no error (r10 ADVICE). A
    conversation exceeding ``max_turns`` fails loudly -- a silent
    giant group would concentrate one task and usually signals a bad
    conversation key."""
    piece = _piece(F.col("s.role"), F.col("s.content"))
    role_guarded = F.when(
        F.col(role_col).isNotNull(), F.col(role_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("render_chat: NULL role in conversation "),
                F.col(conv_col).cast("string"),
                F.lit(" at turn "),
                F.coalesce(F.col(idx_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    collected = (
        turns.select(
            F.col(conv_col).alias("conv_id"),
            F.struct(
                F.col(idx_col).alias("idx"),
                role_guarded.alias("role"),
                F.col(content_col).alias("content"),
            ).alias("t"),
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("t")).alias("ts"))
    )
    guarded = collected.withColumn(
        "ts",
        F.when(F.size("ts") <= max_turns, F.col("ts")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("render_chat: conversation "),
                    F.col("conv_id").cast("string"),
                    F.lit(f" exceeds max_turns={max_turns}"),
                )
            )
        ),
    )
    # per-turn rendered pieces + the content offset inside each piece
    pieces = guarded.withColumn(
        "ps",
        F.transform(
            "ts",
            lambda s: F.struct(
                s["idx"].alias("idx"),
                s["role"].alias("role"),
                _piece(s["role"], s["content"]).alias("piece"),
                # content starts after "<|" + role + "|>\n" = len+5
                (F.length(s["role"]) + F.lit(5)).alias("head"),
                F.length(F.coalesce(s["content"], F.lit(""))).alias("clen"),
            ),
        ),
    )
    # cumulative piece offsets via aggregate (running sum, exact)
    spans = F.expr(
        """
        aggregate(
            ps,
            struct(CAST(0 AS BIGINT) AS off, CAST(array() AS
                   array<struct<turn_idx:bigint,role:string,
                                start:bigint,end:bigint>>) AS acc),
            (st, p) -> struct(
                st.off + length(p.piece) AS off,
                array_append(st.acc, struct(
                    CAST(p.idx AS BIGINT) AS turn_idx,
                    p.role AS role,
                    st.off + p.head AS start,
                    st.off + p.head + p.clen AS end)) AS acc),
            st -> st.acc)
        """
    )
    loss_set = F.array(*[F.lit(r) for r in loss_roles])
    return pieces.select(
        "conv_id",
        F.array_join(F.transform("ps", lambda p: p["piece"]), "").alias("text"),
        F.size("ps").cast("bigint").alias("n_turns"),
        spans.alias("__spans"),
    ).select(
        "conv_id",
        "text",
        "n_turns",
        F.length("text").cast("bigint").alias("n_chars"),
        F.transform(
            "__spans",
            lambda s: F.struct(
                s["turn_idx"].alias("turn_idx"),
                s["role"].alias("role"),
                s["start"].alias("start"),
                s["end"].alias("end"),
                F.array_contains(loss_set, s["role"]).alias("trainable"),
            ),
        ).alias("spans"),
    )


def trainable_char_stats(rendered: DataFrame) -> DataFrame:
    """Per-conversation loss-coverage audit over ``render_chat``
    output: (conv_id, n_chars, trainable_chars, trainable_pct_e4) --
    the "how much of each training document actually receives loss"
    number an SFT mix is balanced on. Map-only over the spans array."""
    trainable = F.aggregate(
        F.filter("spans", lambda s: s["trainable"]),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc + (s["end"] - s["start"]),
    )
    # bind the span aggregate once: referenced by both output columns,
    # and an interpreted HOF re-evaluates per reference (r16, the
    # expression-binding pass)
    return rendered.withColumn("__tr", trainable).select(
        "conv_id",
        "n_chars",
        F.col("__tr").alias("trainable_chars"),
        (F.col("__tr") * 10000 / F.greatest(F.col("n_chars"), F.lit(1)))
        .cast("bigint")
        .alias("trainable_pct_e4"),
    )
