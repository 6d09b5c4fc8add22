"""10x scale probe for train_linear_classifier: per-iteration cost
must track the labeled training-sample size (one broadcast join + two
rollups per pass over the PINNED feature matrix; the model side is
always <= buckets rows).

Usage: python tools/scale_probe_classifier.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB_POS = ["w%dgood" % i for i in range(200)]
VOCAB_NEG = ["w%dbad" % i for i in range(200)]


def docs(spark, vocab, n, offset):
    words = F.array(*[F.lit(w) for w in vocab])
    return spark.range(n).select(
        (F.col("id") + offset).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.element_at(
                    words, (F.pmod(F.xxhash64(F.col("id") + i), F.lit(len(vocab))) + 1).cast("int")
                )
                for i in range(12)
            ],
        ).alias("text"),
    )


def main() -> None:
    from pg_auto_dw_spark.functions.selection import train_linear_classifier
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark("scale-probe-classifier")
    print(f"{'train_docs':>11}{'iters':>6}{'median':>9}{'final_loss':>12}")
    for n in (2_000, 20_000):
        pos = docs(spark, VOCAB_POS, n, 0).localCheckpoint(eager=True)
        neg = docs(spark, VOCAB_NEG, n, 10_000_000).localCheckpoint(eager=True)
        runs, losses = [], None
        for _ in range(3):
            t0 = time.time()
            _, losses = train_linear_classifier(
                pos, neg, buckets=4096, iters=5, lr=8.0
            )
            runs.append(time.time() - t0)
        print(
            f"{2 * n:>11}{5:>6}{sorted(runs)[1]:>8.2f}s{losses[-1]:>12.4f}"
        )


if __name__ == "__main__":
    main()
