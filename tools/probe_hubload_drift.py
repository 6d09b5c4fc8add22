"""Root-cause probe for the r9 driver-bench drift on
hub_load_lineitem_composite (r9 VERDICT directive 4).

The query is STATELESS staging (scan lineitem -> render parts ->
dropDuplicates -> count; no warehouse scratch), so the verdict's
scratch-accumulation hypothesis cannot apply. The remaining candidate
mechanisms, each isolated in its own FRESH JVM via subprocess:

  phase A  baseline: warmup + 10 measured reps, nothing else in the
           session. The distribution here is the query's true cost +
           vintage noise.
  phase B  driver-order simulation: run the full correctness pass
           shape first (every catalog query executed at sf0.01 with a
           driver-style collect), then the same warmup + 10 reps at
           sf0.1 -- the "correctness + bench share one JVM" hypothesis.
  phase C  neighbor simulation: run only the two bench predecessors
           (hub_load_customer, sat_load_customer warm + 3 reps each,
           per HEADLINE order) first -- the narrow run-order
           hypothesis.

Each phase prints median/min/max and the jvm_compute_ms calibration
(the 200M-row codegen sum bench.py records) so a slow-JVM vintage is
visible next to any degradation.

Usage: python tools/probe_hubload_drift.py [phase_a|phase_b|phase_c]
With no arg, runs all three as subprocesses and prints the table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"
TARGETS = ["hub_load_lineitem_composite", "sat_load_customer"]


def calibrate(spark) -> float:
    runs = []
    for _ in range(5):
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
        runs.append((time.time() - t0) * 1000.0)
    return round(sorted(runs)[len(runs) // 2], 1)


def measure(spark, qmap, name: str, n_reps: int = 10) -> list[float]:
    import gc

    qmap[name](spark, SF01).count()  # warmup
    runs = []
    for _ in range(n_reps):
        t0 = time.time()
        qmap[name](spark, SF01).count()
        runs.append(round(time.time() - t0, 3))
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return runs


def run_phase(phase: str) -> None:
    from pg_auto_dw_spark import queries_catalog
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark(f"probe_{phase}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qmap = queries_catalog.bench_queries()
    pre_cal = calibrate(spark)

    if phase == "phase_b":
        n_ok = 0
        for name, fn in queries_catalog.queries().items():
            try:
                fn(spark, SF001).collect()
                n_ok += 1
            except Exception:
                pass
        print(f"# correctness-shape pass: {n_ok} queries collected at sf0.01",
              file=sys.stderr)
    elif phase == "phase_c":
        for name in ["hub_load_customer", "sat_load_customer"]:
            qmap[name](spark, SF01).count()
            for _ in range(3):
                qmap[name](spark, SF01).count()

    out = {"phase": phase, "jvm_compute_ms_pre": pre_cal}
    for t in TARGETS:
        out[t] = measure(spark, qmap, t)
    out["jvm_compute_ms_post"] = calibrate(spark)
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1:
        run_phase(sys.argv[1])
        return
    for phase in ["phase_a", "phase_b", "phase_c"]:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), phase],
            capture_output=True, text=True,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"{phase}: FAILED\n{r.stderr[-2000:]}")
            continue
        d = json.loads(line[-1])
        for t in TARGETS:
            runs = sorted(d[t])
            print(
                f"{phase:8s} {t:32s} median={runs[len(runs)//2]:.3f} "
                f"min={runs[0]:.3f} max={runs[-1]:.3f} "
                f"jvm_ms pre/post={d['jvm_compute_ms_pre']}/{d['jvm_compute_ms_post']}"
            )


if __name__ == "__main__":
    main()
