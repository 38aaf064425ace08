"""Round-12 scale probe: survival family + snapshot-fold streaming.

Replication design: copy the events table 4x by USER (user_id offsets,
event_id offsets to stay unique) — every cohort's per-day event/censor
counts and risk sets scale exactly x4 while each user's own sequence is
untouched. Assertions:

* diag_kaplan_meier: survival curves IDENTICAL at 4x (the ratios are
  count-scale-free), n_risk exactly x4 — the estimator depends on the
  population only through proportions, which is the 100 TB argument:
  the lattice-bounded day x cohort relation is the same size at any
  corpus scale.
* diag_logrank_test: O, total events exactly x4; E and V x4 within the
  1e-6 quantization lattice (per-time terms quantize before the sum, so
  the x4 sums differ from 4x the 1x sums only by accumulated half-ulps
  on the lattice — bounded by #times * 1e-6).
* streaming CUSUM + Page-Hinkley: per-user state at 4x has exactly 4x
  rows, per-user values equal the 1x run's for the original users
  (state is per-key, so foreign keys cannot perturb it), and the
  3-batch drain wall stays in the same band (cost tracks batch + state,
  not history).

Run: python tools/scale_round12.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import QUERIES, load_all
from databricks_etl_pipelines_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-round12")
    load_all()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    uid_stride = 10 ** 9
    eid_stride = 10 ** 12
    rep = ev
    for r in range(1, 4):
        rep = rep.unionByName(
            ev.withColumn(
                "user_id", F.col("user_id") + F.lit(r * uid_stride)
            ).withColumn("event_id", F.col("event_id") + F.lit(r * eid_stride))
        )
    rep_dir = f"/tmp/scale_r12_events_x4_{os.getpid()}"
    rep.write.mode("overwrite").parquet(f"{rep_dir}/events.parquet")
    print(f"replicated: {n_events} -> {n_events * 4} events, "
          f"{n_users} -> {n_users * 4} users")

    # -- KM invariance ------------------------------------------------------
    t0 = time.time()
    km1 = {(r.cohort, r.t): r
           for r in QUERIES["diag_kaplan_meier"](spark, sf_dir).collect()}
    w1 = time.time() - t0
    t0 = time.time()
    km4 = {(r.cohort, r.t): r
           for r in QUERIES["diag_kaplan_meier"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    assert set(km1) == set(km4), "KM: day x cohort lattice must not grow"
    for k, a in km1.items():
        b = km4[k]
        assert b.n_risk == 4 * a.n_risk, (k, a.n_risk, b.n_risk)
        assert b.n_event == 4 * a.n_event
        assert b.survival == a.survival, (k, a.survival, b.survival)
    print(f"KM: {len(km1)} curve rows, survival x4-INVARIANT, "
          f"n_risk exactly x4; walls {w1:.1f}s -> {w4:.1f}s")

    # -- log-rank scaling ---------------------------------------------------
    lr1 = QUERIES["diag_logrank_test"](spark, sf_dir).collect()[0]
    lr4 = QUERIES["diag_logrank_test"](spark, rep_dir).collect()[0]
    assert lr4.obs_events_g1 == 4 * lr1.obs_events_g1
    assert lr4.obs_events_total == 4 * lr1.obs_events_total
    # E lives on the 1e-6 lattice and scales x4 exactly (dt*n1/nt is
    # proportion-scaled); V carries the hypergeometric finite-population
    # correction (nt-dt)/(nt-1), which is NOT scale-invariant — it
    # approaches the binomial limit as n grows, so only ~x4 holds
    assert abs(lr4.exp_events_g1 - 4 * lr1.exp_events_g1) < 1e-4
    assert 3.5 < lr4.var_logrank / lr1.var_logrank < 4.5
    print(f"log-rank: O {lr1.obs_events_g1}->{lr4.obs_events_g1} (x4 exact), "
          f"E {lr1.exp_events_g1}->{lr4.exp_events_g1} (x4 exact), "
          f"V {lr1.var_logrank}->{lr4.var_logrank} "
          f"(~x4, finite-population correction)")

    # -- streaming change detectors: per-key state isolation + flat walls ---
    for qname, keycols in (
        ("streaming_cusum_changepoint",
         ("final_cusum", "max_cusum", "alarm_index")),
        ("streaming_page_hinkley", ("ph_final", "ph_max", "alarm_index")),
    ):
        t0 = time.time()
        s1 = {r.user_id: r for r in QUERIES[qname](spark, sf_dir).collect()}
        w1 = time.time() - t0
        t0 = time.time()
        s4 = {r.user_id: r for r in QUERIES[qname](spark, rep_dir).collect()}
        w4 = time.time() - t0
        assert len(s4) == 4 * len(s1), qname
        for uid, a in s1.items():
            b = s4[uid]  # original users keep their exact state
            for c in keycols:
                assert getattr(a, c) == getattr(b, c), (qname, uid, c)
        print(f"{qname}: state rows {len(s1)} -> {len(s4)} (x4), original "
              f"users bit-identical; drain walls {w1:.1f}s -> {w4:.1f}s")

    # -- streaming KM: min/max monoid gold scales as entity state -----------
    t0 = time.time()
    sk4 = {(r.cohort, r.t): r
           for r in QUERIES["streaming_kaplan_meier"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    assert sk4.keys() == km4.keys()
    for k, a in km4.items():
        assert (sk4[k].n_risk, sk4[k].survival) == (a.n_risk, a.survival), k
    print(f"streaming KM at 4x equals batch KM at 4x row-for-row "
          f"({len(sk4)} rows, drain {w4:.1f}s)")

    import shutil

    shutil.rmtree(rep_dir, ignore_errors=True)
    print("PROBE OK")


if __name__ == "__main__":
    main()
