#!/usr/bin/env python3
"""Host health probe — run BEFORE graft.Bench to decide if a bench reading
will be evidence or noise (SURVEY §6, round-8 "progressive host throttling"
entry: repeated 32-thread burns degrade the host's multi-core capacity by up
to ~1.5x within a session, recovering with idle time).

Prints single-thread and all-core throughput for a fixed workload. This VM
class has 32 full cores (no SMT — lscpu verified), so a healthy host should
read per-cpu-under-load close to the single-thread figure. Reference
readings (round 8): single ~1.7e7 it/s; DIRECTLY AFTER six bench runs the
per-cpu/single ratio measured 0.44-0.52 — i.e. the host was serving roughly
half its nominal multi-core capacity, matching the observed 55.7 -> 87.0 s
bench total drift. If the ratio reads below ~0.5, wait for an idle recovery
window instead of benching.
"""
import multiprocessing as mp
import os
import time

N = 5_000_000


def burn(_):
    s = 0
    for i in range(N):
        s += i * i
    return s


def main():
    t0 = time.time()
    burn(0)
    single = N / (time.time() - t0)

    ncpu = os.cpu_count() or 1
    with mp.Pool(ncpu) as pool:
        t0 = time.time()
        pool.map(burn, range(ncpu))
        agg = N * ncpu / (time.time() - t0)

    per_cpu = agg / ncpu
    print(f"cpus={ncpu} single={single:.3g} it/s "
          f"all-core aggregate={agg:.3g} it/s per-cpu={per_cpu:.3g} it/s "
          f"ratio={per_cpu / single:.2f}")
    if per_cpu < 0.5 * single:
        print("THROTTLED: per-cpu under load < 50% of single-thread — "
              "do not trust a bench taken now")
    else:
        print("OK: multi-core capacity looks healthy")


if __name__ == "__main__":
    main()
