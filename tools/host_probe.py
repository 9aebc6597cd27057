#!/usr/bin/env python3
"""Host health probe — run BEFORE and AFTER graft.Bench to decide if a bench
reading will be evidence or noise (SURVEY §6 host-capacity entry: capacity
varies EXTERNALLY and NOT monotonically — the round-8 series falsified the
idle-recovery hypothesis: probe ratios kept sliding through 40 fully-idle
minutes, then capacity returned as suddenly as it left, uncorrelated with
anything this VM did. Neither idling nor any local action restores
capacity on a schedule; the bracketing probes are the only admissibility
signal for a bench reading).

Prints single-thread and all-core throughput for a fixed workload. This VM
class has 32 full cores (no SMT — lscpu verified). Calibration from the
round-8 probe series: the AGGREGATE figure is the primary signal —
~2.7-3.0e8 it/s brackets produced the session's best, mutually-agreeing
bench runs (52.5-57 s totals), while the degraded window that yielded an
87 s total on identical code read 0.66-1.06e8 aggregate (and single-thread
sank to 9e6). The per-cpu/single ratio plateaus at ~0.45-0.52 even when
healthy (memory-bandwidth bound under full load), so judge health by
aggregate first: >= 2.5e8 healthy, <= 1.5e8 do not bench.
"""
HEALTHY_AGG = 2.5e8
BAD_AGG = 1.5e8
import multiprocessing as mp
import os
import time

N = 5_000_000


def burn(_):
    s = 0
    for i in range(N):
        s += i * i
    return s


# Memory-bandwidth leg (round 11): the r10 driver window inflated ONLY
# the block-manager-heavy LSH family (persist + localCheckpoint + block
# frees) while every CPU-shaped row held 1.0x under a HEALTHY arithmetic
# bracket — the arithmetic loop cannot see memory/copy capacity, which is
# the dimension those queries stress. Aggregate B/s reported. Recorded as
# evidence alongside aggregate; NOT yet an admissibility gate (calibration
# series too short). Measured as WALL-CLOCK of the whole concurrent pass
# over PRE-ALLOCATED per-process buffers (round-11 review: summing
# per-worker rates over partially-overlapping windows systematically
# overstates bandwidth — the same reason `agg` divides by the pool's wall
# time; a warm-up pass absorbs page-fault and pool-spawn skew).
MEMBW_BYTES = 256 * 1024 * 1024
_BW_BUF = None


def bw_init():
    global _BW_BUF
    _BW_BUF = bytearray(MEMBW_BYTES)
    _BW_BUF[::4096] = b"\x01" * len(_BW_BUF[::4096])  # fault every page in


def bw_copy(_):
    dst = bytes(_BW_BUF)  # one full copy: read 256 MiB + write 256 MiB
    return len(dst)


def main():
    t0 = time.time()
    burn(0)
    single = N / (time.time() - t0)

    ncpu = os.cpu_count() or 1
    with mp.Pool(ncpu) as pool:
        t0 = time.time()
        pool.map(burn, range(ncpu))
        agg = N * ncpu / (time.time() - t0)

    # 8 concurrent copy workers ~ the shuffle/checkpoint write concurrency
    # a 32-thread local bench actually sustains; full-ncpu fan-out would
    # measure allocator contention more than bandwidth.
    nbw = min(8, ncpu)
    with mp.Pool(nbw, initializer=bw_init) as pool:
        pool.map(bw_copy, range(nbw))  # warm-up: spawn skew + page faults
        t0 = time.time()
        pool.map(bw_copy, range(nbw))
        bw = nbw * 2 * MEMBW_BYTES / (time.time() - t0)

    per_cpu = agg / ncpu
    print(f"cpus={ncpu} single={single:.3g} it/s "
          f"all-core aggregate={agg:.3g} it/s per-cpu={per_cpu:.3g} it/s "
          f"ratio={per_cpu / single:.2f} membw={bw:.3g} B/s")
    if agg >= HEALTHY_AGG:
        print("OK: multi-core capacity at the calibrated healthy level")
    elif agg <= BAD_AGG:
        print("THROTTLED: aggregate well below the calibrated healthy "
              "level — do not trust a bench taken now")
    else:
        print("MARGINAL: between calibrated levels — bench only if "
              "bracketing probes agree")


if __name__ == "__main__":
    main()
