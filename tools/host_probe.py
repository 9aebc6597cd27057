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
# Membw admissibility line (round-12 calibration, SURVEY §6): across the 10
# bracketed sf0.1 runs accumulated over rounds 11-12 (multiple boots), every
# healthy-total run has max(membw_before, membw_after) >= 1.75e10, while the
# one degraded window in the series (the r11 driver run — worst total of 20,
# LSH rows 1.4-1.7x inflated) read 1.58/1.66e10, bracket max 1.66e10. The
# rule is on the BRACKET MAX, not min: one-sided dips to 1.35e10 occur
# inside healthy runs (transient), so a single low reading only warns — a
# window whose BOTH ends read low is the degraded signature.
HEALTHY_MEMBW = 1.7e10
import multiprocessing as mp
import os
import sys
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
# evidence alongside aggregate; since round 12 it is ALSO an admissibility
# leg (HEALTHY_MEMBW above — bracket-max rule, calibrated on the 10-run
# series). Measured as WALL-CLOCK of the whole concurrent pass
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


def measure_membw():
    """One membw reading in the series' calibrated units (8×256 MiB
    concurrent copy). MEDIAN of 3 timed passes after a warm-up pass:
    round-12 measurement found single-pass readings fluctuate ±25% even
    within one host window (8 consecutive passes in a warm process read
    1.57-2.12e10), so one pass conflates probe noise with the
    window-level signal the channel exists to detect. The median of the
    same quantity has the same center as the historical single-pass
    series, so the round-11 calibration brackets stay comparable.
    Shared by the full probe and --membw mode so per-sample readings are
    directly comparable to the run brackets."""
    ncpu = os.cpu_count() or 1
    nbw = min(8, ncpu)
    with mp.Pool(nbw, initializer=bw_init) as pool:
        pool.map(bw_copy, range(nbw))  # warm-up: spawn skew + page faults
        rates = []
        for _ in range(3):
            t0 = time.time()
            pool.map(bw_copy, range(nbw))
            rates.append(nbw * 2 * MEMBW_BYTES / (time.time() - t0))
        return sorted(rates)[1]


def main():
    # --membw: membw-only mode for the per-sample channel (round-12,
    # r11 verdict #1: the run-level bracket is end-of-run only, so a
    # mid-run bandwidth dip — the r11 36.4 s minhash first sample — was
    # unattributable from the artifact). graft.Bench shells this out
    # before each sample of the block-manager-heavy queries; identical
    # probe shape keeps the reading in the calibrated units.
    if "--membw" in sys.argv[1:]:
        print(f"membw={measure_membw():.3g} B/s")
        return

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
    bw = measure_membw()

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
    if bw < HEALTHY_MEMBW:
        print(f"MEMBW-LOW: {bw:.3g} B/s below the calibrated {HEALTHY_MEMBW:.3g} "
              "line — a single low reading is only a warning (one-sided dips "
              "to 1.35e10 occur inside healthy runs); a run whose BOTH "
              "bracketing probes read low is bandwidth-degraded and its "
              "block-manager-heavy rows (LSH family) are inadmissible")


if __name__ == "__main__":
    main()
