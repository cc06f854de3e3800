"""Host-fingerprint watcher for the clean-window re-bench (VERDICT r11 next#1).

Appends one JSON line per probe to artifacts/fp_watch_r12.log: the exact
bench.py cpu_score loop (min-of-3) plus steal%% over a 10 s /proc/stat
window. A window is bench-clean when cpu_score_ms <= ~100 and
steal_pct < 0.5 (the r10 criteria pinned in BASELINE.md).
"""
import json, time, sys

def cpu_score_ms():
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)

def membw_gbps():
    """Single-thread memory-bandwidth probe (best of 3 numpy copies
    of a 256 MB array — far beyond LLC, so it measures DRAM): the
    companion to cpu_score_ms for noisy-neighbor forensics. A
    compute-bound busy loop (cpu_score) can read clean while a
    bandwidth-hungry co-tenant slows every shuffle/scan; this column
    is the tell. No historical baseline exists before round 12 —
    committed now so future rounds have one."""
    try:
        import numpy as np
    except Exception:
        return None
    a = np.empty(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    a[:] = 1.0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = a.copy()
        dt = time.perf_counter() - t0
        del b
        best = min(best, dt)
    # copy touches 2x the bytes (read + write)
    return round(2 * a.nbytes / best / 1e9, 2)


def jiff():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

def probe():
    score = cpu_score_ms()
    a = jiff(); time.sleep(10); b = jiff()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    steal = round(100.0 * d[7] / tot, 3) if len(d) > 7 and tot else None
    return {"ts": time.strftime("%H:%M:%S"), "cpu_score_ms": score,
            "steal_pct": steal, "membw_gbps": membw_gbps(),
            "clean": score <= 105 and (steal is not None and steal < 0.5)}

if __name__ == "__main__":
    interval = int(sys.argv[1]) if len(sys.argv) > 1 else 180
    path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/artifacts/fp_watch_r12.log"
    while True:
        with open(path, "a") as f:
            f.write(json.dumps(probe()) + "\n")
        time.sleep(interval)
