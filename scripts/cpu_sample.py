"""Sample whole-machine CPU utilization from /proc/stat every 2s while a
child command runs; prints a utilization timeline at the end.

Usage: python scripts/cpu_sample.py -- cmd args...
"""
import subprocess
import sys
import time


def snap():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    idle = vals[3] + vals[4]
    return sum(vals), idle


def main():
    cmd = sys.argv[sys.argv.index("--") + 1 :]
    proc = subprocess.Popen(cmd)
    samples = []
    t0, i0 = snap()
    start = time.time()
    while proc.poll() is None:
        time.sleep(2)
        t1, i1 = snap()
        dt, di = t1 - t0, i1 - i0
        busy = 100.0 * (dt - di) / dt if dt else 0.0
        samples.append((round(time.time() - start, 1), round(busy, 1)))
        t0, i0 = t1, i1
    print("CPU% timeline (t_sec, busy_pct):")
    for t, b in samples:
        print(f"  {t:7.1f}s  {b:5.1f}%")
    if samples:
        print(f"mean busy: {sum(b for _, b in samples)/len(samples):.1f}%")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
