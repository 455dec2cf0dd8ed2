#!/usr/bin/env python3
"""Standalone host-state probe (r16): the same two signals graft.Bench
now embeds in its artifacts — a fixed-work CPU spin and a 4 KB
fsync-latency loop on /tmp — runnable without a JVM, so a quiet window
for an official bench capture can be chosen cheaply. This VM sits on a
shared hypervisor: load average inside the guest reads ~0 while
wall-clock inflates 1.2-1.6x (r15 official artifact; the r16 morning
capture), so wall-clock probes are the only visible signal.

Reference points on this box (see SCALE.md):
  quiet:        fsync ~0.05 ms/call
  r16 morning:  fsync 0.23-0.36 ms/call -> uniform ~1.2-1.35x bench
  campaign night (worst): fsync 1.26 ms/call -> streaming lanes 3-7.5x

The python spin is not comparable to the JVM spin in the artifact
(different codegen); compare python-spin to python-spin across runs.
Calibration (r17 continuation): python spin ~2.2 s at 2^24 big-int
iterations IS this box's quiet python baseline — measured in the same
minute as the JVM probe (tools/HostProbeJvm.java) reading its 0.48 s
quiet baseline. A 2.2 s python spin means NOTHING about CPU steal;
gate on the JVM probe, whose thresholds match the artifact stamp.
"""
import os, sys, tempfile, time


def spin(iters=1 << 24):
    x = 0x9E3779B97F4A7C15
    t0 = time.perf_counter()
    for i in range(iters):
        x = ((x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF) ^ i
    return time.perf_counter() - t0, x


def fsync_ms(n=50):
    fd, path = tempfile.mkstemp(suffix=".bin", prefix="graft_probe_", dir="/tmp")
    try:
        buf = b"\0" * 4096
        t0 = time.perf_counter()
        for _ in range(n):
            os.pwrite(fd, buf, 0)
            os.fsync(fd)
        return (time.perf_counter() - t0) * 1e3 / n
    finally:
        os.close(fd)
        os.unlink(path)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for r in range(reps):
        s, _ = spin()
        f = fsync_ms()
        print(f"probe[{r}] spin_s={s:.3f} fsync_ms={f:.3f}", flush=True)
        if r + 1 < reps:
            time.sleep(2)
