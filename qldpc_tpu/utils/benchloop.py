"""Shared pipelined throughput-measurement loop for the benchmarks.

One implementation of the methodology bench.py, scripts/maxiter_sweep.py
and scripts/multicode_bench.py previously each hand-rolled: keep `depth`
rounds in flight (the TPU transport's fixed per-dispatch latency is hidden
by pipelining), align every timing window to a round completion so work
carried over from before its start is never credited to it, and take the
best of `windows` windows — the shared tunneled chip's throughput drifts
run-to-run (CLAUDE.md), and the best window is the closest estimate of the
chip's actual capability.

device_get (not block_until_ready) every round: the remote-TPU backend's
block_until_ready has been observed to return before the computation
finishes, inflating throughput ~500x; materializing the outputs guarantees
honest timing.
"""
from __future__ import annotations

import time
from collections import deque
from typing import Callable, Optional, Tuple

import jax


def timed_windows(launch: Callable, shots_per_round: int, *,
                  windows: int = 3, seconds: float = 8.0, depth: int = 2,
                  min_rounds: int = 3,
                  on_round: Optional[Callable] = None) -> Tuple[float, int]:
    """Best-of-`windows` pipelined throughput measurement.

    Args:
      launch: launch(i) -> the in-flight device computation for round i
        (the caller folds its own key / arguments).
      shots_per_round: decoded shots per fetched round (for the rate).
      on_round: optional callback receiving every fetched round's host
        values (warmup/alignment rounds included).

    Returns (best_shots_per_sec, total_rounds_fetched).
    """
    inflight: deque = deque()
    launched = 0
    fetched = 0

    def pump():
        nonlocal launched
        while len(inflight) < depth:
            inflight.append(launch(launched))
            launched += 1

    def fetch():
        nonlocal fetched
        out = jax.device_get(inflight.popleft())
        fetched += 1
        if on_round is not None:
            on_round(out)
        return out

    pump()
    fetch()  # first fetch carries the compile; never timed
    rates = []
    for _ in range(windows):
        pump()
        fetch()  # align the window start to a round boundary
        t0 = time.time()
        rounds = 0
        while time.time() - t0 < seconds or rounds < min_rounds:
            pump()
            fetch()
            rounds += 1
        rates.append(rounds * shots_per_round / (time.time() - t0))
    return max(rates), fetched
