"""The shared pipelined measurement loop used by all benchmarks."""
import jax
import jax.numpy as jnp

from qldpc_tpu.utils.benchloop import timed_windows


def test_timed_windows_counts_and_rate():
    calls = []

    @jax.jit
    def round_fn(i):
        return {"x": jnp.full((4,), i, jnp.int32)}

    rate, fetched = timed_windows(
        lambda i: round_fn(jnp.int32(i)), shots_per_round=4,
        windows=2, seconds=0.0, min_rounds=2,
        on_round=lambda out: calls.append(int(out["x"][0])))
    assert rate > 0
    # 1 compile fetch + per window (1 align + >=2 timed)
    assert fetched >= 1 + 2 * 3
    assert fetched == len(calls)
    # rounds are fetched in launch order (the pipeline preserves ordering)
    assert calls == sorted(calls)
