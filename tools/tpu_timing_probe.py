#!/usr/bin/env python
"""Calibrate real device timing through the axon relay.

block_until_ready does not actually block on this tunnel; only a
device->host fetch forces completion.  This probe times (a) a trivial
scalar fetch, (b) a 100-iter chained 4k bf16 matmul loop, and derives
per-matmul time / achieved TFLOP/s.
"""

import time

import jax
import jax.numpy as jnp


def timed_fetch(f, a, n=5, label=""):
    t0 = time.perf_counter()
    v = float(f(a))
    compile_and_first = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        v = float(f(a))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label}: first(comp) {compile_and_first:.1f}s, best-of-{n} {best*1000:.2f} ms", flush=True)
    return best


def main():
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    trivial = jax.jit(lambda a: a[0, 0] * 1.0)
    t_triv = timed_fetch(trivial, a, label="trivial fetch")

    def chain(a):
        def body(i, x):
            return (x @ a) * 0.001
        return jax.lax.fori_loop(0, 100, body, a)[0, 0]

    chained = jax.jit(chain)
    t_chain = timed_fetch(chained, a, label="100x 4k-matmul chain")

    per = (t_chain - t_triv) / 100
    tflops = 2 * 4096**3 / max(per, 1e-9) / 1e12
    print(f"per-matmul: {per*1000:.3f} ms -> {tflops:.1f} TFLOP/s (v5e peak ~394)", flush=True)


if __name__ == "__main__":
    main()
