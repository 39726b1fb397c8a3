"""Characterize the TPU platform: dispatch latency, HBM bandwidth, MXU FLOPs.

The axon tunnel memoizes repeated identical executions, so every timed call
varies its input (a scalar seed folded into the computation) and completion
is forced by reading back a scalar reduction. Run on the real TPU.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=8, warmup=2):
    """fn(i) -> jax scalar; varies with i to defeat memoization."""
    for i in range(warmup):
        float(fn(1000 + i))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(fn(i))  # scalar d2h forces completion
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} kind={dev.device_kind}", flush=True)

    # 0. scalar readback latency (the floor of every measurement below)
    f0 = jax.jit(lambda i: jnp.float32(i) * 2.0)
    med, mn = timeit(f0, n=20)
    print(f"scalar roundtrip: median {med*1e3:.3f} ms  min {mn*1e3:.3f} ms", flush=True)

    # 1. HBM bandwidth: sum of a big freshly-written array (write N + read N)
    for mb in (64, 256, 1024):
        words = mb * 1024 * 1024 // 4

        @jax.jit
        def f_bw(i, words=words):
            x = jnp.full((words,), jnp.float32(i))
            return x.sum()

        med, mn = timeit(f_bw)
        bw = 2 * mb / 1024 / mn
        print(f"fill+sum {mb} MB: median {med*1e3:.2f} ms  min {mn*1e3:.2f} ms  -> {bw:.0f} GB/s w+r", flush=True)

    # 2. MXU: bf16 matmul chain (8 matmuls to amortize)
    for n in (2048, 4096):
        @jax.jit
        def f_mm(i, n=n):
            a = jnp.full((n, n), jnp.bfloat16(1e-3) * i)
            for _ in range(8):
                a = (a @ a * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return a.sum()

        med, mn = timeit(f_mm, n=5)
        tflops = 8 * 2 * n**3 / mn / 1e12
        print(f"8x matmul {n}: median {med*1e3:.2f} ms  min {mn*1e3:.2f} ms  -> {tflops:.1f} TFLOP/s", flush=True)

    # 3. 150-step scan of a map-scale elementwise body (brute-force shape)
    @jax.jit
    def f_scan(i):
        big = jnp.full((2048, 1536), jnp.float32(i))

        def body(c, x):
            return c * 0.999 + x, None

        out, _ = jax.lax.scan(body, big, jnp.arange(150.0))
        return out.sum()

    med, mn = timeit(f_scan, n=5)
    print(f"150-step trivial scan over 2K map: median {med*1e3:.2f} ms  min {mn*1e3:.2f} ms  ({mn/150*1e3:.3f} ms/step)", flush=True)

    # 4. one 16-src bilinear gather at 2K (the eval's data movement, XLA take)
    @jax.jit
    def f_gather(i):
        src = jnp.full((16, 2048, 1536), jnp.float32(i))
        cy = (jnp.arange(2048 * 1536) % (2048 * 1536)).reshape(2048, 1536)
        flat = src.reshape(16, -1)
        g = flat[:, cy.reshape(-1) // 2]
        return g.sum()

    med, mn = timeit(f_gather, n=3)
    print(f"16-src flat gather 2Kmap: median {med*1e3:.2f} ms  min {mn*1e3:.2f} ms", flush=True)

    # 5. dispatch: 20 dependent jit calls of a 2K-map op (host-sequenced chain)
    f_step = jax.jit(lambda x: x * 0.9999 + 1e-6)
    x = jnp.full((2048, 1536), 0.5, jnp.float32)
    x = jax.block_until_ready(f_step(x))
    t0 = time.perf_counter()
    for _ in range(20):
        x = f_step(x)
    s = float(x.sum())
    dt = time.perf_counter() - t0
    print(f"20 host-sequenced 2K-map jit calls: {dt*1e3:.2f} ms total ({dt/20*1e3:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
