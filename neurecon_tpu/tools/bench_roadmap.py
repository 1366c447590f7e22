"""Measured verdicts for the round-2 optimization-roadmap items 3-4
(docs/performance.md): (a) pad the radiance input 289->384 to MXU column
boundaries; (b) overlap the gradient-free upsampler with the previous step's
backward.

Both are *bounded* here by direct hardware probes before any restructuring:

(a) If a [N,289]@[289,W] matmul costs the same as [N,384]@[384,W], the MXU
    already tiles K=289 up to 384 internally and explicit padding cannot win.

(b) A TPU core runs one fused program; overlap of two independent compute
    blocks is only possible if XLA's scheduler interleaves them. If a program
    computing two independent MLP chains costs the sum of the individual
    programs, there is no compute/compute concurrency to exploit, and a
    double-buffered (stale-sampler) ray pipeline cannot beat its added
    complexity.

Timing methodology: K reps inside one jitted lax.scan with a dependent
scalar fetched to host (block_until_ready is unreliable through the axon
tunnel — see docs/performance.md).

  python -m neurecon_tpu.tools.bench_roadmap
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _time_scan(fn, args, K=50, trials=4):
    """Best-of-trials seconds per rep of fn(*args) scanned K times."""

    @jax.jit
    def scanned(*a):
        def body(carry, _):
            out = fn(*a, carry)
            return out, None
        carry, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K)
        return carry

    best = float("inf")
    scanned(*args)  # compile
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = float(scanned(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


def chain(x, ws, carry):
    h = x + carry * 1e-20  # serialize reps without changing the math
    for w in ws:
        h = jnp.maximum(h @ w, 0.0)
    return jnp.sum(h[-1, -1:])


def bench_padding(N=65536, W=256, D=4):
    """(a): radiance first-layer K=289 vs padded K=384, same chain after."""
    key = jax.random.PRNGKey(0)
    res = {}
    for K_in in (289, 384):
        ks = jax.random.split(key, D + 1)
        x = jax.random.normal(ks[0], (N, K_in), jnp.float32)
        ws = [jax.random.normal(ks[1], (K_in, W)) * 0.05]
        ws += [jax.random.normal(k, (W, W)) * 0.06 for k in ks[2:]]
        dt = _time_scan(chain, (x, ws), K=50)
        res[K_in] = dt
        print(f"  K_in={K_in}: {dt * 1e3:.3f} ms/rep")
    gain = res[289] / res[384]
    print(f"  -> padded/unpadded speed ratio {gain:.3f} "
          f"({'padding could help' if gain > 1.05 else 'padding is neutral: '
             'XLA already tiles K=289 to the 384 boundary'})")
    return res


def bench_overlap(N=32768, W=256, D=8):
    """(b): two independent chains fused in one program vs run separately."""
    key = jax.random.PRNGKey(1)
    ka, kb = jax.random.split(key)
    xa = jax.random.normal(ka, (N, W), jnp.float32)
    xb = jax.random.normal(kb, (N, W), jnp.float32)
    wsa = [jax.random.normal(jax.random.fold_in(ka, i), (W, W)) * 0.06
           for i in range(D)]
    wsb = [jax.random.normal(jax.random.fold_in(kb, i), (W, W)) * 0.06
           for i in range(D)]

    ta = _time_scan(chain, (xa, wsa), K=50)
    tb = _time_scan(chain, (xb, wsb), K=50)

    def both(xa, wsa, xb, wsb, carry):
        return chain(xa, wsa, carry) + chain(xb, wsb, carry)

    tab = _time_scan(both, (xa, wsa, xb, wsb), K=50)
    print(f"  chain A {ta * 1e3:.3f} ms, chain B {tb * 1e3:.3f} ms, "
          f"fused A+B {tab * 1e3:.3f} ms")
    overlap = (ta + tb) / tab
    print(f"  -> concurrency factor {overlap:.3f} "
          f"({'real overlap exists' if overlap > 1.1 else 'no compute/compute '
             'overlap on this core: a sampler/backward pipeline cannot win'})")
    return {"a": ta, "b": tb, "both": tab}


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print("(a) radiance input padding 289->384:")
    bench_padding()
    print("(b) independent-chain overlap bound:")
    bench_overlap()
