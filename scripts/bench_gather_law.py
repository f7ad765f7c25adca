"""Cost-law micro-bench: lane gathers vs (rows, table N, queries, dtype),
sorts vs (payload rows, dtype), scatters — slope-timed on the chip.

Purpose (round 5): the garden attribution says ~26 ms/step is irregular
machinery at measured floors (gathers ~4.5 ns/query, sorts ~0.4 ns/row-elem).
Round-4 spot measurements hinted gathers from VMEM-resident tables are ~3x
cheaper (1.5 ns/q for a (16, 35k) table) — if the law is table-size-driven,
splitting the garden field table (9 x 300k = 10.8 MB) into sub-8MB pieces or
packing it to bf16 changes the design. This script maps the law.

Usage: python scripts/bench_gather_law.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K_LO, K_HI = 5, 40


def slope(make_run):
    walls = {}
    for K in (K_LO, K_HI):
        run = make_run(K)
        jax.device_get(run())
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run())
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


def gather_ms(R, N, Q, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32)).astype(dtype)
    # perturb queries per iter with a cheap ADD (int mod has no TPU fast
    # path and polluted the first version of this harness by ~5 ms)
    idx = jnp.asarray(rng.integers(0, max(N - 64, 1), Q).astype(np.int32))

    def make_run(K):
        @jax.jit
        def run():
            def body(i, acc):
                ii = idx + (i & 63)  # new queries each iter (cheap VPU)
                out = table[:, ii]
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, K, body, 0.0)

        return run

    return slope(make_run)


def gather_calib_ms(R, Q, dtype=jnp.float32):
    """Reduction-only cost of consuming an (R, Q) array (subtract from gather)."""
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(R, Q)).astype(np.float32)).astype(dtype)

    def make_run(K):
        @jax.jit
        def run():
            def body(i, acc):
                out = base + i.astype(base.dtype)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, K, body, 0.0)

        return run

    return slope(make_run)


def sort_ms(Q, n_payload, pdtype=jnp.float32, key_dtype=jnp.int32):
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 1 << 24, Q).astype(np.int32)).astype(key_dtype)
    pays = [
        jnp.asarray(rng.normal(size=Q).astype(np.float32)).astype(pdtype)
        for _ in range(n_payload)
    ]

    def make_run(K):
        @jax.jit
        def run():
            def body(i, acc):
                kk = keys ^ i
                out = jax.lax.sort((kk, *pays), num_keys=1, is_stable=True)
                return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in out[1:]) * 1e-9 + jnp.sum(out[0]).astype(jnp.float32) * 1e-9

            return jax.lax.fori_loop(0, K, body, 0.0)

        return run

    return slope(make_run)


def scatter_max_ms(N_updates, cap):
    rng = np.random.default_rng(2)
    idx = jnp.asarray(np.sort(rng.integers(0, cap - 64, N_updates)).astype(np.int32))
    vals = jnp.asarray(np.arange(N_updates, dtype=np.int32))

    def make_run(K):
        @jax.jit
        def run():
            def body(i, acc):
                out = jnp.zeros(cap, jnp.int32).at[idx + (i & 63)].max(vals, mode="drop")
                return acc + jnp.sum(out).astype(jnp.float32) * 1e-9

            return jax.lax.fori_loop(0, K, body, 0.0)

        return run

    return slope(make_run)


def main():
    print("== gather: ms vs (rows R, table N, queries Q, dtype) ==")
    Q = 600_000
    for R in (1, 2, 4, 5, 8, 9, 16):
        for N in (35_000, 150_000, 300_000):
            ms = gather_ms(R, N, Q)
            print(f"gather R={R:2d} N={N//1000:4d}k Q=600k f32: {ms:7.3f} ms  "
                  f"({ms/Q*1e6:5.2f} ns/q)")
    for R, N in ((9, 300_000), (16, 300_000), (9, 600_000)):
        ms = gather_ms(R, N, Q, jnp.bfloat16)
        print(f"gather R={R:2d} N={N//1000:4d}k Q=600k bf16: {ms:7.3f} ms  "
              f"({ms/Q*1e6:5.2f} ns/q)")
    for R in (9, 16):
        c = gather_calib_ms(R, Q)
        print(f"calib  R={R:2d} consume-only (f32): {c:7.3f} ms")
    print("== ascending (sorted) queries: does monotonicity help? ==")
    rng = np.random.default_rng(3)
    for R, N in ((9, 300_000),):
        table = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32))
        idx_sorted = jnp.asarray(np.sort(rng.integers(0, N, Q)).astype(np.int32))

        def mk(K):
            @jax.jit
            def run():
                def body(i, acc):
                    out = table[:, jnp.minimum(idx_sorted + (i & 63), N - 1)]
                    return acc + jnp.sum(out) * 1e-9
                return jax.lax.fori_loop(0, K, body, 0.0)
            return run
        ms = slope(mk)
        print(f"gather R={R} N={N//1000}k Q=600k ASC idx: {ms:7.3f} ms ({ms/Q*1e6:5.2f} ns/q)")

    print("== sort: ms vs payload rows / dtype (Q=600k int32 keys) ==")
    for P in (1, 2, 5, 9):
        ms = sort_ms(Q, P)
        print(f"sort Q=600k payload={P} f32: {ms:7.3f} ms ({ms/(Q*(P+1))*1e6:5.3f} ns/row-elem)")
    ms = sort_ms(Q, 5, jnp.bfloat16)
    print(f"sort Q=600k payload=5 bf16: {ms:7.3f} ms")
    ms = sort_ms(Q, 5, jnp.int32)
    print(f"sort Q=600k payload=5 int32: {ms:7.3f} ms")
    for Q2 in (300_000, 1_000_000):
        ms = sort_ms(Q2, 2)
        print(f"sort Q={Q2//1000}k payload=2 f32: {ms:7.3f} ms")

    print("== scatter .at[].max ==")
    for NU, cap in ((300_000, 460_800), (150_000, 460_800)):
        ms = scatter_max_ms(NU, cap)
        print(f"scatter-max {NU//1000}k updates into {cap//1000}k: {ms:7.3f} ms "
              f"({ms/NU*1e6:5.2f} ns/upd)")


if __name__ == "__main__":
    main()
