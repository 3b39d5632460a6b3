"""MXU-vs-VPU roofline experiment for the batched small-matrix Riccati algebra.

The question (BASELINE north star "speed-of-light per chip"): for B scenarios x
(12x12 @ 12x12) matmuls — the core op of the Riccati/IP stack — which hardware
mapping wins?

  a) xla_batched   : jnp einsum bij,bjk->bik — XLA's native batched GEMM path
  b) mxu_blockdiag : pack ceil(128/12)=10 scenarios into true 128x128
                     block-diagonal operands and run real MXU GEMMs; only the
                     10 diagonal 12x12 blocks carry signal, so the MXU tile
                     density is 10*12^3 / 128^2/... ~ 1.1% of the systolic
                     array's useful work — measured here rather than argued
  c) vpu_lanes     : the lanes mapping (ops/pallas_ocp._mm): scenarios on the
                     128-lane axis, each matrix entry a lane vector; every FMA
                     is a full-width VPU op

Each case runs a chain of `n_chain` dependent matmul rounds (state-chained, so
axon dispatch overlap cannot fake the timing) over B = 1280 scenarios and
reports useful GFLOP/s (2 * B * 12^3 per matmul — padding work in (b) does not
count as useful).

Prints one JSON line per case. Results recorded in docs/ROOFLINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = 12
LANES = 128
BLOCKS = LANES // N  # 10 12x12 blocks per 128x128 tile


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parents[1] / ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpmpc_tpu.ops.pallas_ocp import _mm

    B = 1280  # 10 lane tiles / 128 block-diag tiles
    T = 25  # independent per-scenario stages, as in the production Riccati sweep
    n_chain = 200
    rng = np.random.default_rng(0)
    # Near-orthogonal-ish scaling keeps the chained products finite.
    mats = (np.eye(N) + 0.05 * rng.normal(size=(B, T, N, N))).astype(np.float32)
    useful_flops = 2.0 * B * T * N * N * N * n_chain

    def timed(fn, *args, reps=5, flops=None):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        # Device->host fetch of the final result: a barrier the remote (axon)
        # dispatch queue cannot satisfy early — block_until_ready alone was
        # measured returning in ~0.1 ms for multi-ms programs over the tunnel,
        # inflating a VPU-bound kernel to an impossible 64 TFLOP/s.
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        return (flops if flops is not None else useful_flops) / dt / 1e9

    # BENCH_ROOFLINE_ONLY=vpu_lanes,vpu_lanes_bf16_pair selects rows (the slow
    # XLA row alone can take minutes through a moody tunnel).
    only = os.environ.get("BENCH_ROOFLINE_ONLY")

    def want(name):
        return only is None or name in only.split(",")

    def report(name, gflops):
        print(json.dumps({
            "metric": f"riccati_mm_gflops[{name}]",
            "value": round(gflops, 1),
            "unit": "GFLOP/s (useful)",
            "vs_baseline": 0.0,
        }), flush=True)

    # (a) XLA batched GEMM
    @jax.jit
    def xla_chain(x):
        def body(i, acc):
            return 0.5 * jnp.einsum("btij,btjk->btik", acc, acc) + 0.5 * acc
        return jax.lax.fori_loop(0, n_chain, body, x)

    if want("xla_batched"):
        report("xla_batched", timed(xla_chain, jnp.asarray(mats)))

    # (b) MXU block-diagonal: scenarios packed 10-per-tile into 128x128 GEMMs.
    n_tiles = B // BLOCKS
    packed = np.zeros((n_tiles, T, LANES, LANES), np.float32)
    for t in range(n_tiles):
        for b in range(BLOCKS):
            s = t * BLOCKS + b
            packed[t, :, b * N:(b + 1) * N, b * N:(b + 1) * N] = mats[s]
    # Mask keeps the product block-diagonal each round (true GEMMs regardless).
    mask = np.zeros((LANES, LANES), np.float32)
    for b in range(BLOCKS):
        mask[b * N:(b + 1) * N, b * N:(b + 1) * N] = 1.0

    @jax.jit
    def mxu_chain(x, m):
        def body(i, acc):
            prod = jnp.einsum("tsij,tsjk->tsik", acc, acc,
                              preferred_element_type=jnp.float32)
            return (0.5 * prod + 0.5 * acc) * m[None, None]
        return jax.lax.fori_loop(0, n_chain, body, x)

    if want("mxu_blockdiag"):
        report("mxu_blockdiag", timed(mxu_chain, jnp.asarray(packed), jnp.asarray(mask)))

    # (c) VPU lanes: scenarios on the lane axis, _mm from the production kernel,
    # T independent stages per tile for ILP (the production sweep's shape).
    lanes_mats = np.moveaxis(
        mats.reshape(B // LANES, LANES, T, N, N), 1, -1
    ).copy()  # (tiles, T, N, N, L)

    def lanes_kernel(x_ref, o_ref):
        acc = x_ref[...]
        for _ in range(n_chain):
            acc = jnp.stack(
                [0.5 * _mm(acc[k], acc[k]) + 0.5 * acc[k] for k in range(T)], axis=0
            )
        o_ref[...] = acc

    @jax.jit
    def lanes_chain(x):
        call = pl.pallas_call(
            lanes_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N, N, LANES), jnp.float32),
        )
        return jax.vmap(call)(x)

    if want("vpu_lanes"):
        report("vpu_lanes", timed(lanes_chain, jnp.asarray(lanes_mats)))

    # (d)/(e) run the chain as an in-kernel fori_loop (the body traces once —
    # the (c) kernel's full unroll produces 5,000 traced lane-matmuls whose
    # bf16 Mosaic relayouts took >20 min to compile). The loop-carried round
    # adds negligible overhead at this arithmetic intensity.

    # (d) bf16 lane-pairing: 256 scenarios per tile (2 per 32-bit lane slot).
    # ROOFLINE.md §2 listed this as a declared non-goal for the production
    # kernel (precision risk in the IP barrier terms); measured here so the
    # "within a small constant of VPU light" claim rests on a number.
    L2 = 2 * LANES
    lanes_mats_bf = np.moveaxis(
        mats.reshape(B // L2, L2, T, N, N), 1, -1
    ).astype(jnp.bfloat16)  # (tiles/2, T, N, N, 256)

    def lanes_kernel_bf16(x_ref, o_ref):
        def round_(i, acc):
            return jnp.stack(
                [
                    (0.5 * _mm(acc[k], acc[k]) + 0.5 * acc[k]).astype(jnp.bfloat16)
                    for k in range(T)
                ],
                axis=0,
            )

        o_ref[...] = jax.lax.fori_loop(0, n_chain, round_, x_ref[...])

    @jax.jit
    def lanes_chain_bf16(x):
        call = pl.pallas_call(
            lanes_kernel_bf16,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N, N, L2), jnp.bfloat16),
        )
        return jax.vmap(call)(x)

    if want("vpu_lanes_bf16_pair"):
        report("vpu_lanes_bf16_pair", timed(lanes_chain_bf16, jnp.asarray(lanes_mats_bf)))

    # (e) 16-row re-blocking: embed the 12x12 blocks into 16x16 (identity on
    # the pad diagonal keeps the chain stable) so every sublane access is
    # 8-aligned — the other declared non-goal. GFLOP/s still counts only the
    # USEFUL 12^3 work: if alignment gains beat the (16/12)^3 = 2.37x padding
    # waste, this row wins over vpu_lanes; if not, the non-goal is data.
    # Fewer stages per tile: the 16x16 chain's live state at T=25 exceeds the
    # 16M scoped-VMEM limit (measured 18.53M) — itself half the verdict on
    # padding: it inflates VMEM pressure 1.78x too.
    N16 = 16
    T16 = 12
    flops16 = 2.0 * B * T16 * N * N * N * n_chain
    mats16 = np.tile(np.eye(N16, dtype=np.float32), (B, T16, 1, 1))
    mats16[:, :, :N, :N] = mats[:, :T16]  # 12x12 = I + perturbation; pad diag = I
    lanes_mats16 = np.moveaxis(
        mats16.reshape(B // LANES, LANES, T16, N16, N16), 1, -1
    ).copy()

    def lanes_kernel_16(x_ref, o_ref):
        def round_(i, acc):
            return jnp.stack(
                [0.5 * _mm(acc[k], acc[k]) + 0.5 * acc[k] for k in range(T16)], axis=0
            )

        o_ref[...] = jax.lax.fori_loop(0, n_chain, round_, x_ref[...])

    @jax.jit
    def lanes_chain_16(x):
        call = pl.pallas_call(
            lanes_kernel_16,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T16, N16, N16, LANES), jnp.float32),
        )
        return jax.vmap(call)(x)

    if want("vpu_lanes_pad16"):
        report(
            "vpu_lanes_pad16",
            timed(lanes_chain_16, jnp.asarray(lanes_mats16), flops=flops16),
        )


if __name__ == "__main__":
    main()
