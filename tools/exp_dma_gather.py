"""Experiment: can a Pallas per-row async-DMA gather beat XLA's row gather?

XLA's `x[idx]` on v5e is the framework's defining wall: ~87M rows/s
regardless of row width (docs/DESIGN_NOTES.md §1) — it lower-bounds every
remainder/XLA message-passing pass. Hypothesis: the wall is XLA's
serialized gather loop, not the memory system; a Pallas kernel that keeps
many per-row HBM→VMEM DMAs in flight should push closer to the DMA
bandwidth limit for ~row-sized transfers.

Kernel: grid over output tiles of T rows; the tile's indices stream through
SMEM; the body starts T row DMAs (each its own semaphore slot), then waits
them all before the tile's output block writes back. Pipelining across grid
steps (next tile's index block + output buffer) is Pallas-automatic.

Usage: python tools/exp_dma_gather.py [--n 169343 --d 256 --e 2332486]
(defaults = ogbn-arxiv bidirected scale). Prints rows/s for XLA gather,
split-XLA gather (overlap probe), and the DMA kernel at several tile sizes.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dma_gather(x, idx, tile: int = 256, interpret: bool = False):
    """out[i] = x[idx[i]] via per-row async DMA; idx length must be a
    multiple of ``tile`` (pad with 0)."""
    e = idx.shape[0]
    assert e % tile == 0, (e, tile)
    d = x.shape[1]

    assert tile % 128 == 0, tile
    k = tile // 128

    def kernel(idx_ref, x_ref, o_ref, sems):
        for r in range(tile):
            pltpu.make_async_copy(
                x_ref.at[idx_ref[0, r // 128, r % 128]], o_ref.at[r],
                sems.at[r],
            ).start()
        for r in range(tile):
            pltpu.make_async_copy(
                x_ref.at[idx_ref[0, r // 128, r % 128]], o_ref.at[r],
                sems.at[r],
            ).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((e, d), x.dtype),
        grid=(e // tile,),
        in_specs=[
            pl.BlockSpec((1, k, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tile,))],
        interpret=interpret,
    )(idx.reshape(e // tile, k, 128), x)


def vmem_gather(x, idx, tile: int = 512, interpret: bool = False):
    """out[i] = x[idx[i]] via per-row dynamic sublane slices from a fully
    VMEM-resident x — no DMA, pure vector-unit addressing. Rows are read
    one at a time but written back in aligned groups of 8 sublanes."""
    e = idx.shape[0]
    assert e % tile == 0 and tile % 128 == 0, (e, tile)
    k = tile // 128
    d = x.shape[1]

    def kernel(idx_ref, x_ref, o_ref):
        for r0 in range(0, tile, 8):
            rows = [
                x_ref[pl.ds(idx_ref[0, (r0 + j) // 128, (r0 + j) % 128], 1), :]
                for j in range(8)
            ]
            o_ref[pl.ds(r0, 8), :] = jnp.concatenate(rows, axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((e, d), x.dtype),
        grid=(e // tile,),
        in_specs=[
            pl.BlockSpec((1, k, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x fully resident
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
        interpret=interpret,
    )(idx.reshape(e // tile, k, 128), x)


def timed(fn, *args, reps=6, cold=2):
    fj = jax.jit(fn)
    for _ in range(cold):
        r = fj(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fj(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=169343)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--e", type=int, default=2332486)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dt = jnp.dtype(args.dtype)
    x = jnp.asarray(rng.standard_normal((args.n, args.d)).astype(np.float32)).astype(dt)
    e_pad = -(-args.e // 512) * 512
    idx = jnp.asarray(
        np.concatenate([rng.integers(0, args.n, args.e),
                        np.zeros(e_pad - args.e)]).astype(np.int32))
    print(f"n={args.n} d={args.d} e={e_pad} dtype={dt.name} "
          f"row={args.d * dt.itemsize}B device={jax.devices()[0]}")

    ref = np.asarray(x)[np.asarray(idx)]

    t = timed(lambda x, i: x[i], x, idx)
    print(f"xla gather:          {t*1e3:8.2f} ms  {e_pad/t/1e6:8.1f} M rows/s")

    def split4(x, i):
        k = i.shape[0] // 4
        return jnp.concatenate([x[i[j * k:(j + 1) * k]] for j in range(4)])

    t = timed(split4, x, idx)
    print(f"xla gather split4:   {t*1e3:8.2f} ms  {e_pad/t/1e6:8.1f} M rows/s")

    for tile in (128, 256):
        try:
            out = dma_gather(x, idx, tile=tile, interpret=args.interpret)
            err = float(np.abs(np.asarray(out) - ref).max())
            t = timed(lambda x, i: dma_gather(x, i, tile=tile), x, idx)
            print(f"dma gather tile={tile:4d}: {t*1e3:8.2f} ms  "
                  f"{e_pad/t/1e6:8.1f} M rows/s  maxerr={err:.1e}")
        except Exception as ex:  # noqa: BLE001 — experiment: report and move on
            print(f"dma gather tile={tile}: FAILED {type(ex).__name__}: {ex}")

    for tile in (512, 2048):
        try:
            out = vmem_gather(x, idx, tile=tile, interpret=args.interpret)
            err = float(np.abs(np.asarray(out) - ref).max())
            t = timed(lambda x, i: vmem_gather(x, i, tile=tile), x, idx)
            print(f"vmem gather tile={tile:4d}: {t*1e3:7.2f} ms  "
                  f"{e_pad/t/1e6:8.1f} M rows/s  maxerr={err:.1e}")
        except Exception as ex:  # noqa: BLE001
            print(f"vmem gather tile={tile}: FAILED {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
