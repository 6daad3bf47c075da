#!/usr/bin/env python
"""Mosaic constraint + overhead probes for the transposed rasterizer design.

 probe 1: per-program overhead floor -- grid of 65856 programs, trivial body.
 probe 2: DMA (32,16) row windows from a (MP,16) HBM ref at dynamic 8-aligned
          offsets + sublane shift-scan compute on (32,256) blocks.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from intro_to_gaussian_splatting_tpu.utils.profiling import profile_device_time

NT = 65856
PIX = 256


def probe1():
    def kernel(out_ref):
        out_ref[0] = jnp.zeros((8, PIX), jnp.float32)

    @jax.jit
    def run():
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            out_specs=pl.BlockSpec((1, 8, PIX), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, 8, PIX), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )()

    durs = profile_device_time(run, iters=3, name_substr="jit_run")
    print(f"probe1 trivial grid({NT}): {[round(d*1e3,2) for d in durs]} ms "
          f"-> {durs and durs[len(durs)//2]/NT*1e9:.0f} ns/program")


def probe2():
    MP = 1 << 18
    G = 32

    def kernel(starts_ref, counts_ref, rec_hbm, out_ref, rec_vmem, sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        astart = (start // 8) * 8
        shift = start - astart
        end = shift + counts_ref[t]
        nchunks = jnp.where(counts_ref[t] == 0, 0, pl.cdiv(end, G))

        def body(i, accum):
            dma = pltpu.make_async_copy(
                rec_hbm.at[pl.ds(astart + i * G, G), :], rec_vmem, sem)
            dma.start()
            dma.wait()
            rec = rec_vmem[:, :]                       # (G, 128)
            # emulate real per-chunk work: ~8 feature broadcasts, alpha math,
            # exp, sublane scan, masked weights, payload reduction
            px = jax.lax.broadcasted_iota(
                jnp.int32, (1, PIX), 1).astype(jnp.float32)
            dx = px - rec[:, 0:1]
            dy = px - rec[:, 1:2]
            q = (rec[:, 2:3] * dx * dx + 2.0 * rec[:, 3:4] * dx * dy
                 + rec[:, 4:5] * dy * dy)
            a = jnp.clip(rec[:, 5:6] * jnp.exp(-0.5 * q), 0.0, 0.99)
            s = jnp.maximum(jnp.log1p(-a), -30.0)
            # sublane inclusive shift-scan
            k = 1
            while k < G:
                pad = jnp.zeros((k, PIX), jnp.float32)
                s = s + jnp.concatenate([pad, s[:-k, :]], axis=0)
                k *= 2
            T = jnp.exp(s - s)
            w = T * a
            r = (jnp.sum(w * rec[:, 6:7], axis=0, keepdims=True)
                 + jnp.sum(w * rec[:, 7:8], axis=0, keepdims=True)
                 + jnp.sum(w * rec[:, 8:9], axis=0, keepdims=True))
            return accum + r

        acc = jax.lax.fori_loop(0, nchunks, body,
                                jnp.zeros((1, PIX), jnp.float32))
        out_ref[0] = jnp.broadcast_to(acc, (8, PIX))

    rec = jnp.ones((MP, 128), jnp.float32)
    counts = jnp.full((NT,), 2, jnp.int32)   # ~2 pairs per tile
    starts = jnp.cumsum(counts) - 2

    @jax.jit
    def run(starts, counts, rec):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(NT,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((1, 8, PIX), lambda t, s, c: (t, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((G, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((NT, 8, PIX), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(starts, counts, rec)

    durs = profile_device_time(run, starts, counts, rec, iters=3,
                               name_substr="jit_run")
    print(f"probe2 DMA+scan grid({NT}): {[round(d*1e3,2) for d in durs]} ms "
          f"-> {durs and durs[len(durs)//2]/NT*1e9:.0f} ns/program")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("1", "all"):
        probe1()
    if which in ("2", "all"):
        probe2()
