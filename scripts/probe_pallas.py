"""Capability probes for Pallas/Mosaic on the axon TPU runtime.

Each probe compiles + runs a tiny kernel and reports ok/error — run before
designing kernels around an op (round 1 was blocked on gather support;
PrefetchScalarGridSpec index_maps are the workaround to validate).
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}")
    except Exception as e:
        msg = (str(e).splitlines() or [repr(e)])[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def p_basic():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    return float(jnp.sum(out))


def p_take_along_axis_rows():
    """Gather rows of a (N, 128) VMEM operand with a broadcast index."""
    def kernel(x_ref, idx_ref, o_ref):
        idx = idx_ref[:]                       # (M, 128) int32
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)
    n, m = 256, 64
    x = jnp.arange(n * 128, dtype=jnp.float32).reshape(n, 128)
    idx = jnp.broadcast_to((jnp.arange(m, dtype=jnp.int32) * 3 % n)[:, None], (m, 128))
    out = pl.pallas_call(kernel,
                         out_shape=jax.ShapeDtypeStruct((m, 128), x.dtype),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    expect = np.take(np.asarray(x), np.asarray(idx)[:, 0], axis=0)
    ok = np.allclose(np.asarray(out), expect)
    return f"correct={ok}"


def p_flat_gather():
    """1-D elementwise gather x[idx] with 2-D shaped index/output."""
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = x_ref[idx_ref[:]]
    n = 2048
    x = jnp.arange(n, dtype=jnp.float32)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32) * 7 % n).reshape(8, 128)
    out = pl.pallas_call(kernel,
                         out_shape=jax.ShapeDtypeStruct((8, 128), x.dtype),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    ok = np.allclose(np.asarray(out), np.asarray(x)[np.asarray(idx)])
    return f"correct={ok}"


def p_dynamic_gather_lanes():
    """Same-shape gather along lanes (the op round 1 found supported)."""
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32) * 5 % 128).reshape(8, 128)
    out = pl.pallas_call(kernel,
                         out_shape=jax.ShapeDtypeStruct((8, 128), x.dtype),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    expect = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    return f"correct={np.allclose(np.asarray(out), expect)}"


def p_scalar_prefetch_indexmap():
    """PrefetchScalarGridSpec: x-block choice driven by a prefetched index."""
    def kernel(sel_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    nblocks, bs = 8, 128
    x = jnp.arange(nblocks * bs * 128, dtype=jnp.float32).reshape(nblocks * bs, 128)
    sel = jnp.asarray([3, 1, 4, 1], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec((bs, 128), lambda i, sel: (sel[i], 0))],
        out_specs=pl.BlockSpec((bs, 128), lambda i, sel: (i, 0)),
    )
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((4 * bs, 128), x.dtype),
                         grid_spec=grid_spec)(sel, x)
    expect = np.concatenate([np.asarray(x)[s * bs:(s + 1) * bs] + 1.0
                             for s in np.asarray(sel)])
    return f"correct={np.allclose(np.asarray(out), expect)}"


def p_accumulate_grid():
    """Output revisiting across an inner grid dim (accumulation pattern)."""
    def kernel(x_ref, o_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += x_ref[:]

    x = jnp.arange(4 * 3 * 8 * 128, dtype=jnp.float32).reshape(4, 3, 8, 128)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((4 * 8, 128), x.dtype),
        grid=(4, 3),
        in_specs=[pl.BlockSpec((1, 1, 8, 128), lambda i, k: (i, k, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i, k: (i, 0)))(x)
    expect = np.asarray(x).sum(1).reshape(4 * 8, 128)
    return f"correct={np.allclose(np.asarray(out), expect)}"


def p_dma_hbm_to_vmem():
    """Manual async copy from an HBM-resident operand inside the kernel."""
    def kernel(x_hbm, o_ref):
        def body(scratch, sem):
            dma = pltpu.make_async_copy(x_hbm.at[pl.ds(128, 128)], scratch, sem)
            dma.start()
            dma.wait()
            o_ref[:] = scratch[:]
        pl.run_scoped(body, scratch=pltpu.VMEM((128, 128), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    x = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((128, 128), x.dtype),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    return f"correct={np.allclose(np.asarray(out), np.asarray(x)[128:256])}"


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("basic", p_basic)
    probe("take_along_axis rows (axis 0)", p_take_along_axis_rows)
    probe("flat 1-D gather", p_flat_gather)
    probe("take_along_axis lanes (axis 1)", p_dynamic_gather_lanes)
    probe("scalar-prefetch index_map", p_scalar_prefetch_indexmap)
    probe("grid accumulation", p_accumulate_grid)
    probe("manual HBM->VMEM DMA", p_dma_hbm_to_vmem)
