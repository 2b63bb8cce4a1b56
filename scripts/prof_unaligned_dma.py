"""Check Mosaic accepts lane-unaligned dynamic DMA offsets (HBM->VMEM)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, E, CHUNK = 16, 4096, 128


def kernel(off_ref, hbm, out_ref, buf, sem):
    t = pl.program_id(0)
    off = off_ref[t]
    dma = pltpu.make_async_copy(hbm.at[:, pl.ds(off, CHUNK)], buf, sem)
    dma.start()
    dma.wait()
    out_ref[0] = buf[:]


x = jnp.arange(F * E, dtype=jnp.float32).reshape(F, E)
offs = jnp.asarray([0, 37, 129, 1000, 2049, 511, 640, 3968], jnp.int32)

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, F, CHUNK), lambda t, *_: (t, 0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((F, CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)
out = pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((8, F, CHUNK), jnp.float32))(offs, x)
out = np.asarray(out)
ref = np.stack([np.asarray(x)[:, o:o + CHUNK] for o in np.asarray(offs)])
print("max err:", np.abs(out - ref).max())
assert np.abs(out - ref).max() == 0
print("unaligned dynamic DMA: OK")
