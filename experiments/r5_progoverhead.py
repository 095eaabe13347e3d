#!/usr/bin/env python3
"""Round-5: Pallas per-program fixed-overhead probe at the exchange
kernels' scale.  A 7-plane pass-through kernel over (NT, 8, L) blocks,
identical total work, run at grid granularities G = 1/4/8 tiles per
program.  Chained via a scan whose carry mutates (dodges the tunnel's
result memoization).  If ms varies strongly with G, the exchange
kernels' (NT,)-grid layout is overhead-bound and should batch tiles.
Run: python experiments/r5_progoverhead.py [grid_n]
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinc_tpu.tiled_sim import _jit
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NT = (N // 8) ** 3
B = 17408
L = B // 8
NP = 7


def _kernel(*refs, G):
    ins = refs[:NP]
    outs = refs[NP:]

    def body(g, _):
        for p in range(NP):
            outs[p][g] = ins[p][g] + 1.0
        return 0
    jax.lax.fori_loop(0, G, body, 0)


def mk(G):
    row = pl.BlockSpec((G, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, G=G),
        out_shape=tuple(jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)
                        for _ in range(NP)),
        grid=(NT // G,),
        in_specs=[row] * NP,
        out_specs=tuple([row] * NP),
    )

    @_jit
    def f(planes):
        def body(c, _):
            return call(*c), c[0][0, 0, 0]
        return jax.lax.scan(body, planes, None, length=8)
    return f


rng = np.random.default_rng(0)
planes0 = tuple(jnp.asarray(rng.normal(size=(NT, 8, L)).astype(np.float32))
                for _ in range(NP))
for G in (1, 4, 8):
    try:
        f = mk(G)
        t0 = time.monotonic()
        o = f(planes0)
        jax.block_until_ready(o[0][0])
        print(f"G={G}: compile+first {time.monotonic()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.monotonic()
        o = f(o[0])
        o = f(o[0])
        jax.block_until_ready(o[0][0])
        dt = (time.monotonic() - t0) / 16
        gbs = NP * NT * 8 * L * 4 * 2 / dt / 1e9
        print(f"G={G}: {dt*1e3:8.2f} ms/iter ({gbs:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"G={G}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)
