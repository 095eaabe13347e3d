"""End-to-end TPU exchange validation without interpret mode: the
exchange must be a pure permutation of alive particles' GLOBAL
coordinates (local shift ±T exactly cancels the tile change), so the
sorted global payload multisets must match BITWISE."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.ops import pallas_exchange as pex

rng = np.random.default_rng(7)
for rows, fused, K in ((False, False, 512), (True, False, 512),
                       (True, True, 512)):
    nt, T, B = (4, 4, 4), 8, 2048
    NT = int(np.prod(nt))
    alive = (rng.uniform(size=(NT, B)) < 0.6).astype(np.float32)
    pos = [rng.uniform(-1.5, T + 1.5, (NT, B)).astype(np.float32)
           for _ in range(3)]
    vel = [rng.normal(0, 0.37, (NT, B)).astype(np.float32)
           for _ in range(3)]
    planes = tuple(jnp.asarray(p) for p in pos + vel)
    alive_j = jnp.asarray(alive)

    pl2, al2, d = jax.jit(lambda p, a: pex.rebucket_exchange_planes(
        p, a, nt, T, K=K, rows=rows, fused=fused))(planes, alive_j)

    def gkey(planes_np, alive_np):
        """(N, 6) global payload rows for alive slots, lexsorted."""
        tix = np.unravel_index(np.arange(NT), nt)
        out = []
        for c in range(3):
            g = planes_np[c] + (tix[c][:, None] * T).astype(np.float32)
            out.append(g)
        for c in range(3, 6):
            out.append(planes_np[c])
        m = alive_np > 0.5
        rowsv = np.stack([o[m] for o in out], axis=1)
        order = np.lexsort(rowsv.T[::-1])
        return rowsv[order]

    before = gkey([np.asarray(p) for p in planes], alive)
    after = gkey([np.asarray(p) for p in pl2], np.asarray(al2))
    nb, na = len(before), len(after)
    print(f"rows={rows} fused={fused}: n_before={nb} n_after={na} "
          f"dropped={int(d)} count_ok={nb == na + int(d)}")
    if int(d) == 0:
        # velocities are never frame-shifted: their multiset must match
        # BITWISE (random f32 triples — collisions impossible), proving
        # exact payload transport.  Positions legitimately re-round by
        # ~1 ulp under the ±T frame shift (as the reference's
        # shiftImmigrants does), so compare them sorted per component
        # with an ulp-scale tolerance.
        import collections
        vb = collections.Counter(map(bytes, before[:, 3:]
                                     .astype(np.float32).copy()
                                     .view(np.uint8)
                                     .reshape(nb, -1)))
        va = collections.Counter(map(bytes, after[:, 3:]
                                     .astype(np.float32).copy()
                                     .view(np.uint8)
                                     .reshape(na, -1)))
        print(f"  velocity multiset bitexact: {vb == va}")
        mdp = max(np.abs(np.sort(before[:, c]) - np.sort(after[:, c]))
                  .max() for c in range(3))
        print(f"  per-component sorted |dpos| max: {mdp:.2e} "
              f"(ulp scale {np.spacing(np.float32(32)):.1e})")
    else:
        # dropped: after must be a sub-multiset of before
        import collections
        cb = collections.Counter(map(tuple, before))
        ca = collections.Counter(map(tuple, after))
        extra = ca - cb
        print(f"  sub-multiset ok: {len(extra) == 0} "
              f"(foreign rows: {sum(extra.values())})")
