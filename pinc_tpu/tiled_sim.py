"""Tiled-layout simulation: the production single-chip performance path.

Same physics as :class:`Simulation`, but particles live in per-tile buckets
(ops/tiled.py) so charge deposition is a dense MXU contraction instead of
an XLA scatter.  Selected with ``methods:layout = tiled`` (or automatically
by bench.py).  Deck knobs, section ``[tiles]``:

* ``tileSize``       — tile edge in cells (default 8)
* ``margin``         — wander margin M in cells (default 2)
* ``slack``          — bucket capacity head-room factor (default 1.5)
* ``rebucketEvery``  — steps between re-bucketing sorts (default:
                       margin / population:maxVel, at least 1)

Out-of-margin particles deposit nothing until the next re-bucket; the step
counts them (``n_out``) and run() warns — the same safety-by-accounting
stance as migration overflow.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import PincConfig
from .grid import gradient, potential_energy
from .ops import tiled as tl
from .population import Particles
from .simulation import Diagnostics, Simulation, StepOutput
from .utils.logging import STATUS, WARNING, msg


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TiledState:
    lpos: jax.Array    # (S, NT, B, D) tile-local positions
    vel: jax.Array     # (S, NT, B, D)
    alive: jax.Array   # (S, NT, B)


class TiledSimulation(Simulation):
    def __init__(self, cfg: PincConfig, seed: int = 1):
        super().__init__(cfg, seed=seed)
        if self.objects is not None:
            raise NotImplementedError("tiled layout does not support "
                                      "embedded objects yet")
        if not self.spec.periodic:
            raise NotImplementedError("tiled layout is periodic-only")

        nd = self.spec.n_dims
        T = cfg.get_int("tiles:tilesize", 8)
        # margin default 2: Mosaic pads the contraction M-dim to sublane
        # multiples of 8, so P in 9..16 costs the same MXU time — a larger
        # margin buys a longer re-bucket cadence for free (the re-bucket
        # sort, not the kernels, is the marginal cost)
        v = np.abs(np.asarray(self.particles.vel))
        v = v[np.asarray(self.particles.alive)]
        vmax_est = max(float(np.percentile(v, 99.9)) * 1.5
                       if v.size else 0.0, 1e-3)
        M = cfg.get_int("tiles:margin", 2)
        slack = cfg.get_double("tiles:slack", 1.5)
        # per-species particles per tile
        ppt = self.particles.capacity * (T ** nd) / self.spec.global_volume
        B = int(math.ceil(ppt * slack / 128.0)) * 128
        self.ts = tl.TileSpec(grid=self.spec.global_size, T=T, M=M, B=B,
                              chunk=cfg.get_int("tiles:chunk", 32))
        self.ts.validate()

        # re-bucket cadence: default from the actual velocity scale (99.9th
        # percentile of the initial speeds + drift head-room) rather than
        # the conservative population:maxVel bound — the out-of-margin
        # counter triggers an early re-bucket if the estimate is beaten
        if "tiles:rebucketevery" in cfg:
            self.rebucket_every = cfg.get_int("tiles:rebucketevery")
        else:
            self.rebucket_every = max(1, min(int(M / vmax_est), 200))
        self._gather_mode = cfg.get_str("tiles:gather", "mxu").lower()
        default_backend = ("pallas" if (nd == 3 and
                                        jax.devices()[0].platform != "cpu")
                           else "xla")
        self._backend = cfg.get_str("tiles:backend", default_backend).lower()
        self._mxu_dtype = (jnp.bfloat16 if cfg.get_str(
            "tiles:mxudtype", "f32").lower() in ("bf16", "bfloat16")
            else jnp.float32)
        # exchange re-bucket works in any D==3 layout (the Pallas kernels
        # have interpret-mode fallbacks on CPU); sort is the generic path
        self._rebucket_mode = cfg.get_str(
            "tiles:rebucket", "exchange" if nd == 3 else "sort").lower()
        cap = int(self.ts.B // 4)
        self._exchange_cap = max(128, (cap // 128) * 128)

        self.state = self._bucket_all(self.particles)
        self._tstep_jit = jax.jit(self._tiled_step, donate_argnums=(0,))
        self._thalf_jit = jax.jit(self._tiled_half_kick, donate_argnums=(0,))
        self._rebucket_jit = jax.jit(self._rebucket, donate_argnums=(0,))
        msg(STATUS, "tiled layout: %s tiles of %d^%d cells, bucket=%d, "
            "margin=%d, rebucket every %d steps",
            self.ts.ntiles, T, nd, B, M, self.rebucket_every)

    # ------------------------------------------------------------- layout
    def _bucket_all(self, p: Particles) -> TiledState:
        S = p.n_species
        lposs, vels, alives = [], [], []
        for s in range(S):
            pos = p.cell[s].astype(jnp.float32) + p.frac[s]
            lp, lv, la, dropped = tl.bucket(pos, p.vel[s], p.alive[s], self.ts)
            lposs.append(lp); vels.append(lv); alives.append(la)
        return TiledState(lpos=jnp.stack(lposs), vel=jnp.stack(vels),
                          alive=jnp.stack(alives))

    def _rebucket(self, st: TiledState) -> Tuple[TiledState, jax.Array]:
        S = st.lpos.shape[0]
        lposs, vels, alives = [], [], []
        dropped = jnp.zeros((), jnp.int32)
        for s in range(S):
            if self._rebucket_mode == "exchange":
                # neighbor-tile transfers as one-hot selection matmuls —
                # no sort (the lax.sort re-bucket costs seconds at 128^3)
                lp, lv, la, d = tl.rebucket_exchange(
                    st.lpos[s], st.vel[s], st.alive[s], self.ts,
                    K=self._exchange_cap,
                    interpret=jax.devices()[0].platform == "cpu")
            else:
                gpos = tl.global_positions(st.lpos[s], self.ts).reshape(
                    -1, self.ts.n_dims)
                vel = st.vel[s].reshape(-1, self.ts.n_dims)
                alive = st.alive[s].reshape(-1)
                lp, lv, la, d = tl.bucket(gpos, vel, alive, self.ts)
            lposs.append(lp); vels.append(lv); alives.append(la)
            dropped = dropped + d.astype(jnp.int32)
        return TiledState(lpos=jnp.stack(lposs), vel=jnp.stack(vels),
                          alive=jnp.stack(alives)), dropped

    def to_particles(self, st: TiledState) -> Particles:
        """Convert back to the (cell, frac) layout for IO/diagnostics."""
        gpos = jax.vmap(lambda lp: tl.global_positions(lp, self.ts))(st.lpos)
        S = gpos.shape[0]
        N = self.ts.NT * self.ts.B
        gp = gpos.reshape(S, N, self.ts.n_dims)
        cell = jnp.floor(gp).astype(jnp.int32)
        frac = gp - jnp.floor(gp)
        L = jnp.asarray(self.ts.grid, jnp.int32)
        cell = jnp.mod(cell, L)
        return Particles(cell=cell, frac=frac,
                         vel=st.vel.reshape(S, N, self.ts.n_dims),
                         alive=st.alive.reshape(S, N))

    # --------------------------------------------------------------- step
    def _fields(self, st: TiledState):
        rho = None
        for s in range(st.lpos.shape[0]):
            q = float(np.asarray(self.params.charge)[s])
            if self._backend == "pallas":
                from .ops import pallas_tiled as ptl
                r = ptl.deposit_to_grid(st.lpos[s], st.alive[s], q, self.ts,
                                        mxu_dtype=self._mxu_dtype)
            else:
                r = tl.deposit_tiled(st.lpos[s], st.alive[s], q, self.ts)
            rho = r if rho is None else rho + r
        rho = rho.astype(self.spec.dtype)
        phi = self.solver(rho)
        E = -gradient(phi)
        return rho, phi, E

    def _kick(self, st: TiledState, E: jax.Array, half: bool):
        E_pad = tl.pad_tiles(E, self.ts)
        if half:
            E_pad = 0.5 * E_pad
        qm = self.params.charge / self.params.mass
        # dense-contraction gather: the per-particle XLA gather lowers to a
        # near-serial loop on TPU (measured 315 ms vs 35 ms at 64^3/4.2M);
        # the pallas kernel additionally keeps the intermediates in VMEM
        if self._backend == "pallas":
            from .ops import pallas_tiled as ptl
            P = self.ts.P
            ep5 = E_pad.reshape((self.ts.NT,) + (P,) * 3 + (E.shape[-1],))
            gather = lambda e, lp, ts: ptl.gather(
                ep5, lp, ts, mxu_dtype=self._mxu_dtype)
        elif self._gather_mode == "mxu":
            gather = tl.gather_tiled_mxu
        else:
            gather = tl.gather_tiled
        vels, kes = [], []
        for s in range(st.lpos.shape[0]):
            Ep = gather(E_pad, st.lpos[s], self.ts)
            dv = qm[s] * Ep
            v_dot = jnp.sum(st.vel[s] * (st.vel[s] + dv), axis=-1)
            v_dot = jnp.where(st.alive[s], v_dot, 0.0)
            kes.append(0.5 * self.params.mass[s] * jnp.sum(v_dot))
            vels.append(st.vel[s]
                        + jnp.where(st.alive[s][..., None], dv, 0.0))
        return (TiledState(lpos=st.lpos, vel=jnp.stack(vels),
                           alive=st.alive), jnp.stack(kes))

    def _out_of_margin(self, st: TiledState) -> jax.Array:
        lo, hi = -float(self.ts.M), float(self.ts.T + self.ts.M)
        bad = jnp.any((st.lpos < lo) | (st.lpos >= hi), axis=-1) & st.alive
        return jnp.sum(bad).astype(jnp.int32)

    def _tiled_half_kick(self, st: TiledState):
        rho, phi, E = self._fields(st)
        st, ke = self._kick(st, E, half=True)
        pe = potential_energy(rho, phi)
        return st, rho, phi, E, Diagnostics(
            kin_energy=ke, pot_energy=pe, n_lost=jnp.zeros((), jnp.int32))

    def _tiled_step(self, st: TiledState):
        st = TiledState(lpos=st.lpos + st.vel, vel=st.vel, alive=st.alive)
        n_out = self._out_of_margin(st)
        rho, phi, E = self._fields(st)
        st, ke = self._kick(st, E, half=False)
        pe = potential_energy(rho, phi)
        return st, rho, phi, E, Diagnostics(kin_energy=ke, pot_energy=pe,
                                            n_lost=n_out)

    # ---------------------------------------------------------------- run
    def run(self, writer=None, progress_every: int = 10):
        import time
        t_start = time.monotonic()
        st, rho, phi, E, diag = self._thalf_jit(self.state)
        ke_hist = [np.asarray(diag.kin_energy)]
        pe_hist = [float(diag.pot_energy)]
        if writer is not None:
            out = StepOutput(self.to_particles(st), rho, phi, E, diag)
            writer.write_step(0, out)
            writer.write_energy(0, ke_hist[0], pe_hist[0])
        for n in range(1, self.n_time_steps + 1):
            st, rho, phi, E, diag = self._tstep_jit(st)
            # scheduled re-bucket, or adaptive early one when particles hit
            # the margin (their charge was withheld for this one step)
            if n % self.rebucket_every == 0 or int(diag.n_lost):
                if int(diag.n_lost):
                    msg(WARNING, "step %d: %d particle(s) reached the tile "
                        "margin; re-bucketing early", n, int(diag.n_lost))
                st, dropped = self._rebucket_jit(st)
                if int(dropped):
                    msg(WARNING, "step %d: %d particle(s) dropped by bucket "
                        "overflow (raise tiles:slack)", n, int(dropped))
            ke = np.asarray(diag.kin_energy)
            pe = float(diag.pot_energy)
            ke_hist.append(ke)
            pe_hist.append(pe)
            if writer is not None:
                out = StepOutput(self.to_particles(st), rho, phi, E, diag)
                writer.write_step(n, out)
                writer.write_energy(n, ke, pe)
            if progress_every and n % progress_every == 0:
                msg(STATUS, "Computing time-step %i (KE=%g PE=%g)",
                    n, ke.sum(), pe)
        jax.block_until_ready(st.lpos)
        wall = time.monotonic() - t_start
        from .utils.logging import TIMER
        msg(TIMER, "Time spent: %f s (%d steps)", wall, self.n_time_steps)
        self.state = st
        self.particles = self.to_particles(st)
        return {"kinetic": np.stack(ke_hist), "potential": np.asarray(pe_hist),
                "wall_time": wall}

    def make_scan_steps(self, n: int):
        """Scan with in-loop rebucketing every rebucket_every steps (static
        schedule via cond on the step index)."""
        R = self.rebucket_every

        def body(carry, i):
            st = carry
            st, rho, phi, E, diag = self._tiled_step(st)
            def do_rb(s):
                s2, _ = self._rebucket(s)
                return s2
            st = jax.lax.cond((i + 1) % R == 0, do_rb, lambda s: s, st)
            return st, (diag.kin_energy, diag.pot_energy)

        @jax.jit
        def run_n(st, rho_obj=None):
            return jax.lax.scan(body, st, jnp.arange(n))
        return run_n
