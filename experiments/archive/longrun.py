"""10k-step energy-conservation record on the bench deck (BASELINE.md
acceptance: stable drift over 10k steps).  Chunked scans keep the static
re-bucket schedule small."""
import sys, time
import numpy as np
import jax
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation

import os
deck = open('/root/repo/experiments/bench_deck.ini').read().replace(
    'nTimeSteps = 20', 'nTimeSteps = 10000')
if os.environ.get("LONGRUN_RESOLVED"):
    # Debye-resolved warm plasma (lambda_D = 0.5 dx): the regime where
    # leapfrog+CIC genuinely conserves energy.  The lambda_D = 0.1 dx
    # bench deck grid-heats at +2.6e-4 dE/E per step (textbook CIC
    # heating, identical on the mega and pair paths) and the heated
    # velocity tail eventually overflows any fixed exchange cap.
    deck = deck.replace("thermalVelocity = 0.02,0.0005",
                        "thermalVelocity = 0.1,0.0023")
cfg = PincConfig.from_string(deck)
t0 = time.monotonic()
sim = TiledSimulation(cfg, seed=1)
n0 = int(jax.device_get(sim.state.alive.sum()))
print(f"setup {time.monotonic()-t0:.0f}s n={n0:,} "
      f"cadences={sim.rebucket_every_s}", flush=True)

CH = int(os.environ.get('LONGRUN_CHUNK', '500'))
run_ch = sim.make_scan_steps(CH)
st = sim.state
kes, pes, drops = [], [], 0
t0 = time.monotonic()
for c in range(10000 // CH):
    st, (ke, pe, dropped) = run_ch(st)
    ke = np.asarray(ke)
    kes.append(ke)
    pes.append(np.asarray(pe))
    drops += int(dropped)
    tot = ke.sum(axis=1) + pes[-1]
    print(f"chunk {c:3d}: E={tot[-1]:.6e} drops_cum={drops} "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    if sim.retune(st):
        run_ch = sim.make_scan_steps(CH)
ke = np.concatenate(kes).sum(axis=1)
pe = np.concatenate(pes)
tot = ke + pe
wall = time.monotonic() - t0
n1 = int(jax.device_get(st.alive.sum()))
np.save('/tmp/longrun_tot.npy', tot)
print(f"10000 steps in {wall:.0f}s -> {n0*10000/wall:.3e} psteps/s",
      flush=True)
print(f"E0={tot[0]:.6e} E[-1]={tot[-1]:.6e} "
      f"drift={(tot[-1]-tot[0])/tot[0]*100:.2f}%", flush=True)
print(f"particles {n0:,} -> {n1:,} dropped={drops} "
      f"({drops/n0*1e6:.1f} ppm)", flush=True)
