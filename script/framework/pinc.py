"""Python driver framework — the equivalent of the reference's
``script/framework/pinc.py``: a ``Pinc`` class that runs the simulator as a
subprocess with ``section:key=value`` overrides and cleans the data
directory between runs (reference Pinc class, script/framework/pinc.py:20-52).

Unlike the reference (which could only shell out to the MPI binary), this
one can also run in-process (``method="inproc"``), which returns the energy
history directly without touching disk.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path
from typing import Dict, Optional

REPO_ROOT = Path(__file__).resolve().parents[2]


class Pinc(dict):
    """dict of overrides; call run(ini) to execute."""

    def __init__(self, ini: str | Path, overrides: Optional[Dict] = None,
                 python: str = sys.executable):
        super().__init__(overrides or {})
        self.ini = str(ini)
        self.python = python

    def _args(self):
        return [f"{k}={v}" for k, v in self.items()]

    def getnp(self) -> int:
        out = subprocess.run(
            [self.python, "-m", "pinc_tpu", self.ini, "getnp"] + self._args(),
            capture_output=True, text=True, check=True,
            cwd=REPO_ROOT)
        return int(out.stdout.strip())

    def clean(self) -> None:
        """Remove the output data dir (reference Pinc.clean)."""
        prefix = self.get("files:output", "")
        if prefix:
            d = Path(prefix)
            d = d if prefix.endswith("/") else d.parent
            if d.exists() and d != Path("."):
                shutil.rmtree(d)

    def run(self, check: bool = True) -> subprocess.CompletedProcess:
        return subprocess.run(
            [self.python, "-m", "pinc_tpu", self.ini] + self._args(),
            check=check, cwd=REPO_ROOT)

    def run_inproc(self):
        """Run inside this process and return the history dict."""
        sys.path.insert(0, str(REPO_ROOT))
        from pinc_tpu.config import PincConfig
        from pinc_tpu.parallel.pic import make_simulation
        cfg = PincConfig.from_file(self.ini, self._args())
        sim = make_simulation(cfg)
        return sim.run(progress_every=0)
