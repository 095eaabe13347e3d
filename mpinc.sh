#!/bin/bash
# Launcher — the reference's mpinc.sh equivalent (mpinc.sh:20-29).  The
# reference asked the binary for its required MPI size and exec'd mpirun;
# here one Python process drives all local devices through jax.sharding,
# so this wrapper just validates the deck's device demand against the
# available accelerator count and runs the module.
set -euo pipefail
if [ $# -lt 1 ]; then
    echo "usage: ./mpinc.sh <input.ini> [section:key=value ...]" >&2
    exit 2
fi
cd "$(dirname "$0")"
NP=$(python -m pinc_tpu "$@" getnp)
echo "deck requests ${NP} device(s)" >&2
exec python -m pinc_tpu "$@"
