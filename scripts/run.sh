#!/usr/bin/env bash
# Launch the web UI (the reference's run.sh equivalent, reference run.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m reverso_tpu.cli serve "$@"
