#!/usr/bin/env bash
# Bootstrap reverso-tpu (the reference ships setup.sh/run.sh; this is the
# equivalent for this framework — reference setup.sh:1-394).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "==> installing package (editable)"
pip install -e . --no-build-isolation

echo "==> building native runtime"
if command -v g++ >/dev/null 2>&1; then
  make -C native
else
  echo "    g++ not found - the numpy fallback will be used"
fi

echo "==> running the test suite (CPU, 8 virtual devices)"
python -m pytest tests/ -q

cat <<'EOF'

Setup complete. Next steps:
  reverso build <folder> --name mydb --direct-pe     # index a folder
  reverso search <image> --name mydb                 # query it
  reverso serve                                      # web UI
For prompt-conditioned region detection, point these at local
checkpoints (converted automatically at load):
  export REVERSO_DINO_CKPT=/path/to/grounding-dino-tiny
  export REVERSO_SAM_CKPT=/path/to/sam-vit-base
  export REVERSO_BERT_VOCAB=/path/to/vocab.txt
EOF
