#!/bin/bash
# Text-quality ladder runner: train a named configuration of the
# shakespeare CLI and judge it with tools/text_fidelity.py, appending one
# JSON line per config to runs/ladder_r3.jsonl.
#
# Round 3 ran 21 configurations through this harness (results:
# runs/ladder_r3.jsonl; writeup: docs/.../2026-08-17-embedding-scale.md).
# The winning stack:
#   bash tools/quality_ladder.sh r3_rope6_512 --depth 6 --epochs 200
# on top of COMMON below (x0 + EMA + zscore + frozen embeddings + rope).
#
# Usage:
#   bash tools/quality_ladder.sh NAME [extra CLI flags...]
#   LADDER_COMMON="..." bash tools/quality_ladder.sh NAME ...  # override
set -u
cd "$(dirname "$0")/.."
OUT="runs/ladder_r3.jsonl"
mkdir -p runs
COMMON=${LADDER_COMMON:-"--train --epochs 200 --batch_size 8 --seq_len 64 \
  --use_learned_embeddings --embed_dim 512 --model_id char \
  --parameterization x0 --ema_decay 0.999 --patience 30 \
  --embed_norm zscore --freeze_embeddings --pos_emb rope"}

name="$1"; shift
ckpt="runs/${name}.pth"
if grep -q "\"name\": \"$name\"" "$OUT" 2>/dev/null; then
  echo "=== $name: already evaluated ==="
  exit 0
fi
if [ ! -f "$ckpt" ]; then
  echo "=== $name: training ($*) ==="
  timeout 7200 python -m tinydiffusionmodels_tpu.shakespeare $COMMON \
    --ckpt "$ckpt" "$@" > "runs/${name}.train.log" 2>&1 || {
    echo "{\"name\": \"$name\", \"error\": \"train failed\"}" >> "$OUT"
    exit 1
  }
fi
echo "=== $name: fidelity eval ==="
timeout 3600 python tools/text_fidelity.py --ckpt "$ckpt" --clamp --n 16 \
  2> "runs/${name}.fid.log" | grep '^{' | tail -1 > "runs/${name}.fid.json"
python - "$name" <<'EOF'
import json, sys
name = sys.argv[1]
fid = json.load(open(f"runs/{name}.fid.json"))
fid["name"] = name
open("runs/ladder_r3.jsonl", "a").write(json.dumps(fid) + "\n")
print(name, "->", {k: fid.get(k) for k in
      ("lm_perplexity", "distinct_2", "dup_8gram_rate",
       "corpus_8gram_overlap")})
EOF
