#!/bin/bash
# Round-3 text-quality ladder, phase 5: frozen stacks trained past the twitchy early stop (patience 30).
# Phase 1 (quality_ladder.sh) measured the r2 levers at dim 512 and found
# the embedding-scale collapse; this phase measures the fix.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-runs/ladder_r3.jsonl}"
mkdir -p runs
COMMON="--train --epochs 100 --batch_size 8 --seq_len 64 \
  --use_learned_embeddings --embed_dim 512 --model_id char \
  --parameterization x0 --ema_decay 0.999"

run_one() {
  name="$1"; shift
  ckpt="runs/${name}.pth"
  if grep -q "\"name\": \"$name\"" "$OUT" 2>/dev/null; then
    echo "=== $name: already evaluated, skipping ==="
    return 0
  fi
  if [ -f "$ckpt" ]; then
    echo "=== $name: checkpoint exists, skipping train ==="
  else
    echo "=== $name: training ($*) ==="
    timeout 5400 python -m tinydiffusionmodels_tpu.shakespeare $COMMON \
      --ckpt "$ckpt" "$@" > "runs/${name}.train.log" 2>&1
    rc=$?
    if [ $rc -ne 0 ]; then
      echo "{\"name\": \"$name\", \"error\": \"train rc=$rc\"}" >> "$OUT"
      return 1
    fi
  fi
  echo "=== $name: fidelity eval ==="
  timeout 3600 python tools/text_fidelity.py --ckpt "$ckpt" --clamp --n 16 \
    > "runs/${name}.fid.json" 2> "runs/${name}.fid.log"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"name\": \"$name\", \"error\": \"fid rc=$rc\"}" >> "$OUT"
    return 1
  fi
  python - "$name" "runs/${name}.fid.json" "$OUT" <<'EOF'
import json, sys
name, fid_path, out = sys.argv[1:4]
fid = None
for line in open(fid_path):
    line = line.strip()
    if line.startswith("{"):
        try:
            fid = json.loads(line)
        except json.JSONDecodeError:
            pass
assert fid is not None, f"no JSON line in {fid_path}"
fid["name"] = name
with open(out, "a") as f:
    f.write(json.dumps(fid) + "\n")
print(name, "->", {k: fid.get(k) for k in
      ("lm_perplexity", "corpus_perplexity", "distinct_2", "dup_8gram_rate")})
EOF
}

run_one r3_zfp512 --embed_norm zscore --freeze_embeddings --patience 30 || true
run_one r3_zfp_sqrt512 --embed_norm zscore --freeze_embeddings --patience 30 --noise_schedule sqrt || true
run_one r3_zf_sc_sqrt512 --embed_norm zscore --freeze_embeddings --self_cond \
  --noise_schedule sqrt || true
echo "=== ladder5 done ==="
