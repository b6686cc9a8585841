#!/bin/bash
# Round-5 quality program (VERDICT r4 items 1 + 2):
#  A. Anchor-CE for real — retrain the lost phase-E cells (configs from
#     tools/frontier_r4.sh) at the FLAGSHIP training budget (epochs 200 /
#     patience 30, matching r4_flag_rope6/rope9 so the comparison is
#     like-for-like), evaluate at 3 seeds x 64 samples, plus the dpm++20
#     few-step composition. Question: does --anchor_ce move cells ABOVE
#     the measured r4 ppl-vs-novelty pareto (the only in-family lever not
#     yet on the curve)?
#  W. Anchor weight sweep (run only if phase A beats the curve).
#  X. 10x-corpus data-scaling test — the r4 frontier says the curve is
#     dictated by corpus size; the hermetic corpus has only ~2.9 KB of
#     UNIQUE text tiled to 1 MB. Train the key cells on a ~10x-unique
#     public-domain corpus (tools/make_corpus_10x.py) tiled to the same
#     1 MB (same steps/epoch; only unique content changes) and re-measure
#     the pareto. Judge LM + corpus floor are retrained on the new corpus
#     (separate --lm_ckpt), so compare each ladder to its own floor.
#
# Usage: bash tools/frontier_r5.sh [phase...]   (default: a)
set -u
cd "$(dirname "$0")/.."
OUT="runs/ladder_r5.jsonl"
mkdir -p runs

# Flagship training budget (r4_flag_* cells in ladder_r4.jsonl trained with
# epochs 200 / patience 30 on top of frontier_r4.sh COMMON).
COMMON="--train --epochs 200 --batch_size 8 --seq_len 64 \
  --use_learned_embeddings --embed_dim 512 --model_id char \
  --parameterization x0 --ema_decay 0.999 --patience 30 \
  --embed_norm zscore --freeze_embeddings --pos_emb rope"

# run_entry NAME CKPT TRAIN_FLAGS FID_FLAGS [ENV...]
#   TRAIN_FLAGS empty -> eval-only on an existing checkpoint.
run_entry() {
  local name="$1" ckpt="$2" train_flags="$3" fid_flags="$4"
  shift 4
  if grep -q "\"name\": \"$name\"" "$OUT" 2>/dev/null; then
    echo "=== $name: already evaluated ==="
    return 0
  fi
  if [ ! -f "$ckpt" ]; then
    if [ -z "$train_flags" ]; then
      echo "{\"name\": \"$name\", \"error\": \"missing ckpt $ckpt\"}" >> "$OUT"
      return 1
    fi
    echo "=== $name: training ($train_flags) ==="
    env "$@" timeout 7200 python -m tinydiffusionmodels_tpu.shakespeare \
      $COMMON --ckpt "$ckpt" $train_flags > "runs/${name}.train.log" 2>&1 || {
      echo "{\"name\": \"$name\", \"error\": \"train failed\"}" >> "$OUT"
      return 1
    }
  fi
  echo "=== $name: fidelity eval ($fid_flags) ==="
  env "$@" timeout 7200 python tools/text_fidelity.py --ckpt "$ckpt" \
    $fid_flags 2> "runs/${name}.fid.log" | grep '^{' | tail -1 \
    > "runs/${name}.fid.json"
  python - "$name" "$fid_flags" <<'EOF'
import json, sys
name, flags = sys.argv[1], sys.argv[2]
fid = json.load(open(f"runs/{name}.fid.json"))
fid["name"] = name
fid["fid_flags"] = flags
open("runs/ladder_r5.jsonl", "a").write(json.dumps(fid) + "\n")
keep = ("lm_perplexity", "lm_perplexity_stderr", "corpus_8gram_overlap",
        "corpus_8gram_overlap_stderr", "distinct_2", "dup_8gram_rate")
print(name, "->", {k: fid.get(k) for k in keep})
EOF
}

phase_a() {
  # Anchor-CE at the two frontier ends, flagship budget + flagship eval.
  run_entry r5_rope6_anchor runs/r5_rope6_anchor.pth \
    "--depth 6 --anchor_ce 0.5" "--clamp --n 64 --seeds 3" || true
  run_entry r5_rope9_anchor runs/r5_rope9_anchor.pth \
    "--depth 9 --anchor_ce 0.5" "--clamp --n 64 --seeds 3" || true
  # Few-step composition (the r4 per-sample novelty dial) on the anchor
  # checkpoints — 3 seeds x 32 (r4 mid-curve cells were 2x32; VERDICT r4
  # item 6 asks for tighter error bars near the knee).
  for name in r5_rope6_anchor r5_rope9_anchor; do
    [ -f "runs/${name}.pth" ] || continue
    run_entry "${name}_dpmpp20" "runs/${name}.pth" "" \
      "--clamp --n 32 --seeds 3 --sampler dpm++ --steps 20" || true
    run_entry "${name}_dpmpp50" "runs/${name}.pth" "" \
      "--clamp --n 32 --seeds 3 --sampler dpm++ --steps 50" || true
  done
}

phase_w() {
  # Anchor weight sweep (only worth running if phase A beats the curve).
  run_entry r5_rope6_anchor02 runs/r5_rope6_anchor02.pth \
    "--depth 6 --anchor_ce 0.2" "--clamp --n 32 --seeds 3" || true
  run_entry r5_rope6_anchor10 runs/r5_rope6_anchor10.pth \
    "--depth 6 --anchor_ce 1.0" "--clamp --n 32 --seeds 3" || true
}

phase_x() {
  # 10x-unique-corpus data-scaling ladder. Corpus + matched judge.
  local CORPUS="runs/tiny_shakespeare_10x.txt"
  [ -f "$CORPUS" ] || python tools/make_corpus_10x.py --out "$CORPUS"
  local E="TINY_SHAKESPEARE_PATH=$CORPUS"
  local LM="--lm_ckpt runs/lm_char_10x.pth"
  run_entry r5x_rope6 runs/r5x_rope6.pth \
    "--depth 6" "--clamp --n 64 --seeds 3 $LM" "$E" || true
  run_entry r5x_rope9 runs/r5x_rope9.pth \
    "--depth 9" "--clamp --n 64 --seeds 3 $LM" "$E" || true
  run_entry r5x_rope9_do2 runs/r5x_rope9_do2.pth \
    "--depth 9 --dropout 0.2" "--clamp --n 32 --seeds 3 $LM" "$E" || true
  for name in r5x_rope6 r5x_rope9 r5x_rope9_do2; do
    [ -f "runs/${name}.pth" ] || continue
    run_entry "${name}_dpmpp20" "runs/${name}.pth" "" \
      "--clamp --n 32 --seeds 3 --sampler dpm++ --steps 20 $LM" "$E" || true
  done
  # Anchor x 10x-corpus cross (the two new levers together).
  run_entry r5x_rope6_anchor runs/r5x_rope6_anchor.pth \
    "--depth 6 --anchor_ce 0.5" "--clamp --n 32 --seeds 3 $LM" "$E" || true
}

phases="${*:-a}"
for p in $phases; do
  "phase_$p"
done
echo "=== frontier_r5 done ($phases) ==="
