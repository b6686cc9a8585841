#!/bin/bash
# Round-4 quality program (VERDICT r3 item 1):
#  A. Replicated flagship scorecard — the three headline points re-scored
#     with >=3 seeds x 64 samples (mean +/- stderr via text_fidelity
#     --seeds; single-seed n=16 points were too volatile to quote).
#  B. ppl-vs-novelty frontier, sampler side — temperature / step sweeps on
#     the EXISTING r3 checkpoints spanning the frontier's two known ends:
#     depth-6 (ppl 5.93 @ 64% corpus-8gram overlap) and depth-9
#     (1.14 @ 99.3% = memorization).
#  C. Frontier, training side — regularization at depth 9 (dropout /
#     weight-decay) and the capacity midpoints (depth 7/8).
# Target: best point with >=30% novel 8-grams (overlap <= 0.70) at
# judge-ppl <= 3.0, or a measured frontier showing the limit.
#
# Usage: bash tools/frontier_r4.sh [phase...]   (default: all)
set -u
cd "$(dirname "$0")/.."
OUT="runs/ladder_r4.jsonl"
mkdir -p runs

COMMON="--train --epochs 300 --batch_size 8 --seq_len 64 \
  --use_learned_embeddings --embed_dim 512 --model_id char \
  --parameterization x0 --ema_decay 0.999 --patience 40 \
  --embed_norm zscore --freeze_embeddings --pos_emb rope"

# run_entry NAME CKPT TRAIN_FLAGS FID_FLAGS
#   TRAIN_FLAGS empty -> eval-only on an existing checkpoint.
run_entry() {
  local name="$1" ckpt="$2" train_flags="$3" fid_flags="$4"
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
    timeout 7200 python -m tinydiffusionmodels_tpu.shakespeare $COMMON \
      --ckpt "$ckpt" $train_flags > "runs/${name}.train.log" 2>&1 || {
      echo "{\"name\": \"$name\", \"error\": \"train failed\"}" >> "$OUT"
      return 1
    }
  fi
  echo "=== $name: fidelity eval ($fid_flags) ==="
  timeout 7200 python tools/text_fidelity.py --ckpt "$ckpt" $fid_flags \
    2> "runs/${name}.fid.log" | grep '^{' | tail -1 > "runs/${name}.fid.json"
  python - "$name" "$fid_flags" <<'EOF'
import json, sys
name, flags = sys.argv[1], sys.argv[2]
fid = json.load(open(f"runs/{name}.fid.json"))
fid["name"] = name
fid["fid_flags"] = flags
open("runs/ladder_r4.jsonl", "a").write(json.dumps(fid) + "\n")
keep = ("lm_perplexity", "lm_perplexity_stderr", "corpus_8gram_overlap",
        "corpus_8gram_overlap_stderr", "distinct_2", "dup_8gram_rate")
print(name, "->", {k: fid.get(k) for k in keep})
EOF
}

phase_a() {
  # Replicated flagships (3 seeds x 64 samples). Round-3 checkpoints do
  # not survive between rounds, so each entry carries the exact r3 ladder
  # training flags (quality_ladder.sh COMMON: epochs 200 / patience 30)
  # and retrains if the checkpoint is missing.
  run_entry r4_flag_rope6 runs/r3_rope6_512.pth \
    "--depth 6 --epochs 200 --patience 30" \
    "--clamp --n 64 --seeds 3" || true
  run_entry r4_flag_rope9 runs/r3_rope9_512.pth \
    "--depth 9 --epochs 200 --patience 30" \
    "--clamp --n 64 --seeds 3" || true
  run_entry r4_flag_bpe runs/r3_bpe_rope6.pth \
    "--model_id bpe:512 --depth 6 --epochs 200 --patience 30" \
    "--clamp --n 64 --seeds 3 --lm_ckpt runs/lm_bpe512.pth" || true
  run_entry r4_flag_guided runs/r3_rope6_512.pth "" \
    "--mode guided --alpha 0.3 --guidance_norm --n 64 --seeds 3" || true
}

phase_b() {
  # Sampler-side frontier on the two existing frontier-end checkpoints.
  for t in 1.1 1.2 1.35 1.5; do
    run_entry "r4_rope9_t${t/./}" runs/r3_rope9_512.pth "" \
      "--clamp --n 32 --seeds 2 --temperature $t" || true
  done
  for t in 0.8 0.9; do
    run_entry "r4_rope6_t${t/./}" runs/r3_rope6_512.pth "" \
      "--clamp --n 32 --seeds 2 --temperature $t" || true
  done
  run_entry r4_rope9_ddim20 runs/r3_rope9_512.pth "" \
    "--clamp --n 32 --seeds 2 --sampler ddim --steps 20" || true
  run_entry r4_rope9_dpmpp20 runs/r3_rope9_512.pth "" \
    "--clamp --n 32 --seeds 2 --sampler dpm++ --steps 20" || true
}

phase_c() {
  # Training-side frontier: regularized depth 9 + capacity midpoints.
  run_entry r4_rope9_do2 runs/r4_rope9_do2.pth \
    "--depth 9 --dropout 0.2" "--clamp --n 32 --seeds 2" || true
  run_entry r4_rope9_do3 runs/r4_rope9_do3.pth \
    "--depth 9 --dropout 0.3" "--clamp --n 32 --seeds 2" || true
  run_entry r4_rope9_wd1e2 runs/r4_rope9_wd1e2.pth \
    "--depth 9 --weight_decay 1e-2" "--clamp --n 32 --seeds 2" || true
  run_entry r4_rope7 runs/r4_rope7.pth \
    "--depth 7" "--clamp --n 32 --seeds 2" || true
  run_entry r4_rope8 runs/r4_rope8.pth \
    "--depth 8" "--clamp --n 32 --seeds 2" || true
}

phase_d() {
  # Combined frontier: the step-count axis (phase B's one lever that broke
  # depth-9 memorization: dpm++20 -> ppl 4.13 @ 70.8% overlap) swept finer,
  # then crossed with phase C's regularized checkpoints. Eval-only.
  # Highest-expected-value first (phase C's winner x phase B's winner):
  # dropout-0.2 checkpoint under few-step sampling.
  for name in r4_rope9_do2 r4_rope9_do3 r4_rope9_wd1e2 r4_rope7 r4_rope8; do
    [ -f "runs/${name}.pth" ] || continue
    run_entry "${name}_dpmpp20" "runs/${name}.pth" "" \
      "--clamp --n 32 --seeds 2 --sampler dpm++ --steps 20" || true
    run_entry "${name}_dpmpp50" "runs/${name}.pth" "" \
      "--clamp --n 32 --seeds 2 --sampler dpm++ --steps 50" || true
  done
  for s in 10 15 30 50 100 300; do
    run_entry "r4_rope9_dpmpp${s}" runs/r3_rope9_512.pth "" \
      "--clamp --n 32 --seeds 2 --sampler dpm++ --steps $s" || true
  done
  run_entry r4_rope9_ddim50 runs/r3_rope9_512.pth "" \
    "--clamp --n 32 --seeds 2 --sampler ddim --steps 50" || true
  # dpm++20 with mild temperature: phase B showed T alone cannot break
  # memorization but it added diversity (distinct-2 0.10 -> 0.17).
  run_entry r4_rope9_dpmpp20_t11 runs/r3_rope9_512.pth "" \
    "--clamp --n 32 --seeds 2 --sampler dpm++ --steps 20 --temperature 1.1" \
    || true
}

phase_e() {
  # Training-side frontier, new lever: Diffusion-LM's anchor CE (rounding
  # CE on the PREDICTED x0, --anchor_ce) — pulls the denoiser toward
  # decodable embeddings instead of only teaching the head to decode
  # clean ones.
  run_entry r4_rope6_anchor runs/r4_rope6_anchor.pth \
    "--depth 6 --anchor_ce 0.5" "--clamp --n 32 --seeds 2" || true
  run_entry r4_rope9_anchor runs/r4_rope9_anchor.pth \
    "--depth 9 --anchor_ce 0.5" "--clamp --n 32 --seeds 2" || true
  for name in r4_rope6_anchor r4_rope9_anchor; do
    [ -f "runs/${name}.pth" ] || continue
    run_entry "${name}_dpmpp20" "runs/${name}.pth" "" \
      "--clamp --n 32 --seeds 2 --sampler dpm++ --steps 20" || true
  done
}

phases="${*:-a b c}"
for p in $phases; do
  "phase_$p"
done
echo "=== frontier_r4 done ($phases) ==="
