#!/bin/bash
# Round-4 flagship decode experiments (VERDICT asks #4 and #7):
#   avg      uniform-average the e32..e40 greedy-plateau checkpoints
#            (tools/average_checkpoints.py) into model_f100k_avg
#   avg_eval greedy / att-only beam-8 / joint-CTC beam-8 of the average
#            vs the e40 single checkpoint (dev)
#   lmsweep  LM shallow fusion COMPOSED with the measured-recommended
#            joint-CTC beam-8 decode (lambda sweep on dev) — the
#            deployment configuration; round 3 only measured fusion on
#            attention-only beams (reference fusion mechanics:
#            las/beam_search.py:109-116)
#   lmtest   best-lambda fusion decode on held-out test
#
# Usage: bash tools/flagship_round4.sh [avg|avg_eval|lmsweep|lmtest]...
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-avg avg_eval lmsweep}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth_he
work=exp/he
model=$work/model_f100k
lm=$work/lm/model_r4

# Base epoch the single-checkpoint decodes restore and the average ends
# at; defaults to the round-3 flagship's 40, override with BASE_EPOCH
# when the base run was cut short (see tools/rescue_study.sh).
BASE_EPOCH=${BASE_EPOCH:-40}
avg_epochs=$(seq -s, $((BASE_EPOCH - 8)) $BASE_EPOCH)

common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --log_dir $work/log_f100k --summary_dir $work/summary_f100k"

eval_common="--use_saved_config True --scan_unroll 4
  --convert_rate 0.25 --report_cer True"

if run_stage lm; then
  # Char RNNLM for the fusion sweep: the round-3 recipe (2xLSTM-512 on
  # the train-split transcripts, host CPU — the text is ~0.4 MB) with
  # best-model tracking into result.json, which decode.py --lm_dir reads.
  echo "=== LM: concat train transcripts -> train 2xLSTM-512 ==="
  mkdir -p $work/lm
  find $data/train -name '*.trans.txt' | sort | xargs cat \
    | cut -d' ' -f2- > $work/lm/corpus.txt
  wc -c $work/lm/corpus.txt
  JAX_PLATFORMS=cpu python3 train_lm.py --data_file $work/lm/corpus.txt \
    --hidden_size 512 --num_layers 2 --model lstm \
    --num_epochs "${LM_EPOCHS:-12}" --output_dir $lm
fi

if run_stage avg; then
  echo "=== average e$((BASE_EPOCH - 8))..e$BASE_EPOCH -> model_f100k_avg ==="
  JAX_PLATFORMS=cpu python3 tools/average_checkpoints.py $common --save_dir $model \
    --use_saved_config True \
    --avg_epochs $avg_epochs --avg_out ${model}_avg
  # the averaged dir is a fresh save_dir: give it the source's config
  # snapshot so avg_eval's --use_saved_config resolves (config.load_saved
  # raises on a missing snapshot by design)
  cp -f $model/config.json ${model}_avg/config.json
fi

if run_stage avg_eval; then
  for m in ${model}_avg; do
    echo "=== $m: greedy (dev) ==="
    python3 test.py $common $eval_common --save_dir $m \
      --split dev --restore_epoch 1 | tail -2
    echo "=== $m: attention-only beam-8 (dev) ==="
    python3 decode.py $common $eval_common --save_dir $m \
      --split dev --restore_epoch 1 --beam_size 8 --beam_logprob True \
      --stall_timeout_s 900 | tail -3
    echo "=== $m: joint-CTC beam-8 (dev) ==="
    python3 decode.py $common $eval_common --save_dir $m \
      --split dev --restore_epoch 1 --beam_size 8 --beam_logprob True \
      --ctc_beam_weight 0.5 --stall_timeout_s 900 | tail -3
  done
fi

if run_stage lmsweep; then
  for lam in 0.05 0.1 0.3; do
    echo "=== joint-CTC beam-8 + LM lambda=$lam (dev) ==="
    python3 decode.py $common $eval_common --save_dir $model \
      --split dev --restore_epoch $BASE_EPOCH --beam_size 8 --beam_logprob True \
      --ctc_beam_weight 0.5 --apply_lm True --lm_dir $lm \
      --lm_weight $lam --stall_timeout_s 900 | tail -3
  done
fi

if run_stage lmtest; then
  lam=${LM_LAMBDA:-0.1}
  echo "=== joint-CTC beam-8 + LM lambda=$lam (test) ==="
  python3 decode.py $common $eval_common --save_dir $model \
    --split test --restore_epoch $BASE_EPOCH --beam_size 8 --beam_logprob True \
    --ctc_beam_weight 0.5 --apply_lm True --lm_dir $lm \
    --lm_weight $lam --stall_timeout_s 900 | tail -3
fi
