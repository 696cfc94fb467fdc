#!/bin/bash
# pBLSTM Listener at study scale (round 4, VERDICT ask #5).
#
# The reference SHIPS its pyramidal encoder broken (las/las.py:15-21
# passes 7 args incl. apply_bn to the 6-param pBLSTMLayer,
# las/layers.py:56 — TypeError on first call); this framework's working
# variant (models/las.py:_pblstm_listener) had only unit-scale coverage.
# This arm trains it with the validated control recipe on the
# high-entropy corpus so the ENCODER TYPE is the only variable against
# the CNN control arm (WER_SYNTH.md: greedy dev 0.0094 @ E28, test
# 0.0044).
#
# Geometry: 1 BLSTM + 2 pyramid stages -> time/4, the SAME reduction as
# the CNN's two stride-2 convs, so attention sees equal resolution AND
# the CTC head keeps enc_len >= tokenlen (3 stages' time/8 would
# violate the CTC length constraint on long transcripts).
#
# Stages: bash tools/pblstm_study.sh [train|eval|final|beam]...
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-train eval}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth_he
work=exp/he

common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards
  --log_dir $work/log_pblstm --summary_dir $work/summary_pblstm"

pblstm="--enc_type pblstm --enc_units 256 --num_enc_layers 2
  --dec_units 256 --num_dec_layers 2
  --embedding_size 128 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"

if run_stage train; then
  echo "=== pBLSTM arm (control schedule: lr 1e-3, halved/3k from 9k) ==="
  tools/train_supervised.sh 24 -- \
    python3 train.py $common $pblstm --save_dir $work/model_pblstm \
      --ctc True --ctc_weight 0.2 \
      --epoch 28 --steps_per_epoch 750 \
      --lr 1e-3 --lr_decay_start 9000 --lr_decay_step 3000 \
      --lr_decay_rate 0.5 --dtype bfloat16 --steps_per_dispatch 16 \
      --stall_timeout_s 3600 \
      --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 28
fi

eval_common="--use_saved_config True --scan_unroll 4
  --convert_rate 0.25 --report_cer True"

if run_stage eval; then
  echo "=== pBLSTM greedy WER trajectory (dev) ==="
  for e in 8 16 22 28; do
    python3 test.py $common $eval_common --save_dir $work/model_pblstm \
      --split dev --restore_epoch $e | tail -2
  done
fi

if run_stage final; then
  e=${BEST_E:-28}
  echo "=== pBLSTM greedy test @ E$e ==="
  python3 test.py $common $eval_common --save_dir $work/model_pblstm \
    --split test --restore_epoch $e | tail -2
fi

if run_stage beam; then
  e=${BEST_E:-28}
  for split in dev test; do
    echo "=== pBLSTM joint-CTC beam-8 $split @ E$e ==="
    python3 decode.py $common $eval_common --save_dir $work/model_pblstm \
      --split $split --restore_epoch $e --beam_size 8 --beam_logprob True \
      --ctc_beam_weight 0.5 --stall_timeout_s 3600 | tail -3
  done
fi
