#!/bin/bash
# Noise-robustness study: does on-device training-time augmentation
# (--online_noise_perturb/--online_volume_perturb, ops/augmentation.py)
# recover accuracy on acoustically degraded speech?
#
# Corpus: 6k clean formant-synthesized utterances (tools/synth_corpus.py,
# seed 42) plus a degraded copy rendered by tools/degrade_corpus.py
# (pink noise at per-utterance SNR ~ U[5,20] dB + reverb with p=0.5,
# RT60 ~ U[0.15,0.5] s).  Clean and degraded corpora are sample-aligned
# (same utterances), so eval WERs pair exactly (tools/wer_ci.py).
#
# Arms (all --audio_shards: the frontend and augmentation run inside the
# jitted train step):
#   A  train on clean, no augmentation          (mismatched baseline)
#   B  train on clean + online noise/volume aug (the capability under test)
#   C  train on the fixed degraded corpus       (matched-condition topline)
#   D  like B but --online_noise_p 0.5          (mixed-condition: arm B
#      showed always-on noise costs clean accuracy; the coin keeps clean
#      speech in the training distribution)
# Each arm evals greedy on clean-dev AND noisy-dev per epoch of interest.
#
# Stage selection: bash tools/robust_study.sh [corpus|shards|trainA|
#   trainB|trainC|trainD|eval|beam]...  (no args = all stages)
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-corpus shards trainA trainB trainC trainD eval beam}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth6k
noisy=data/synth6k_noisy
work=exp/robust
mkdir -p $work

feat="--unit char --feat_type mfcc --feat_dim 13 --cmvn True --audio_shards True"
model="--enc_type cnn --enc_units 256 --num_enc_layers 3
  --num_enc_channels 32 --dec_units 256 --num_dec_layers 2
  --embedding_size 128 --attention_size 128 --mode loc
  --dropout_rate 0.0 --scheduled_sampling False --scan_unroll 4"
train_common="--ctc True --ctc_weight 0.2 --epoch 24 --steps_per_epoch 188
  --lr 1e-3 --lr_decay_start 3000 --lr_decay_step 1500 --lr_decay_rate 0.5
  --dtype bfloat16 --steps_per_dispatch 16 --stall_timeout_s 900
  --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 24"

if run_stage corpus; then
  [ -d $data/train ] || python3 tools/synth_corpus.py --out $data \
    --train_utts 6000 --dev_utts 300 --test_utts 300 \
    --train_speakers 32 --eval_speakers 6 --seed 42
  [ -d $noisy/train ] || python3 tools/degrade_corpus.py --in_dir $data \
    --out_dir $noisy --noise_snr 5,20 --noise_kind pink --reverb_p 0.5
fi

if run_stage shards; then
  for cond in clean noisy; do
    src=$data; [ $cond = noisy ] && src=$noisy
    dirs="--train_100hr_corpus_dir $src/train --dev_data_dir $src/dev
      --test_data_dir $src/test --feat_dir $work/feat_$cond
      --shard_dir $work/shards_$cond"
    python3 preprocess.py $feat $dirs
    python3 create_shards.py $feat $dirs
  done
fi

train_arm() {  # $1 = arm name, $2 = shard dir, $3 = extra flags
  python3 train.py $feat $model $train_common --shard_dir $2 \
    --save_dir $work/model_$1 --log_dir $work/log_$1 \
    --summary_dir $work/summary_$1 $3
}
if run_stage trainA; then train_arm A $work/shards_clean ""; fi
if run_stage trainB; then train_arm B $work/shards_clean \
  "--online_noise_perturb True --online_noise_snr_low 5 --online_noise_snr_high 20 --online_noise_kind pink --online_volume_perturb True"; fi
if run_stage trainC; then train_arm C $work/shards_noisy ""; fi
if run_stage trainD; then train_arm D $work/shards_clean \
  "--online_noise_perturb True --online_noise_p 0.5 --online_noise_snr_low 5 --online_noise_snr_high 20 --online_noise_kind pink --online_volume_perturb True"; fi

if run_stage eval; then
  for arm in A B C D; do
    for cond in clean noisy; do
      python3 test.py $feat --use_saved_config True \
        --save_dir $work/model_$arm --shard_dir $work/shards_$cond \
        --split dev --stall_timeout_s 900 \
        --log_dir $work/eval_${arm}_${cond} \
        --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 \
        | tee $work/eval_${arm}_${cond}.txt
    done
  done
fi

# beam decode per arm: the greedy-vs-beam gap is the study's EOS-failure
# diagnostic (mixed-condition arm D greedy-loops but beam-decodes fine)
if run_stage beam; then
  for arm in A B C D; do
    for cond in clean noisy; do
      python3 decode.py $feat --use_saved_config True \
        --save_dir $work/model_$arm --shard_dir $work/shards_$cond \
        --split dev --stall_timeout_s 900 --beam_size 8 \
        --log_dir $work/beam_${arm}_${cond} \
        | tee $work/beam_${arm}_${cond}.txt
    done
  done
fi

if run_stage eval || run_stage beam; then
  echo "=== summary (dev WER, greedy / beam8) ==="
  for arm in A B C D; do
    for cond in clean noisy; do
      printf "%s on %s: %s / %s\n" $arm $cond \
        "$(grep -o 'WER: [0-9.]*' $work/eval_${arm}_${cond}.txt 2>/dev/null | tail -1)" \
        "$(grep -o 'WER: [0-9.]*' $work/beam_${arm}_${cond}.txt 2>/dev/null | tail -1)"
    done
  done
fi
