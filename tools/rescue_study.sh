#!/bin/bash
# Flagship "published decode mode" rescue study (round 4, VERDICT ask #1).
#
# The 100k-step published-size flagship (tools/he_flagship_100k.sh)
# decodes at WER 0.0058 with the joint-CTC beam but 0.55 in the
# reference's published decode configuration — attention-only beam-8, no
# CTC, no LM (/root/reference/run.sh:79-93).  WER_SYNTH.md's diagnosis:
# free-running exposure bias at a 1024x2 decoder the synthetic corpus
# cannot discipline.  This study points the remedies the framework
# already ships at that exact failure, as CONTROLLED fine-tune arms from
# the SAME epoch-40 (step-100k) checkpoint — same data, same shards,
# same +15k-step budget, same constant fine-tune LR — so the remedy is
# the only variable:
#
#   ctl  control: nothing changes (isolates "15k more steps at 1e-4")
#   ss   scheduled sampling ON, decaying 1.0 -> min_rate 0.4 (the
#        reference's min_rate, arguments.py:167) across 100k..112.5k —
#        the reference's own anti-exposure-bias mechanism
#        (reference las/las.py:100-109, :177-183), activated
#        post-binding as the round-3 verdict prescribed
#   do   input-keep dropout 0.2 (encoder layers + decoder embedding,
#        reference's dropout_rate flag semantics)
#   ssdo both (run only if ss helps)
#
# Fine-tune mechanics: the epoch-40 orbax step dir is hardlinked into a
# fresh save_dir (cheap, read-only w.r.t. the original), config.json
# copied so check_model_config passes; train.py resumes the latest
# epoch (40 on first run) and continues global step 100000 -> 115000
# with the arm's flags.  scheduled_sampling/dropout_rate are training
# flags, not MODEL_FIELDS, so the resume guard correctly allows them.
#
# Stages: bash tools/rescue_study.sh [arm ...] [eval_ARM ...]
set -e -o pipefail
cd "$(dirname "$0")/.."

stages="${@:-ctl ss do}"
run_stage() { case " $stages " in *" $1 "*) return 0;; *) return 1;; esac; }

data=data/synth_he
work=exp/he
base=$work/model_f100k

# The base checkpoint the arms fine-tune from.  Default 40 (= step 100k,
# the round-3 flagship); BASE_EPOCH lets a shorter base run seed the
# arms when wall-clock forces cutting the base early — the design stays
# controlled because every arm shares the SAME base and budget, only the
# absolute step numbers shift.
BASE_EPOCH=${BASE_EPOCH:-40}
base_step=$((BASE_EPOCH * 2500))
# FT_EXTRA: fine-tune budget in epochs (x2500 steps); 6 = the designed
# +15k-step window, smaller values trade statistical power for wall-clock
ft_epochs=$((BASE_EPOCH + ${FT_EXTRA:-6}))

common="--unit char --feat_type mfcc --feat_dim 13 --cmvn True
  --train_100hr_corpus_dir $data/train
  --dev_data_dir $data/dev --test_data_dir $data/test
  --feat_dir $work/features --shard_dir $work/shards"

flagship="--enc_type cnn --enc_units 512 --num_enc_layers 4
  --num_enc_channels 32 --dec_units 1024 --num_dec_layers 2
  --embedding_size 256 --attention_size 128 --mode loc --scan_unroll 4"

# constant LR through every arm's fine-tune window: high enough to move
# a converged model (the 100k run ended at lr ~2.7e-5), identical across
# arms so the remedy stays the only variable
# restore_epoch stays -1 (latest): first run resumes the seeded epoch-40
# dir; a supervisor retry resumes the arm's own newest epoch instead of
# rewinding to 40
ft_sched="--lr 1e-4 --lr_decay_start 1000000000
  --epoch $ft_epochs --steps_per_epoch 2500
  --ctc True --ctc_weight 0.2 --dtype bfloat16 --steps_per_dispatch ${K:-50}
  --stall_timeout_s 3600
  --bucket_batch_sizes 32,32,32,32,32,32,32,32,32 --max_to_keep 10"

seed_arm() {  # seed_arm <dir>: hardlink the base-epoch checkpoint in
  local dir=$1
  mkdir -p "$dir"
  [ -e "$dir/$BASE_EPOCH" ] || cp -al "$base/$BASE_EPOCH" "$dir/$BASE_EPOCH"
  cp -f "$base/config.json" "$dir/config.json"
}

arm_flags() {
  case $1 in
    ctl)  echo "--scheduled_sampling False --dropout_rate 0.0";;
    ss)   echo "--scheduled_sampling True --warmup_step $base_step
                --max_step $((base_step + 12500)) --min_rate 0.4
                --dropout_rate 0.0";;
    # gentler sampling ramp: the ss arm's 1.0->0.4 over 12.5k steps at
    # lr 1e-4 destabilized training (gnorm 1e4-1e6, loss ~10 at tf 0.4;
    # measured pre-wipe on the round-3 checkpoint); ss2 stretches the
    # decay 4x (tf reaches ~0.85 by base+15k) and drops the fine-tune lr
    # to 3e-5 so the sampling shock stays trainable
    ss2)  echo "--scheduled_sampling True --warmup_step $base_step
                --max_step $((base_step + 60000)) --min_rate 0.4
                --dropout_rate 0.0 --lr 3e-5";;
    # full-ramp sampling at the stabilized lr (round 5): ss2's 4x-
    # stretched decay only reached tf ~0.93 inside the shortened
    # FT_EXTRA=4 window — no meaningful free-running exposure.  ss3
    # completes the 1.0 -> 0.4 ramp INSIDE a 15k-step window at the
    # same lr 3e-5 that kept ss2 stable, so the remedy is actually
    # administered at full dose
    ss3)  echo "--scheduled_sampling True --warmup_step $base_step
                --max_step $((base_step + 15000)) --min_rate 0.4
                --dropout_rate 0.0 --lr 3e-5";;
    do)   echo "--scheduled_sampling False --dropout_rate 0.2";;
    ssdo) echo "--scheduled_sampling True --warmup_step $base_step
                --max_step $((base_step + 12500)) --min_rate 0.4
                --dropout_rate 0.2";;
    # VERDICT round-3 ask #1 arm (a): online waveform augmentation on
    # the MXU (noise + speed perturb) to harden acoustics so the
    # decoder's grammar cannot dominate; needs the raw-audio shards
    # (stage aug_prep) because the frontend must run inside the jitted
    # train step to see a different waveform every epoch
    # recycle_after_steps: the aug arm feeds RAW f32 waveforms (~14
    # MB/step at K=25 through the leaky tunnel client — docs/
    # OPERATIONS.md "Host memory"), so an unbounded process OOMs the
    # 125 GB host near 9k steps; planned recycling (exit 21) caps it
    aug)  echo "--scheduled_sampling False --dropout_rate 0.0
                --audio_shards True --shard_dir $work/shards_audio
                --online_noise_perturb True --online_speed_perturb True
                --recycle_after_steps 6000";;
    *) echo "unknown arm $1" >&2; exit 2;;
  esac
}

if run_stage aug_prep; then
  echo "=== aug arm prep: raw-waveform shards of the HE corpus (host) ==="
  JAX_PLATFORMS=cpu python3 preprocess.py $common --audio_shards True \
    --feat_dir $work/features_audio
  JAX_PLATFORMS=cpu python3 create_shards.py $common --audio_shards True \
    --feat_dir $work/features_audio --shard_dir $work/shards_audio
fi

for arm in ctl ss ss2 ss3 do ssdo aug; do
  if run_stage $arm; then
    dir=$work/model_ft_$arm
    echo "=== rescue arm $arm: fine-tune 100k -> 115k ==="
    seed_arm "$dir"
    if [ "$arm" = aug ]; then
      # the seeded snapshot is the FEATURE-trained base's; the aug arm
      # legitimately flips the input representation without touching any
      # parameter shape (audio_shards is a MODEL_FIELD only to protect
      # --use_saved_config evals), so patch the seed before train.py's
      # resume guard compares it against the command line
      python3 -c "import json,sys; p=sys.argv[1]; c=json.load(open(p)); \
c['audio_shards']=True; json.dump(c, open(p,'w'))" "$dir/config.json"
    fi
    tools/train_supervised.sh 24 -- \
      python3 train.py $common $flagship $ft_sched $(arm_flags $arm) \
        --save_dir "$dir" \
        --log_dir $work/log_ft_$arm --summary_dir $work/summary_ft_$arm
  fi
done

eval_common="--use_saved_config True --scan_unroll 4
  --convert_rate 0.25 --report_cer True"

for arm in ctl ss ss2 ss3 do ssdo aug; do
  if run_stage eval_$arm; then
    dir=$work/model_ft_$arm
    e=${EVAL_EPOCH:-$ft_epochs}
    # the aug arm's snapshot says audio_shards=True, so its evals must
    # read the waveform shard series (last --shard_dir wins in argparse)
    extra=""
    [ "$arm" = aug ] && extra="--shard_dir $work/shards_audio"
    echo "=== arm $arm epoch $e: greedy (dev) ==="
    tools/train_supervised.sh 3 -- \
      python3 test.py $common $eval_common $extra --save_dir "$dir" \
      --split dev --restore_epoch $e | tail -2
    echo "=== arm $arm epoch $e: ATTENTION-ONLY beam-8 (dev) — the"
    echo "=== reference's published decode mode (run.sh:79-93) ==="
    # stall budget 1800 s: the remote compile service has been observed
    # taking ~25 min under contention, which a 900 s watchdog reads as a
    # dead tunnel (lost the ss2 att-beam on exactly this); retries via
    # the supervisor in case it really was transient
    tools/train_supervised.sh 3 -- \
      python3 decode.py $common $eval_common $extra --save_dir "$dir" \
      --split dev --restore_epoch $e --beam_size 8 --beam_logprob True \
      --stall_timeout_s 1800 | tail -3
    # archive this arm's att-beam hypotheses before the next stage
    # overwrites the shared dumps (consumed by tools/error_analysis.py)
    cp -f $work/log_f100k/decode_pred.txt \
      $work/log_f100k/attbeam_${arm}_pred.txt 2>/dev/null || true
    cp -f $work/log_f100k/decode_gt.txt \
      $work/log_f100k/attbeam_${arm}_gt.txt 2>/dev/null || true
  fi
done
