"""High-level inference API: load a trained model, transcribe audio files.

The reference has no equivalent — users must drive decode.py by hand.
`Recognizer` packages the full path (audio decode -> on-device frontend ->
greedy or beam decoding -> detokenization) behind one object:

    rec = Recognizer.from_checkpoint(save_dir, cfg)       # or cfg json
    texts = rec.transcribe(["a.flac", "b.wav"], beam_size=8)

Batches are formed internally (length-sorted, shape-quantized) so a list
of files decodes in a handful of device calls.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .data.audio_io import read_audio
from .decoding import beam as beam_lib
from .models import char_rnn
from .ops import frontend
from .training import trainer
from .training.checkpoint import CheckpointManager
from .utils.text import convert_idx_to_string
from .utils.tokenizer import get_tokenizer


class Recognizer:
    """Trained LAS model + tokenizer + (optional) fusion LM."""

    def __init__(self, params, bn_state, cfg: Config, tokenizer,
                 lm_params=None, lm_cfg=None, mesh=None):
        self.params = params
        self.bn_state = bn_state
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.lm_params = lm_params
        self.lm_cfg = lm_cfg
        self.mesh = mesh
        self._dp = mesh.shape[cfg.data_axis] if mesh is not None else 1

    @classmethod
    def from_checkpoint(cls, save_dir: str, cfg: Config,
                        epoch: int = -1, lm_dir: str = "",
                        use_mesh: bool = True) -> "Recognizer":
        tokenizer = get_tokenizer(cfg.unit, cfg.subword_dir)
        cfg = cfg.replace(vocab_size=tokenizer.get_vocab_size())
        ts = trainer.create_train_state(jax.random.PRNGKey(cfg.seed), cfg)
        restored = CheckpointManager(save_dir).restore_for_eval(ts, epoch=epoch)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {save_dir}")
        lm_params = lm_cfg = None
        if lm_dir:
            with open(os.path.join(lm_dir, "result.json")) as f:
                result = json.load(f)
            lm_cfg = char_rnn.LMConfig(**{
                k: v for k, v in result["params"].items()
                if k in char_rnn.LMConfig.__dataclass_fields__})
            lm_ts = char_rnn.create_lm_train_state(jax.random.PRNGKey(0),
                                                   lm_cfg)
            lm_restored = CheckpointManager(
                os.path.join(lm_dir, "lang", "best_model")).restore(lm_ts)
            if lm_restored is None:
                raise FileNotFoundError(f"no LM checkpoint in {lm_dir}")
            lm_params = lm_restored.params
        from .ops import quant
        params = quant.maybe_quantize_params(restored.params, cfg)
        if lm_params is not None and cfg.quantize_decoder != "none":
            lm_params = quant.quantize_lm(lm_params, lm_cfg)
        bn_state = restored.bn_state
        # SPMD serving over the same ('data','model') mesh the offline
        # drivers use (test.py/decode.py): params by the tensor-parallel
        # rule, request batches along 'data', fusion LM replicated.  The
        # reference serves nothing and hardcodes one device everywhere
        # (reference test.py:24, decode.py:24); a 1-device mesh is the
        # degenerate case and costs nothing.
        mesh = None
        if use_mesh and jax.process_count() == 1:
            from .parallel import sharding as shd
            from .parallel.mesh import make_mesh
            mesh = make_mesh(num_partitions=cfg.num_partitions,
                             data_axis=cfg.data_axis,
                             model_axis=cfg.model_axis)
            params, bn_state = shd.place_eval_params(mesh, params, bn_state,
                                                     cfg.model_axis)
            if lm_params is not None:
                lm_params, _ = shd.place_eval_params(mesh, lm_params, {},
                                                     cfg.model_axis)
        return cls(params, bn_state, cfg, tokenizer,
                   lm_params, lm_cfg, mesh=mesh)

    def _features(self, signals: Sequence[np.ndarray],
                  pad_seconds: int = 0):
        """pad_seconds > 0 pins the padded signal length (a jit shape key)
        to a fixed bucket so repeated calls reuse one compiled program —
        the serving path relies on this to bound compile churn."""
        maxlen = max(len(s) for s in signals)
        quantum = self.cfg.sample_rate  # 1 s shape quantization
        S = max(-(-maxlen // quantum), pad_seconds) * quantum
        audio = np.zeros((len(signals), S), np.float32)
        lens = np.zeros((len(signals),), np.int32)
        for i, s in enumerate(signals):
            audio[i, :len(s)] = s
            lens[i] = len(s)
        return frontend.extract_features_cfg(
            jnp.asarray(audio), jnp.asarray(lens), self.cfg)

    def transcribe_signals(self, signals: Sequence[np.ndarray],
                           beam_size: int = 0,
                           pad_seconds: int = 0) -> List[str]:
        """signals: float waveforms at cfg.sample_rate.
        beam_size 0/1 -> greedy; >1 -> on-device beam search."""
        n = len(signals)
        if self._dp > 1 and n % self._dp:
            # pad the request batch so dim 0 shards evenly over 'data';
            # pad rows are 1-sample silence (featlen ~ 1) and their
            # hypotheses are sliced off below
            from .parallel import sharding as shd
            signals = list(signals) + [np.zeros(1, np.float32)] * (
                shd.pad_batch_to(n, self._dp) - n)
        feats, featlen = self._features(signals, pad_seconds)
        if self.mesh is not None:
            # the fused frontend is a Pallas call GSPMD cannot partition;
            # reshard its output onto the mesh (device-to-device put)
            from .parallel import sharding as shd
            feats, featlen = shd.place_data_batch(
                self.mesh, (feats, featlen), self.cfg.data_axis)
        max_steps = max(int(self.cfg.convert_rate * feats.shape[1]), 1)
        if beam_size and beam_size > 1:
            res = beam_lib.beam_search(
                self.params, self.bn_state, feats, featlen, self.cfg,
                max_steps=max_steps, beam_size=beam_size,
                logprob=self.cfg.beam_logprob,
                lm_params=self.lm_params, lm_cfg=self.lm_cfg)
            toks = np.asarray(res.tokens)
            tlen = np.asarray(res.lengths)
            ids = [toks[i, 0, :tlen[i, 0]] for i in range(n)]
        else:
            _, y_hat = trainer.eval_forward(self.params, self.bn_state,
                                            feats, featlen, self.cfg,
                                            max_steps)
            y_hat = np.asarray(y_hat)
            ids = [y_hat[i] for i in range(n)]
        return [convert_idx_to_string(x, self.tokenizer.id_to_token,
                                      self.cfg.unit) for x in ids]

    def transcribe(self, paths: Sequence[str], beam_size: int = 0,
                   batch_size: int = 8) -> List[str]:
        """Transcribe audio files (WAV/FLAC), preserving input order."""
        signals = []
        for p in paths:
            sig, sr = read_audio(p)
            if sr != self.cfg.sample_rate:
                raise ValueError(
                    f"{p}: sample rate {sr} != {self.cfg.sample_rate}")
            signals.append(np.asarray(sig, np.float32))
        order = sorted(range(len(signals)), key=lambda i: len(signals[i]))
        out: List[Optional[str]] = [None] * len(signals)
        for lo in range(0, len(order), batch_size):
            idx = order[lo:lo + batch_size]
            texts = self.transcribe_signals([signals[i] for i in idx],
                                            beam_size)
            for i, t in zip(idx, texts):
                out[i] = t
        return out  # type: ignore[return-value]
