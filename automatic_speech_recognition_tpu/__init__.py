"""TPU-native LAS ASR framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
the TF1 LAS reference (30stomercury/Automatic-Speech-Recognition):

- fused on-device MFCC/fbank frontend with per-utterance CMVN and delta
  stacking (reference: preprocess.py:50-91, offline CPU speechpy loop)
- char / CharBPE subword tokenization (reference: utils/tokenizer.py)
- bucketed static-shape data pipeline (reference: tfrecord_data_loader.py)
- CNN / pyramidal-BiRNN Listener + location-aware-attention Speller
  (reference: las/las.py, las/layers.py) built on lax.scan
- masked label-smoothed CE + optional CTC, Adam with scheduled LR
  (reference: las/las.py:320-369)
- batched greedy eval with corpus WER (reference: test.py)
- fully batched on-TPU beam search with char-RNNLM shallow fusion
  (reference: las/beam_search.py, lang/char_rnn_model.py)
- data-parallel training over a jax.sharding.Mesh (reference has none;
  see SURVEY.md section 2 "Parallelism inventory")
"""

__version__ = "0.1.0"
