"""Compatibility shim: the FLAC encoder was promoted from a test fixture
into the framework (data/flac_encode.py) so corpus tooling
(tools/synth_corpus.py) can write FLAC; tests import through this name."""

from automatic_speech_recognition_tpu.data.flac_encode import *  # noqa: F401,F403
from automatic_speech_recognition_tpu.data.flac_encode import (  # noqa: F401
    BitWriter, encode_flac)
