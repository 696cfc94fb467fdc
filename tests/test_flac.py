"""Native FLAC decoder round-trip tests.

Streams are produced by the pure-Python fixture encoder (flac_encoder.py)
covering every subframe type and channel mode; the C++ decoder
(native/flacdec.cpp, built on demand) must reproduce the PCM exactly.
"""

import shutil

import numpy as np
import pytest

from flac_encoder import encode_flac

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _roundtrip(tmp_path, pcm_channels, **kw):
    from automatic_speech_recognition_tpu.data.flac import read_flac
    data = encode_flac(pcm_channels, **kw)
    p = tmp_path / "t.flac"
    p.write_bytes(data)
    sig, rate = read_flac(str(p))
    return sig, rate


def _expected_mono(pcm_channels, bps):
    stacked = np.stack([c.astype(np.float64) for c in pcm_channels])
    return stacked.mean(axis=0) / float(1 << (bps - 1))


@pytest.mark.parametrize("kind", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4", "lpc"])
def test_mono_subframe_types(tmp_path, rng, kind):
    pcm = (rng.standard_normal(1000) * 3000).astype(np.int32)
    sig, rate = _roundtrip(tmp_path, [pcm], subframe_kind=kind,
                           blocksize=256)
    assert rate == 16000
    np.testing.assert_allclose(sig, _expected_mono([pcm], 16))


def test_constant_subframe(tmp_path):
    pcm = np.full(512, -1234, np.int32)
    sig, _ = _roundtrip(tmp_path, [pcm], subframe_kind="constant")
    np.testing.assert_allclose(sig, _expected_mono([pcm], 16))


def test_escape_partition(tmp_path, rng):
    pcm = (rng.standard_normal(300) * 2000).astype(np.int32)
    sig, _ = _roundtrip(tmp_path, [pcm], subframe_kind="fixed2",
                        escape_bits=18)
    np.testing.assert_allclose(sig, _expected_mono([pcm], 16))


@pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
def test_stereo_modes(tmp_path, rng, mode):
    left = (rng.standard_normal(700) * 5000).astype(np.int32)
    right = (rng.standard_normal(700) * 5000).astype(np.int32)
    sig, _ = _roundtrip(tmp_path, [left, right], subframe_kind="fixed1",
                        channel_mode=mode)
    np.testing.assert_allclose(sig, _expected_mono([left, right], 16))


def test_final_partial_block(tmp_path, rng):
    pcm = (rng.standard_normal(256 * 2 + 77) * 800).astype(np.int32)
    sig, _ = _roundtrip(tmp_path, [pcm], subframe_kind="lpc")
    assert len(sig) == len(pcm)
    np.testing.assert_allclose(sig, _expected_mono([pcm], 16))


def test_8bit_and_24bit(tmp_path, rng):
    pcm8 = np.clip((rng.standard_normal(400) * 40), -127, 127).astype(np.int32)
    sig, _ = _roundtrip(tmp_path, [pcm8], bps=8, subframe_kind="verbatim")
    np.testing.assert_allclose(sig, _expected_mono([pcm8], 8))
    pcm24 = (rng.standard_normal(400) * 400000).astype(np.int32)
    sig, _ = _roundtrip(tmp_path, [pcm24], bps=24, subframe_kind="fixed2")
    np.testing.assert_allclose(sig, _expected_mono([pcm24], 24))


def test_malformed_flac_raises_not_crashes(tmp_path, rng):
    """Corrupt inputs must raise ValueError — never OOB-write or abort
    (decoder hardening: warm-up order > blocksize, bogus STREAMINFO,
    truncated frames)."""
    from automatic_speech_recognition_tpu.data.flac import read_flac
    good = encode_flac([(rng.standard_normal(600) * 500).astype(np.int32)],
                       subframe_kind="lpc")
    cases = {
        "not_flac": b"RIFFxxxxWAVE" + b"\x00" * 64,
        "truncated_meta": good[:20],
        "truncated_frames": good[: len(good) // 2],
        "garbage_frames": good[:46] + bytes(rng.integers(0, 256, 300,
                                                         dtype=np.uint8)),
    }
    for name, data in cases.items():
        p = tmp_path / f"{name}.flac"
        p.write_bytes(data)
        try:
            sig, rate = read_flac(str(p))  # some cases may decode a prefix
        except ValueError:
            pass  # the expected failure mode


def test_mixed_geometry_shard_rejected(tmp_path, rng):
    from automatic_speech_recognition_tpu.data import shards
    feats = [rng.standard_normal((10, 8, 3)).astype(np.float32),
             rng.standard_normal((10, 16, 3)).astype(np.float32)]
    tokens = [np.ones(3, np.int32)] * 2
    with pytest.raises(ValueError):
        shards.write_shard(str(tmp_path / "bad.arsh"), feats, tokens)


def test_native_read_into_geometry_guard(tmp_path, rng):
    from automatic_speech_recognition_tpu.data import shards, shards_native
    path = str(tmp_path / "g-1.arsh")
    shards.write_shard(path, [rng.standard_normal((10, 8, 3)).astype(np.float32)],
                       [np.ones(3, np.int32)])
    r = shards_native.NativeShardReader(path)
    wrong = np.zeros((10, 16, 3), np.float32)  # wrong stride
    with pytest.raises(ValueError):
        r.read_into(0, wrong, np.zeros(3, np.int32))


def test_read_audio_dispatch(tmp_path, rng):
    from automatic_speech_recognition_tpu.data.audio_io import read_audio
    pcm = (rng.standard_normal(500) * 1000).astype(np.int32)
    p = tmp_path / "x.flac"
    p.write_bytes(encode_flac([pcm], subframe_kind="fixed1"))
    sig, rate = read_audio(str(p))
    assert rate == 16000 and len(sig) == 500


def test_long_stream_frame_numbers(tmp_path, rng):
    """FLAC UTF-8-style frame numbering past the old 128-frame fixture cap
    (multi-byte numbers), verified through the native decoder."""
    from automatic_speech_recognition_tpu.data import flac
    pcm = np.clip(rng.standard_normal(200 * 256) * 8000,
                  -32768, 32767).astype(np.int32)
    p = str(tmp_path / "long.flac")
    with open(p, "wb") as f:
        f.write(encode_flac([pcm], sample_rate=16000, blocksize=256,
                            subframe_kind="verbatim"))
    back, fs = flac.read_flac(p)
    assert fs == 16000 and len(back) == len(pcm)
    np.testing.assert_array_equal(
        np.round(back * 32768.0).astype(np.int64), pcm)
