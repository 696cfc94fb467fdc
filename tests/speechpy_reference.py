"""Test-only transcription of speechpy's feature pipeline (MIT license,
https://github.com/astorfi/speechpy), as faithful to the upstream source
(v2.4) as reproducible in this offline environment: same function
decomposition, same np.tile/np.lib.pad idioms, same variable names, so it
can be diffed against upstream line by line when network is available.

Purpose (VERDICT round 1, item 2): the production golden
`ops/frontend_host.py` is a from-scratch reimplementation of speechpy's
semantics; this module is an INDEPENDENT second derivation written in
upstream's own code shape.  tests/test_frontend_golden.py asserts the two
agree bit-close on real recorded audio and adversarial edge cases, which
is the strongest grounding obtainable without installing speechpy itself
(no package index access here; recorded-golden fixtures are additionally
pinned into tests/fixtures/).

The reference repo consumes exactly these functions at preprocess.py:72-87:
speechpy.feature.mfcc / .mfe / .extract_derivative_feature and
speechpy.processing.cmvn.
"""

import numpy as np
from scipy.fftpack import dct


# --------------------------- speechpy.functions ---------------------------

def frequency_to_mel(f):
    """converting from frequency to Mel scale (speechpy/functions.py)."""
    return 1127 * np.log(1 + f / 700.)


def mel_to_frequency(mel):
    """converting from Mel scale to frequency (speechpy/functions.py)."""
    return 700 * (np.exp(mel / 1127.0) - 1)


def triangle(x, left, middle, right):
    out = np.zeros(x.shape)
    out[x <= left] = 0
    out[x >= right] = 0
    first_half = np.logical_and(left < x, x <= middle)
    out[first_half] = (x[first_half] - left) / (middle - left)
    second_half = np.logical_and(middle <= x, x < right)
    out[second_half] = (right - x[second_half]) / (right - middle)
    return out


def zero_handling(x):
    """handle the issue with zero values if they are exposed to become an
    argument for any log function (speechpy/functions.py)."""
    return np.where(x == 0, np.finfo(float).eps, x)


# --------------------------- speechpy.processing ---------------------------

def stack_frames(sig, sampling_frequency, frame_length=0.020,
                 frame_stride=0.020, filter=lambda x: np.ones((x,)),
                 zero_padding=True):
    """Frame a signal into overlapping frames
    (speechpy/processing.py:stack_frames)."""
    assert sig.ndim == 1, "Signal dimention should be of the format of (N,)"

    # Initial necessary values
    length_signal = sig.shape[0]
    frame_sample_length = int(
        np.round(sampling_frequency * frame_length))  # Defined by the number of samples
    frame_stride = float(np.round(sampling_frequency * frame_stride))

    if zero_padding:
        # Calculation of number of frames
        numframes = (int(np.ceil(
            (length_signal - frame_sample_length) / frame_stride)))

        # Zero padding
        len_sig = int(numframes * frame_stride + frame_sample_length)
        additive_zeros = np.zeros((len_sig - length_signal,))
        signal = np.concatenate((sig, additive_zeros))

    else:
        numframes = int(np.floor(
            (length_signal - frame_sample_length) / frame_stride))
        len_sig = int(
            (numframes - 1) * frame_stride + frame_sample_length)
        signal = sig[0:len_sig]

    # Getting the indices of all frames.
    indices = np.tile(np.arange(0, frame_sample_length), (numframes, 1)) \
        + np.tile(np.arange(0, numframes * frame_stride, frame_stride),
                  (frame_sample_length, 1)).T
    indices = np.array(indices, dtype=np.int32)

    # Extracting the frames based on the allocated indices.
    frames = signal[indices]

    # Apply the windows function
    window = np.tile(filter(frame_sample_length), (numframes, 1))
    Extracted_Frames = frames * window
    return Extracted_Frames


def fft_spectrum(frames, fft_points=512):
    """This function computes the one-dimensional n-point discrete Fourier
    Transform (DFT) of a real-valued array by means of an efficient algorithm
    called the Fast Fourier Transform (FFT) (speechpy/processing.py)."""
    SPECTRUM_VECTOR = np.fft.rfft(frames, n=fft_points, axis=-1, norm=None)
    return np.absolute(SPECTRUM_VECTOR)


def power_spectrum(frames, fft_points=512):
    """Power spectrum of each frame (speechpy/processing.py)."""
    return 1.0 / fft_points * np.square(fft_spectrum(frames, fft_points))


def cmvn(vec, variance_normalization=False):
    """This function is aimed to perform global cepstral mean and variance
    normalization (CMVN) on input feature vector "vec"
    (speechpy/processing.py:cmvn)."""
    eps = 2**-30
    rows, cols = vec.shape

    # Mean calculation
    norm = np.mean(vec, axis=0)
    norm_vec = np.tile(norm, (rows, 1))

    # Mean subtraction
    mean_subtracted = vec - norm_vec

    # Variance normalization
    if variance_normalization:
        stdev = np.std(mean_subtracted, axis=0)
        stdev_vec = np.tile(stdev, (rows, 1))
        output = mean_subtracted / (stdev_vec + eps)
    else:
        output = mean_subtracted

    return output


def derivative_extraction(feat, DeltaWindows):
    """This function the derivative features
    (speechpy/processing.py:derivative_extraction)."""
    # Getting the shape of the vector.
    rows, cols = feat.shape

    # Difining the vector of differences.
    DIF = np.zeros(feat.shape, dtype=feat.dtype)
    Scale = 0

    # Pad only along features in the vector.
    # (upstream calls np.lib.pad, an alias removed in numpy >= 2)
    FEAT = np.pad(feat, ((0, 0), (DeltaWindows, DeltaWindows)), 'edge')
    for i in range(DeltaWindows):
        # Start index
        offset = DeltaWindows

        # The dynamic range
        Range = i + 1

        dif = Range * FEAT[:, offset + Range:offset + Range + cols] \
            - FEAT[:, offset - Range:offset - Range + cols]

        Scale += 2 * np.power(Range, 2)
        DIF = DIF + dif

    return DIF / Scale


# ----------------------------- speechpy.feature -----------------------------

def filterbanks(num_filter, coefficients, sampling_freq, low_freq=None,
                high_freq=None):
    """Compute the Mel-filterbanks (speechpy/feature.py:filterbanks)."""
    high_freq = high_freq or sampling_freq / 2
    low_freq = low_freq or 300
    assert high_freq <= sampling_freq / 2, \
        "High frequency cannot be greater than half of the sampling frequency!"
    assert low_freq >= 0, "low frequency cannot be less than zero!"

    # Computing the Mel filterbank
    # converting the upper and lower frequencies to Mels.
    # num_filter + 2 is because for num_filter filterbanks we need
    # num_filter+2 point.
    mels = np.linspace(frequency_to_mel(low_freq),
                       frequency_to_mel(high_freq), num_filter + 2)

    # we should convert Mels back to Hertz because the start and end-points
    # should be at the desired frequencies.
    hertz = mel_to_frequency(mels)

    # The frequency resolution required to put filters at the
    # exact points calculated above should be extracted.
    #  So we should round those frequencies to the closest FFT bin.
    freq_index = (
        np.floor((coefficients + 1) * hertz / sampling_freq)).astype(int)

    # Initial definition
    filterbank = np.zeros([num_filter, coefficients])

    # The triangular function for each filter
    for i in range(0, num_filter):
        left = int(freq_index[i])
        middle = int(freq_index[i + 1])
        right = int(freq_index[i + 2])
        z = np.linspace(left, right, num=right - left + 1)
        filterbank[i, left:right + 1] = triangle(
            z, left=left, middle=middle, right=right)

    return filterbank


def mfe(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
        num_filters=40, fft_length=512, low_frequency=0, high_frequency=None):
    """Compute Mel-filterbank energy features from an audio signal
    (speechpy/feature.py:mfe)."""
    # Convert to float
    signal = signal.astype(float)

    # Stack frames
    frames = stack_frames(
        signal,
        sampling_frequency=sampling_frequency,
        frame_length=frame_length,
        frame_stride=frame_stride,
        filter=lambda x: np.ones((x,)),
        zero_padding=False)

    # getting the high frequency
    high_frequency = high_frequency or sampling_frequency / 2

    # calculation of the power sprectum
    power_spectrum_ = power_spectrum(frames, fft_length)
    coefficients = power_spectrum_.shape[1]
    # this stores the total energy in each frame
    frame_energies = np.sum(power_spectrum_, 1)

    # Handling zero enegies.
    frame_energies = zero_handling(frame_energies)

    # Extracting the filterbank
    filter_banks = filterbanks(num_filters, coefficients, sampling_frequency,
                               low_frequency, high_frequency)

    # Filterbank energies
    features = np.dot(power_spectrum_, filter_banks.T)
    features = zero_handling(features)

    return features, frame_energies


def mfcc(signal, sampling_frequency, frame_length=0.020, frame_stride=0.01,
         num_cepstral=13, num_filters=40, fft_length=512, low_frequency=0,
         high_frequency=None, dc_elimination=True):
    """Compute MFCC features from an audio signal
    (speechpy/feature.py:mfcc)."""
    feature, energy = mfe(signal, sampling_frequency,
                          frame_length=frame_length,
                          frame_stride=frame_stride,
                          num_filters=num_filters, fft_length=fft_length,
                          low_frequency=low_frequency,
                          high_frequency=high_frequency)
    if len(feature) == 0:
        return np.empty((0, num_cepstral))
    feature = np.log(feature)
    feature = dct(feature, type=2, axis=-1, norm='ortho')[:, :num_cepstral]

    # replace first cepstral coefficient with log of frame energy for DC
    # elimination.
    if dc_elimination:
        feature[:, 0] = np.log(energy)
    return feature


def extract_derivative_feature(feature):
    """This function extracts temporal derivative features which are
    first and second derivatives (speechpy/feature.py)."""
    first_derivative_feature = derivative_extraction(feature, DeltaWindows=2)
    second_derivative_feature = derivative_extraction(
        first_derivative_feature, DeltaWindows=2)

    # Creating the future cube for each file
    feature_cube = np.concatenate(
        (feature[:, :, None], first_derivative_feature[:, :, None],
         second_derivative_feature[:, :, None]),
        axis=2)
    return feature_cube
