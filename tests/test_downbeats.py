import numpy as np

from audiotabs_tpu.decode.downbeats import infer_meter_and_downbeats


def _activation(beats, accents, fps=100, T=None):
    T = T or int(beats[-1] * fps) + 10
    act = np.full(T, 0.05)
    for t, a in zip(beats, accents):
        act[int(t * fps)] = a
    return act


def test_meter_44_with_accented_downbeats():
    beats = np.arange(0.0, 16.0, 0.5)  # 120 bpm
    accents = [0.95 if i % 4 == 0 else 0.5 for i in range(len(beats))]
    meter, downbeats = infer_meter_and_downbeats(beats, _activation(beats, accents))
    assert meter == "4/4"
    assert abs(downbeats[0] - 0.0) < 1e-6
    assert abs(downbeats[1] - 2.0) < 1e-6


def test_meter_34_waltz():
    beats = np.arange(0.0, 18.0, 0.6)
    accents = [0.95 if i % 3 == 0 else 0.45 for i in range(len(beats))]
    meter, downbeats = infer_meter_and_downbeats(beats, _activation(beats, accents))
    assert meter == "3/4"
    assert abs(downbeats[1] - downbeats[0] - 1.8) < 1e-6


def test_meter_phase_offset():
    beats = np.arange(0.0, 16.0, 0.5)
    # downbeats on beat index 2, 6, 10, ...
    accents = [0.95 if i % 4 == 2 else 0.5 for i in range(len(beats))]
    meter, downbeats = infer_meter_and_downbeats(beats, _activation(beats, accents))
    assert meter == "4/4"
    assert abs(downbeats[0] - 1.0) < 1e-6


def test_meter_defaults_to_44():
    beats = np.arange(0.0, 8.0, 0.5)
    accents = [0.5] * len(beats)  # no accent pattern
    meter, _ = infer_meter_and_downbeats(beats, _activation(beats, accents))
    assert meter == "4/4"
